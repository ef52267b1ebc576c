"""v2 functional contract harness (reference ``test_transforms_v2.py``
``check_kernel``): batched output == stacked per-sample outputs, and
shape/dtype sanity, across the main geometry/color functionals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.transforms.v2 import functional as F

_IMG = np.random.RandomState(0).rand(3, 16, 16, 3).astype(np.float32)

CASES = [
    ("resize", lambda x: F.resize(x, (8, 8))),
    ("resize_aa_off", lambda x: F.resize(x, (8, 8), antialias=False)),
    ("horizontal_flip", F.horizontal_flip),
    ("vertical_flip", F.vertical_flip),
    ("center_crop", lambda x: F.center_crop(x, (10, 10))),
    ("pad", lambda x: F.pad(x, [2])),
    ("crop", lambda x: F.crop(x, 2, 3, 8, 8)),
    ("adjust_brightness", lambda x: F.adjust_brightness(x, 1.3)),
    ("adjust_contrast", lambda x: F.adjust_contrast(x, 0.7)),
    ("adjust_saturation", lambda x: F.adjust_saturation(x, 1.5)),
    ("adjust_hue", lambda x: F.adjust_hue(x, 0.1)),
    ("adjust_gamma", lambda x: F.adjust_gamma(x, 0.8)),
    ("invert", F.invert),
    ("autocontrast", F.autocontrast),
    ("rgb_to_grayscale", lambda x: F.rgb_to_grayscale(x, 3)),
    ("normalize", lambda x: F.normalize(x, [0.5] * 3, [0.25] * 3)),
    ("rotate", lambda x: F.rotate(x, 30.0)),
    ("affine", lambda x: F.affine(x, angle=15.0, translate=(1, 2),
                                  scale=1.1, shear=(5.0, 0.0))),
    ("gaussian_blur", lambda x: F.gaussian_blur(x, 3)),
    ("posterize_u8", lambda x: F.posterize(
        (x * 255).astype(jnp.uint8), 3)),
    ("solarize", lambda x: F.solarize(x, 0.6)),
]


@pytest.mark.parametrize("name,fn", CASES, ids=[c[0] for c in CASES])
def test_batched_equals_per_sample(name, fn):
    batch = jnp.asarray(_IMG)
    batched = np.asarray(fn(batch))
    per_sample = np.stack([np.asarray(fn(batch[i])) for i in range(3)])
    np.testing.assert_allclose(batched, per_sample, atol=1e-5, rtol=1e-5)
    assert np.isfinite(batched.astype(np.float32)).all()


@pytest.mark.parametrize(
    "name,fn",
    [c for c in CASES if c[0] in
     ("horizontal_flip", "vertical_flip", "invert", "adjust_brightness")],
    ids=lambda c: str(c),
)
def test_uint8_dtype_preserved(name, fn):
    u8 = (jnp.asarray(_IMG) * 255).astype(jnp.uint8)
    out = fn(u8)
    assert out.dtype == jnp.uint8, name
