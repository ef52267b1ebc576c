"""Resize numerical parity against torch.nn.functional.interpolate.

The reference's eval presets resize through ``interpolate``
(``torchvision/transforms/v2/functional/_geometry.py:285``); every accuracy
number in BASELINE.md flows through this math, so we verify bit-level
agreement with torch CPU for every mode/antialias combination
(SURVEY.md §7 hard-part #2).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from vision_tpu.transforms.v2.functional._resample import resize_2d

SIZES = [
    ((64, 48), (32, 24)),
    ((64, 48), (100, 90)),
    ((256, 256), (224, 224)),
    ((231, 356), (224, 224)),
    ((16, 16), (7, 5)),
    ((50, 50), (50, 50)),
    ((500, 333), (256, 256)),
    ((3, 3), (9, 9)),
]


def _torch_resize(x_hwc, size, mode, antialias, align_corners=False):
    xt = torch.from_numpy(x_hwc).permute(2, 0, 1)[None]
    kwargs = {}
    if mode in ("bilinear", "bicubic"):
        kwargs["align_corners"] = align_corners
        kwargs["antialias"] = antialias
    ref = TF.interpolate(xt, size, mode=mode, **kwargs)
    return ref[0].permute(1, 2, 0).numpy()


@pytest.mark.parametrize("in_size,out_size", SIZES)
@pytest.mark.parametrize(
    "mode,antialias",
    [
        ("bilinear", False),
        ("bilinear", True),
        ("bicubic", False),
        ("bicubic", True),
        ("nearest", False),
        ("nearest-exact", False),
        ("area", False),
    ],
)
def test_resize_matches_torch(rng, in_size, out_size, mode, antialias):
    x = rng.rand(*in_size, 3).astype(np.float32)
    ref = _torch_resize(x, out_size, mode, antialias)
    out = np.asarray(resize_2d(jnp.asarray(x), out_size, mode=mode, antialias=antialias))
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=0)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_resize_align_corners(rng, mode):
    x = rng.rand(37, 53, 3).astype(np.float32)
    ref = _torch_resize(x, (64, 21), mode, antialias=False, align_corners=True)
    out = np.asarray(
        resize_2d(jnp.asarray(x), (64, 21), mode=mode, antialias=False, align_corners=True)
    )
    np.testing.assert_allclose(out, ref, atol=5e-5, rtol=0)


def test_resize_uint8(rng):
    xu = (rng.rand(100, 80, 3) * 255).astype(np.uint8)
    ref = _torch_resize(xu.astype(np.float32), (224, 224), "bilinear", True)
    ref_u8 = np.clip(np.round(ref), 0, 255).astype(np.uint8)
    out = np.asarray(resize_2d(jnp.asarray(xu), (224, 224), mode="bilinear", antialias=True))
    # round-half ties may differ by 1 LSB
    assert np.abs(out.astype(int) - ref_u8.astype(int)).max() <= 1


def test_resize_batched(rng):
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    out = np.asarray(resize_2d(jnp.asarray(x), (16, 16)))
    for i in range(4):
        single = np.asarray(resize_2d(jnp.asarray(x[i]), (16, 16)))
        np.testing.assert_allclose(out[i], single, atol=1e-6)
