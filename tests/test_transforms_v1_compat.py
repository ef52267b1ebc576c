"""v1 transforms compatibility surface."""

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import transforms as T


def test_v1_aliases_exist():
    for name in ("Resize", "CenterCrop", "Normalize", "Compose",
                 "RandomHorizontalFlip", "ColorJitter", "RandomCrop"):
        assert hasattr(T, name)


def test_to_tensor_scales_uint8():
    img = np.full((4, 4, 3), 255, np.uint8)
    out = T.ToTensor()(img)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_convert_image_dtype():
    img = jnp.full((2, 2, 3), 128, jnp.uint8)
    out = T.ConvertImageDtype(jnp.float32)(img)
    np.testing.assert_allclose(np.asarray(out), 128 / 255.0, atol=1e-6)


def test_interpolation_mode_is_str():
    assert T.InterpolationMode.BILINEAR == "bilinear"
    # members pass anywhere a mode string is expected
    img = jnp.zeros((8, 8, 3), jnp.float32)
    out = T.Resize(4, interpolation=T.InterpolationMode.BILINEAR)(img)
    assert out.shape == (4, 4, 3)


def test_v1_pipeline_end_to_end():
    tf = T.Compose([
        T.Resize(8),
        T.CenterCrop(6),
        T.ToTensor(),
        T.Normalize(mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5]),
    ])
    img = np.random.RandomState(0).randint(0, 255, (16, 12, 3), np.uint8)
    out = tf(img, key=jax.random.PRNGKey(0))
    assert out.shape == (8, 6, 3) or out.shape == (6, 6, 3)


def test_v1_functional_module_import_path():
    """``import vision_tpu.transforms.functional as F`` — the reference's
    most common import form (``torchvision/transforms/functional.py``) —
    must resolve as a real module path and carry the v1 names."""
    import importlib

    F = importlib.import_module("vision_tpu.transforms.functional")
    from vision_tpu.transforms import functional as F2

    assert F is F2
    for name in (
        "hflip", "vflip", "to_tensor", "to_pil_image", "pil_to_tensor",
        "get_image_size", "get_dimensions", "convert_image_dtype",
        "rgb_to_grayscale", "adjust_brightness", "rotate", "resize",
    ):
        assert hasattr(F, name), name
    img = np.zeros((4, 6, 3), np.uint8)
    assert F.hflip(img).shape == (4, 6, 3)
    assert tuple(F.get_image_size(img)) == (6, 4)  # (w, h) like v1


def test_v1_module_paths():
    """v1 module layout importable: transforms.transforms / .autoaugment."""
    from vision_tpu.transforms.autoaugment import (
        AutoAugmentPolicy,
        RandAugment,  # noqa: F401
    )
    from vision_tpu.transforms.transforms import (  # noqa: F401
        Compose,
        Resize,
        ToTensor,
    )

    assert AutoAugmentPolicy.IMAGENET.value == "imagenet"
