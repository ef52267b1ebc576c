"""Type conversion transforms (reference
``torchvision/transforms/v2/_type_conversion.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2._transform import Transform

__all__ = ["ToImage", "ToPILImage", "PILToTensor", "ToPureTensor"]


def _pil_to_array(pic) -> np.ndarray:
    arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


class ToImage(Transform):
    """PIL/numpy/jax array -> tv_tensors.Image (channels-last)."""

    _transformed_types = (jax.Array, np.ndarray, object)

    def __call__(self, *inputs, key=None):
        sample = inputs if len(inputs) > 1 else inputs[0]

        def conv(x):
            try:
                import PIL.Image

                if isinstance(x, PIL.Image.Image):
                    return tv_tensors.Image(_pil_to_array(x))
            except ImportError:
                pass
            if isinstance(x, (jax.Array, np.ndarray)) and not isinstance(
                x, tv_tensors.TVTensor
            ):
                return tv_tensors.Image(x)
            return x

        return jax.tree_util.tree_map(
            conv,
            sample,
            is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
            or _is_pil(x),
        )


def _is_pil(x) -> bool:
    try:
        import PIL.Image

        return isinstance(x, PIL.Image.Image)
    except ImportError:
        return False


class PILToTensor(Transform):
    """PIL -> plain uint8 channels-last array (reference PILToTensor, which
    produces CHW; channels-last here per framework convention)."""

    def __call__(self, *inputs, key=None):
        sample = inputs if len(inputs) > 1 else inputs[0]

        def conv(x):
            if _is_pil(x):
                return jnp.asarray(_pil_to_array(x))
            return x

        return jax.tree_util.tree_map(conv, sample, is_leaf=_is_pil)


class ToPILImage(Transform):
    """array -> PIL image (host-side, for visualization)."""

    def __call__(self, *inputs, key=None):
        import PIL.Image

        sample = inputs if len(inputs) > 1 else inputs[0]

        def conv(x):
            if isinstance(x, tv_tensors.TVTensor):
                x = x.data
            if isinstance(x, (jax.Array, np.ndarray)):
                arr = np.asarray(x)
                if arr.ndim == 3 and arr.shape[-1] == 1:
                    arr = arr[..., 0]
                if arr.dtype != np.uint8:
                    arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
                return PIL.Image.fromarray(arr)
            return x

        return jax.tree_util.tree_map(
            conv, sample, is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor)
        )


class ToPureTensor(Transform):
    """Strip TVTensor wrappers -> plain arrays (reference ToPureTensor)."""

    def __call__(self, *inputs, key=None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        return jax.tree_util.tree_map(
            lambda x: x.data if isinstance(x, tv_tensors.TVTensor) else x,
            sample,
            is_leaf=lambda x: isinstance(x, tv_tensors.TVTensor),
        )
