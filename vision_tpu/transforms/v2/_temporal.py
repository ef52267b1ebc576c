"""Temporal transforms (reference
``torchvision/transforms/v2/_temporal.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2._transform import Transform

__all__ = ["UniformTemporalSubsample"]


class UniformTemporalSubsample(Transform):
    """Evenly sample ``num_samples`` frames from the T axis of a video
    ``(..., T, H, W, C)`` (reference UniformTemporalSubsample)."""

    _transformed_types = (tv_tensors.Video, jax.Array, np.ndarray)

    def __init__(self, num_samples: int):
        super().__init__()
        self.num_samples = num_samples

    def transform(self, inpt, params):
        arr = inpt.data if isinstance(inpt, tv_tensors.TVTensor) else inpt
        t = arr.shape[-4]
        indices = jnp.linspace(0, t - 1, self.num_samples)
        indices = jnp.clip(indices, 0, t - 1).astype(jnp.int32)
        out = jnp.take(arr, indices, axis=-4)
        if isinstance(inpt, tv_tensors.TVTensor):
            return tv_tensors.wrap(out, like=inpt)
        return out
