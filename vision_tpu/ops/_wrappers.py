"""Module-form wrappers of the functional ops (reference exports both,
e.g. ``torchvision.ops.RoIAlign`` wraps ``roi_align``; ``ops/roi_align.py``
bottom, ``ops/deform_conv.py:160`` DeformConv2d module).

The RoI/drop wrappers are stateless config holders; ``DeformConv2d`` is a
flax module owning its conv weight/bias (the reference's learnable
parameters)."""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn

from vision_tpu.ops.deform_conv import deform_conv2d
from vision_tpu.ops.drop_block import drop_block2d, drop_block3d
from vision_tpu.ops.ps_roi_align import ps_roi_align
from vision_tpu.ops.ps_roi_pool import ps_roi_pool
from vision_tpu.ops.roi_align import roi_align
from vision_tpu.ops.roi_pool import roi_pool
from vision_tpu.ops.stochastic_depth import stochastic_depth

__all__ = [
    "RoIAlign",
    "RoIPool",
    "PSRoIAlign",
    "PSRoIPool",
    "DeformConv2d",
    "StochasticDepth",
    "DropBlock2d",
    "DropBlock3d",
]


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class RoIAlign:
    """reference ``ops/roi_align.py`` RoIAlign module."""

    def __init__(self, output_size, spatial_scale: float = 1.0,
                 sampling_ratio: int = -1, aligned: bool = False):
        self.output_size = _pair(output_size)
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.aligned = aligned

    def __call__(self, inp, rois):
        return roi_align(
            inp, rois, self.output_size, self.spatial_scale,
            self.sampling_ratio, self.aligned,
        )

    def __repr__(self):
        return (
            f"{type(self).__name__}(output_size={self.output_size}, "
            f"spatial_scale={self.spatial_scale}, "
            f"sampling_ratio={self.sampling_ratio}, aligned={self.aligned})"
        )


class RoIPool:
    """reference ``ops/roi_pool.py`` RoIPool module."""

    def __init__(self, output_size, spatial_scale: float = 1.0):
        self.output_size = _pair(output_size)
        self.spatial_scale = spatial_scale

    def __call__(self, inp, rois):
        return roi_pool(inp, rois, self.output_size, self.spatial_scale)


class PSRoIAlign:
    """reference ``ops/ps_roi_align.py`` PSRoIAlign module."""

    def __init__(self, output_size, spatial_scale: float = 1.0,
                 sampling_ratio: int = -1):
        self.output_size = _pair(output_size)
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio

    def __call__(self, inp, rois):
        return ps_roi_align(
            inp, rois, self.output_size, self.spatial_scale,
            self.sampling_ratio,
        )


class PSRoIPool:
    """reference ``ops/ps_roi_pool.py`` PSRoIPool module."""

    def __init__(self, output_size, spatial_scale: float = 1.0):
        self.output_size = _pair(output_size)
        self.spatial_scale = spatial_scale

    def __call__(self, inp, rois):
        return ps_roi_pool(inp, rois, self.output_size, self.spatial_scale)


class DeformConv2d(nn.Module):
    """reference ``ops/deform_conv.py:160`` DeformConv2d: learnable weight
    (HWIO) + optional bias; offsets/mask are inputs."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, inp, offset, mask=None):
        kh, kw = _pair(self.kernel_size)
        c_in = inp.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.kaiming_uniform(),
            (kh, kw, c_in // self.groups, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return deform_conv2d(
            inp, offset, weight, bias,
            stride=_pair(self.stride), padding=_pair(self.padding),
            dilation=_pair(self.dilation), mask=mask,
        )


class StochasticDepth:
    """reference ``ops/stochastic_depth.py`` StochasticDepth module."""

    def __init__(self, p: float, mode: str):
        self.p = p
        self.mode = mode

    def __call__(self, inp, training: bool = True, *, key=None):
        return stochastic_depth(inp, self.p, self.mode, training, key=key)

    def __repr__(self):
        return f"{type(self).__name__}(p={self.p}, mode={self.mode})"


class DropBlock2d:
    """reference ``ops/drop_block.py`` DropBlock2d module."""

    def __init__(self, p: float, block_size: int, inplace: bool = False,
                 eps: float = 1e-6):
        self.p = p
        self.block_size = block_size
        self.eps = eps

    def __call__(self, inp, training: bool = True, *, key=None):
        return drop_block2d(
            inp, self.p, self.block_size, training=training, key=key,
            eps=self.eps,
        )


class DropBlock3d(DropBlock2d):
    """reference ``ops/drop_block.py`` DropBlock3d module."""

    def __call__(self, inp, training: bool = True, *, key=None):
        return drop_block3d(
            inp, self.p, self.block_size, training=training, key=key,
            eps=self.eps,
        )
