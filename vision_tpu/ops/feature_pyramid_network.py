"""Feature Pyramid Network (reference
``torchvision/ops/feature_pyramid_network.py:36-250``): 1x1 lateral convs +
top-down nearest upsampling + 3x3 smoothing, with optional extra blocks.

Channels-last; upsampling is exact nearest (integer 2x scale in FPNs, but
implemented generally via the nearest resample matrix)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_tpu.transforms.v2.functional._resample import resize_2d

__all__ = ["FeaturePyramidNetwork", "LastLevelMaxPool", "LastLevelP6P7"]


class ExtraFPNBlock(nn.Module):
    """Base for extra blocks appended after the FPN outputs
    (reference ``feature_pyramid_network.py:18``)."""


class LastLevelMaxPool(ExtraFPNBlock):
    """Adds a stride-2 max-pool P6 level on top
    (reference ``feature_pyramid_network.py:207``)."""

    def __call__(
        self, results: List[jax.Array], x: List[jax.Array], names: List[str]
    ) -> Tuple[List[jax.Array], List[str]]:
        names.append("pool")
        last = results[-1]
        pooled = nn.max_pool(
            last, window_shape=(1, 1), strides=(2, 2), padding=((0, 0), (0, 0))
        )
        results.append(pooled)
        return results, names


class LastLevelP6P7(ExtraFPNBlock):
    """Adds P6/P7 via stride-2 3x3 convs (RetinaNet; reference
    ``feature_pyramid_network.py:224``)."""

    out_channels: int
    use_P5: bool = True

    @nn.compact
    def __call__(
        self, results: List[jax.Array], x: List[jax.Array], names: List[str]
    ) -> Tuple[List[jax.Array], List[str]]:
        p5, c5 = results[-1], x[-1]
        src = p5 if self.use_P5 else c5
        p6 = nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            name="p6",
        )(src)
        p7 = nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
            name="p7",
        )(nn.relu(p6))
        results.extend([p6, p7])
        names.extend(["p6", "p7"])
        return results, names


class FeaturePyramidNetwork(nn.Module):
    """reference ``ops/feature_pyramid_network.py:36``.

    Call with an ordered dict of features (highest resolution first);
    returns a dict with the same keys (+ extra block names).
    ``norm_layer`` optionally wraps each conv (the v2 detection weights).
    """

    out_channels: int
    extra_blocks: Optional[ExtraFPNBlock] = None
    norm_layer: Optional[Callable[..., nn.Module]] = None

    @nn.compact
    def __call__(self, x: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        names = list(x.keys())
        feats = list(x.values())
        use_bias = self.norm_layer is None

        def inner_block(i, f):
            f = nn.Conv(
                self.out_channels, (1, 1), use_bias=use_bias,
                name=f"inner_blocks_{i}",
            )(f)
            if self.norm_layer is not None:
                f = self.norm_layer(name=f"inner_norm_{i}")(f)
            return f

        def layer_block(i, f):
            f = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=use_bias, name=f"layer_blocks_{i}",
            )(f)
            if self.norm_layer is not None:
                f = self.norm_layer(name=f"layer_norm_{i}")(f)
            return f

        laterals = [inner_block(i, f) for i, f in enumerate(feats)]

        results = [None] * len(laterals)
        last_inner = laterals[-1]
        results[-1] = layer_block(len(laterals) - 1, last_inner)
        for i in range(len(laterals) - 2, -1, -1):
            target_hw = laterals[i].shape[-3:-1]
            upsampled = resize_2d(last_inner, target_hw, mode="nearest", antialias=False)
            last_inner = laterals[i] + upsampled
            results[i] = layer_block(i, last_inner)

        if self.extra_blocks is not None:
            results, names = self.extra_blocks(results, feats, names)

        return dict(zip(names, results))
