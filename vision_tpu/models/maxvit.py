"""MaxViT-T (reference ``torchvision/models/maxvit.py``, 834 LoC):
MBConv + block(window) attention + grid attention per layer.

The window/grid partitioning is pure reshape/transpose on NHWC arrays; the
per-partition attention is a batched MXU matmul over
[B * partitions, p*p, C]."""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.models.swin_transformer import _relative_position_index
from vision_tpu.ops.stochastic_depth import stochastic_depth
from vision_tpu.transforms._presets import ImageClassification

__all__ = ["MaxVit", "MaxVit_T_Weights", "maxvit_t"]

_BN_EPS = 1e-3
_BN_MOM = 0.99  # torch momentum 0.01


def _bn(train, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=_BN_MOM, epsilon=_BN_EPS,
        name=name,
    )


class MBConv(nn.Module):
    """reference ``maxvit.py:54``: pre-norm MBConv with SE and avg-pool
    projection shortcut."""

    out_channels: int
    expansion: float
    squeeze: float
    stride: int
    sd_prob: float

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        should_proj = self.stride != 1 or in_ch != self.out_channels
        if should_proj:
            res = x
            if self.stride == 2:
                # torch nn.AvgPool2d(3, 2, padding=1) divides by the full
                # 3x3 window even where it overlaps padding
                # (count_include_pad defaults True)
                res = nn.avg_pool(
                    res, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                    count_include_pad=True,
                )
                res = nn.Conv(self.out_channels, (1, 1), name="proj.1")(res)
            else:
                res = nn.Conv(self.out_channels, (1, 1), name="proj.0")(res)
        else:
            res = x

        mid = int(self.out_channels * self.expansion)
        sqz = int(self.out_channels * self.squeeze)
        out = _bn(train, "layers.pre_norm")(x)
        out = nn.Conv(mid, (1, 1), use_bias=False, name="layers.conv_a.0")(out)
        out = _bn(train, "layers.conv_a.1")(out)
        out = nn.gelu(out, approximate=False)
        out = nn.Conv(
            mid, (3, 3), (self.stride, self.stride), padding=[(1, 1)] * 2,
            feature_group_count=mid, use_bias=False, name="layers.conv_b.0",
        )(out)
        out = _bn(train, "layers.conv_b.1")(out)
        out = nn.gelu(out, approximate=False)
        s = jnp.mean(out, axis=(-3, -2), keepdims=True)
        s = nn.silu(
            nn.Conv(sqz, (1, 1), name="layers.squeeze_excitation.fc1")(s)
        )
        s = nn.Conv(mid, (1, 1), name="layers.squeeze_excitation.fc2")(s)
        out = out * nn.sigmoid(s)
        out = nn.Conv(self.out_channels, (1, 1), name="layers.conv_c")(out)
        if train and self.sd_prob > 0:
            out = stochastic_depth(
                out, self.sd_prob, "row", True, key=self.make_rng("dropout")
            )
        return res + out


class RelPosAttention(nn.Module):
    """reference ``maxvit.py:141``: qkv + relative position bias over
    p*p-token partitions. Input [B, G, P, D]."""

    head_dim: int
    seq_len: int  # partition_size ** 2

    @nn.compact
    def __call__(self, x):
        b, g, p, d = x.shape
        h = d // self.head_dim
        size = int(math.sqrt(self.seq_len))
        qkv = nn.Dense(3 * h * self.head_dim, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, g, p, h, self.head_dim).transpose(0, 1, 3, 2, 4)

        q, k, v = heads(q), heads(k), heads(v)
        k = k * (d**-0.5)  # note: feat_dim scale, reference quirk
        attn = jnp.einsum(
            "bghid,bghjd->bghij", q, k, preferred_element_type=jnp.float32
        )
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * size - 1) * (2 * size - 1), h),
        )
        rel_idx = _relative_position_index((size, size))
        bias = table[rel_idx].reshape(self.seq_len, self.seq_len, h)
        bias = bias.transpose(2, 0, 1)[None, None]
        attn = jax.nn.softmax(attn + bias, axis=-1).astype(v.dtype)
        out = jnp.einsum("bghij,bghjd->bghid", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, g, p, d)
        return nn.Dense(d, name="merge")(out)


def _window_partition(x, p):
    """[B, H, W, C] -> [B, (H/p)(W/p), p*p, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p, c)


def _window_departition(x, p, gh, gw):
    b, _, _, c = x.shape
    x = x.reshape(b, gh, gw, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * p, gw * p, c)


class PartitionAttention(nn.Module):
    """reference ``maxvit.py:283``: window or grid partition + attention +
    MLP, both pre-norm residual."""

    head_dim: int
    partition_size: int
    partition_type: str  # "window" | "grid"
    mlp_ratio: int
    sd_prob: float

    @nn.compact
    def __call__(self, x, train=False):
        b, h, w, c = x.shape
        ps = self.partition_size
        n_part = h // ps
        p = ps if self.partition_type == "window" else n_part
        gh, gw = h // p, w // p

        t = _window_partition(x, p)
        if self.partition_type == "grid":
            t = jnp.swapaxes(t, -2, -3)

        def sd(v):
            if train and self.sd_prob > 0:
                return stochastic_depth(
                    v, self.sd_prob, "row", True, key=self.make_rng("dropout")
                )
            return v

        a = nn.LayerNorm(epsilon=1e-5, name="attn_layer.0")(t)
        a = RelPosAttention(
            self.head_dim, ps * ps, name="attn_layer.1"
        )(a)
        t = t + sd(a)
        m = nn.LayerNorm(epsilon=1e-5, name="mlp_layer.0")(t)
        m = nn.Dense(c * self.mlp_ratio, name="mlp_layer.1")(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(c, name="mlp_layer.3")(m)
        t = t + sd(m)

        if self.partition_type == "grid":
            t = jnp.swapaxes(t, -2, -3)
        return _window_departition(t, p, gh, gw)


class MaxVit(nn.Module):
    """reference ``maxvit.py:569``."""

    stem_channels: int = 64
    block_channels: Tuple[int, ...] = (64, 128, 256, 512)
    block_layers: Tuple[int, ...] = (2, 2, 5, 2)
    head_dim: int = 32
    partition_size: int = 7
    stochastic_depth_prob: float = 0.2
    expansion: float = 4.0
    squeeze: float = 0.25
    mlp_ratio: int = 4
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        x = nn.Conv(
            self.stem_channels, (3, 3), (2, 2), padding=[(1, 1)] * 2,
            use_bias=False, name="stem.0.0",
        )(x)
        x = _bn(train, "stem.0.1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(
            self.stem_channels, (3, 3), padding=[(1, 1)] * 2, name="stem.1.0"
        )(x)

        total = sum(self.block_layers)
        p_sto = np.linspace(0, self.stochastic_depth_prob, total).tolist()
        p_idx = 0
        for bi, (out_ch, n_layers) in enumerate(
            zip(self.block_channels, self.block_layers)
        ):
            for li in range(n_layers):
                stride = 2 if li == 0 else 1
                prefix = f"blocks.{bi}.layers.{li}.layers"
                x = MBConv(
                    out_ch, self.expansion, self.squeeze, stride,
                    p_sto[p_idx], name=f"{prefix}.MBconv",
                )(x, train)
                x = PartitionAttention(
                    self.head_dim, self.partition_size, "window",
                    self.mlp_ratio, p_sto[p_idx],
                    name=f"{prefix}.window_attention",
                )(x, train)
                x = PartitionAttention(
                    self.head_dim, self.partition_size, "grid",
                    self.mlp_ratio, p_sto[p_idx],
                    name=f"{prefix}.grid_attention",
                )(x, train)
                p_idx += 1
            feats[f"blocks.{bi}"] = x

        x = jnp.mean(x, axis=(-3, -2))
        x = nn.LayerNorm(epsilon=1e-5, name="classifier.2")(x)
        x = jnp.tanh(nn.Dense(self.block_channels[-1], name="classifier.3")(x))
        x = nn.Dense(self.num_classes, use_bias=False, name="classifier.5")(x)
        if return_features:
            return x, feats
        return x


def _maxvit_hooks(sd):
    """Drop the relative_position_index buffers (computed at build time)."""
    return {
        k: v
        for k, v in sd.items()
        if not k.endswith("relative_position_index")
    }


class MaxVit_T_Weights(WeightsEnum):
    IMAGENET1K_V1 = Weights(
        url="https://download.pytorch.org/models/maxvit_t-bc5ab103.pth",
        transforms=functools.partial(
            ImageClassification, crop_size=224, resize_size=224,
            interpolation="bicubic",
        ),
        meta={
            "num_params": 30919624,
            "_metrics": {"ImageNet-1K": {"acc@1": 83.700, "acc@5": 96.722}},
        },
    )
    DEFAULT = IMAGENET1K_V1


@register_model()
def maxvit_t(*, weights: Optional[MaxVit_T_Weights] = None, **kwargs):
    weights = MaxVit_T_Weights.verify(weights)
    module = MaxVit(**kwargs)
    return build_model(
        module, weights, input_shape=(1, 224, 224, 3), hooks=_maxvit_hooks
    )
