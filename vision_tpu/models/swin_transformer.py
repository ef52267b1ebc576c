"""Swin Transformer v1/v2 (reference
``torchvision/models/swin_transformer.py``, 1033 LoC): swin_t/s/b and
swin_v2_t/s/b with shifted-window attention + relative position bias.

The window partition/shift is pure reshape/roll on NHWC arrays — XLA
compiles it to layout changes; the per-window attention is a batched MXU
matmul over [B * num_windows, ws*ws, C].
"""

from __future__ import annotations

import functools
import math
from typing import Callable, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.ops.stochastic_depth import stochastic_depth
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "SwinTransformer",
    "Swin_T_Weights",
    "Swin_S_Weights",
    "Swin_B_Weights",
    "Swin_V2_T_Weights",
    "Swin_V2_S_Weights",
    "Swin_V2_B_Weights",
    "swin_t",
    "swin_s",
    "swin_b",
    "swin_v2_t",
    "swin_v2_s",
    "swin_v2_b",
]


def _relative_position_index(window_size) -> np.ndarray:
    """reference ``define_relative_position_index`` (numpy, build time)."""
    wh, ww = window_size
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    )  # 2, Wh, Ww
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).reshape(-1)  # N*N


def _relative_coords_table(window_size) -> np.ndarray:
    """reference v2 ``define_relative_position_bias_table``."""
    wh, ww = window_size
    ch = np.arange(-(wh - 1), wh, dtype=np.float32)
    cw = np.arange(-(ww - 1), ww, dtype=np.float32)
    table = np.stack(np.meshgrid(ch, cw, indexing="ij"))
    table = table.transpose(1, 2, 0)[None]  # 1, 2Wh-1, 2Ww-1, 2
    table[..., 0] /= wh - 1
    table[..., 1] /= ww - 1
    table *= 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / 3.0
    return table


def shifted_window_attention(
    x: jax.Array,
    qkv: Callable,
    proj: Callable,
    relative_position_bias: jax.Array,
    window_size: List[int],
    num_heads: int,
    shift_size: List[int],
    logit_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """reference ``swin_transformer.py:116`` (dropouts omitted: the release
    configs all use 0)."""
    b, h, w, c = x.shape
    pad_r = (window_size[1] - w % window_size[1]) % window_size[1]
    pad_b = (window_size[0] - h % window_size[0]) % window_size[0]
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    _, pad_h, pad_w, _ = x.shape

    shift_size = list(shift_size)
    if window_size[0] >= pad_h:
        shift_size[0] = 0
    if window_size[1] >= pad_w:
        shift_size[1] = 0

    if sum(shift_size) > 0:
        x = jnp.roll(x, (-shift_size[0], -shift_size[1]), axis=(1, 2))

    nwh, nww = pad_h // window_size[0], pad_w // window_size[1]
    num_windows = nwh * nww
    ws = window_size[0] * window_size[1]
    x = x.reshape(b, nwh, window_size[0], nww, window_size[1], c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * num_windows, ws, c)

    qkv_out = qkv(x)  # [B*nW, ws, 3C]
    qkv_out = qkv_out.reshape(x.shape[0], ws, 3, num_heads, c // num_heads)
    qkv_out = qkv_out.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_out[0], qkv_out[1], qkv_out[2]

    if logit_scale is not None:
        # v2 cosine attention
        qn = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
        kn = k / jnp.linalg.norm(k, axis=-1, keepdims=True).clip(1e-12)
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", qn, kn, preferred_element_type=jnp.float32
        )
        scale = jnp.exp(jnp.clip(logit_scale, a_max=math.log(100.0)))
        attn = attn * scale
    else:
        q = q * (c // num_heads) ** -0.5
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
    attn = attn + relative_position_bias

    if sum(shift_size) > 0:
        # attention mask for windows straddling the cyclic shift boundary
        mask = np.zeros((pad_h, pad_w), dtype=np.float32)
        h_slices = (
            (0, pad_h - window_size[0]),
            (pad_h - window_size[0], pad_h - shift_size[0]),
            (pad_h - shift_size[0], pad_h),
        )
        w_slices = (
            (0, pad_w - window_size[1]),
            (pad_w - window_size[1], pad_w - shift_size[1]),
            (pad_w - shift_size[1], pad_w),
        )
        count = 0
        for hs in h_slices:
            for wsl in w_slices:
                mask[hs[0] : hs[1], wsl[0] : wsl[1]] = count
                count += 1
        mask = mask.reshape(nwh, window_size[0], nww, window_size[1])
        mask = mask.transpose(0, 2, 1, 3).reshape(num_windows, ws)
        attn_mask = mask[:, None, :] - mask[:, :, None]
        attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
        attn = attn.reshape(b, num_windows, num_heads, ws, ws)
        attn = attn + jnp.asarray(attn_mask)[None, :, None]
        attn = attn.reshape(-1, num_heads, ws, ws)

    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], ws, c)
    out = proj(out)

    out = out.reshape(b, nwh, nww, window_size[0], window_size[1], c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, pad_h, pad_w, c)
    if sum(shift_size) > 0:
        out = jnp.roll(out, (shift_size[0], shift_size[1]), axis=(1, 2))
    return out[:, :h, :w, :]


class ShiftedWindowAttention(nn.Module):
    dim: int
    window_size: Tuple[int, int]
    shift_size: Tuple[int, int]
    num_heads: int
    v2: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        ws = self.window_size
        n = ws[0] * ws[1]
        rel_idx = _relative_position_index(ws)

        if self.v2:
            table_in = jnp.asarray(_relative_coords_table(ws))
            t = nn.Dense(512, name="cpb_mlp.0")(table_in)
            t = nn.relu(t)
            t = nn.Dense(self.num_heads, use_bias=False, name="cpb_mlp.2")(t)
            table = t.reshape(-1, self.num_heads)
            bias = table[rel_idx].reshape(n, n, self.num_heads)
            bias = bias.transpose(2, 0, 1)[None]
            bias = 16.0 * jax.nn.sigmoid(bias)
            logit_scale = self.param(
                "logit_scale",
                lambda k: jnp.full((self.num_heads, 1, 1), math.log(10.0)),
            )
        else:
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.normal(stddev=0.02),
                ((2 * ws[0] - 1) * (2 * ws[1] - 1), self.num_heads),
            )
            bias = table[rel_idx].reshape(n, n, self.num_heads)
            bias = bias.transpose(2, 0, 1)[None]
            logit_scale = None

        qkv = nn.Dense(3 * self.dim, name="qkv")
        proj = nn.Dense(self.dim, name="proj")
        # v2 zeroes the k-bias slice (reference :175-179); enforced at
        # conversion time in _swin_hooks (the bias is additive to k only)

        return shifted_window_attention(
            x,
            qkv,
            proj,
            bias,
            list(ws),
            self.num_heads,
            list(self.shift_size),
            logit_scale=logit_scale,
        )


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int]
    shift_size: Tuple[int, int]
    mlp_ratio: float
    sd_prob: float
    v2: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        attn = ShiftedWindowAttention(
            self.dim, self.window_size, self.shift_size, self.num_heads,
            v2=self.v2, name="attn",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")

        def mlp(t):
            t = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp.0")(t)
            t = nn.gelu(t, approximate=False)
            return nn.Dense(self.dim, name="mlp.3")(t)

        def sd(t):
            if train and self.sd_prob > 0:
                return stochastic_depth(
                    t, self.sd_prob, "row", True, key=self.make_rng("dropout")
                )
            return t

        if self.v2:
            x = x + sd(norm1(attn(x, train)))
            x = x + sd(norm2(mlp(x)))
        else:
            x = x + sd(attn(norm1(x), train))
            x = x + sd(mlp(norm2(x)))
        return x


class PatchMerging(nn.Module):
    dim: int
    v2: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        h, w = x.shape[-3], x.shape[-2]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(0, h % 2), (0, w % 2), (0, 0)])
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        if self.v2:
            x = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        else:
            x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
            x = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)
        return x


class SwinTransformer(nn.Module):
    patch_size: Tuple[int, int]
    embed_dim: int
    depths: Tuple[int, ...]
    num_heads: Tuple[int, ...]
    window_size: Tuple[int, int]
    mlp_ratio: float = 4.0
    stochastic_depth_prob: float = 0.1
    num_classes: int = 1000
    v2: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        x = nn.Conv(
            self.embed_dim, self.patch_size, self.patch_size, padding="VALID",
            name="features.0.0",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="features.0.2")(x)

        total = sum(self.depths)
        block_id = 0
        layer_idx = 1
        for i_stage, depth in enumerate(self.depths):
            dim = self.embed_dim * 2**i_stage
            for i_layer in range(depth):
                sd = self.stochastic_depth_prob * block_id / (total - 1)
                shift = [
                    0 if i_layer % 2 == 0 else w_ // 2 for w_ in self.window_size
                ]
                x = SwinBlock(
                    dim, self.num_heads[i_stage], tuple(self.window_size),
                    tuple(shift), self.mlp_ratio, sd, v2=self.v2,
                    name=f"features.{layer_idx}.{i_layer}",
                )(x, train)
                block_id += 1
            feats[f"stage{i_stage}"] = x
            layer_idx += 1
            if i_stage < len(self.depths) - 1:
                x = PatchMerging(dim, v2=self.v2, name=f"features.{layer_idx}")(
                    x, train
                )
                layer_idx += 1

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = jnp.mean(x, axis=(-3, -2))
        x = nn.Dense(self.num_classes, name="head")(x)
        if return_features:
            return x, feats
        return x


def _swin_hooks(sd):
    """v2 checkpoints: zero the k-bias slice of qkv.bias (the reference does
    this at runtime, ``swin_transformer.py:175-179``); drop the computed
    buffers."""
    out = {}
    for k, v in sd.items():
        if k.endswith("relative_position_index") or k.endswith(
            "relative_coords_table"
        ):
            continue
        if k.endswith("attn.qkv.bias") and k.replace("qkv.bias", "logit_scale") in sd:
            v = np.array(v)
            length = v.size // 3
            v[length : 2 * length] = 0
        out[k] = v
    return out


def _w(url, acc1, acc5, num_params, crop, resize, interp="bicubic"):
    return Weights(
        url=url,
        transforms=functools.partial(
            ImageClassification, crop_size=crop, resize_size=resize,
            interpolation=interp,
        ),
        meta={
            "num_params": num_params,
            "_metrics": {"ImageNet-1K": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class Swin_T_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/swin_t-704ceda3.pth",
        81.474, 95.776, 28288354, 224, 232,
    )
    DEFAULT = IMAGENET1K_V1


class Swin_S_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/swin_s-5e29d889.pth",
        83.196, 96.360, 49606258, 224, 246,
    )
    DEFAULT = IMAGENET1K_V1


class Swin_B_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/swin_b-68c6b09e.pth",
        83.582, 96.640, 87768224, 224, 238,
    )
    DEFAULT = IMAGENET1K_V1


class Swin_V2_T_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/swin_v2_t-b137f0e2.pth",
        82.072, 96.132, 28351570, 256, 260,
    )
    DEFAULT = IMAGENET1K_V1


class Swin_V2_S_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/swin_v2_s-637d8ceb.pth",
        83.712, 96.816, 49737442, 256, 260,
    )
    DEFAULT = IMAGENET1K_V1


class Swin_V2_B_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/swin_v2_b-781e5279.pth",
        84.112, 96.864, 87930848, 256, 272,
    )
    DEFAULT = IMAGENET1K_V1


def _swin(patch, dim, depths, heads, window, sd_prob, weights, v2=False, **kwargs):
    module = SwinTransformer(
        patch_size=tuple(patch), embed_dim=dim, depths=tuple(depths),
        num_heads=tuple(heads), window_size=tuple(window),
        stochastic_depth_prob=sd_prob, v2=v2, **kwargs,
    )
    return build_model(
        module, weights, input_shape=(1, 64, 64, 3), hooks=_swin_hooks
    )


@register_model()
def swin_t(*, weights: Optional[Swin_T_Weights] = None, **kwargs):
    return _swin([4, 4], 96, [2, 2, 6, 2], [3, 6, 12, 24], [7, 7], 0.2,
                 Swin_T_Weights.verify(weights), **kwargs)


@register_model()
def swin_s(*, weights: Optional[Swin_S_Weights] = None, **kwargs):
    return _swin([4, 4], 96, [2, 2, 18, 2], [3, 6, 12, 24], [7, 7], 0.3,
                 Swin_S_Weights.verify(weights), **kwargs)


@register_model()
def swin_b(*, weights: Optional[Swin_B_Weights] = None, **kwargs):
    return _swin([4, 4], 128, [2, 2, 18, 2], [4, 8, 16, 32], [7, 7], 0.5,
                 Swin_B_Weights.verify(weights), **kwargs)


@register_model()
def swin_v2_t(*, weights: Optional[Swin_V2_T_Weights] = None, **kwargs):
    return _swin([4, 4], 96, [2, 2, 6, 2], [3, 6, 12, 24], [8, 8], 0.2,
                 Swin_V2_T_Weights.verify(weights), v2=True, **kwargs)


@register_model()
def swin_v2_s(*, weights: Optional[Swin_V2_S_Weights] = None, **kwargs):
    return _swin([4, 4], 96, [2, 2, 18, 2], [3, 6, 12, 24], [8, 8], 0.3,
                 Swin_V2_S_Weights.verify(weights), v2=True, **kwargs)


@register_model()
def swin_v2_b(*, weights: Optional[Swin_V2_B_Weights] = None, **kwargs):
    return _swin([4, 4], 128, [2, 2, 18, 2], [4, 8, 16, 32], [8, 8], 0.5,
                 Swin_V2_B_Weights.verify(weights), v2=True, **kwargs)
