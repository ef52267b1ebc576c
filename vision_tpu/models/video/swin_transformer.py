"""Video Swin Transformer (reference
``torchvision/models/video/swin_transformer.py``, 743 LoC):
swin3d_t/s/b with (T, H, W) shifted windows. Layout (N, T, H, W, C)."""

from __future__ import annotations

import functools
import itertools
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.models.swin_transformer import _swin_hooks
from vision_tpu.ops.stochastic_depth import stochastic_depth
from vision_tpu.transforms._presets import VideoClassification

__all__ = [
    "SwinTransformer3d",
    "Swin3D_T_Weights",
    "Swin3D_S_Weights",
    "Swin3D_B_Weights",
    "swin3d_t",
    "swin3d_s",
    "swin3d_b",
]


def _rel_position_index_3d(ws) -> np.ndarray:
    """reference ``define_relative_position_index`` (3D)."""
    wd, wh, ww = ws
    coords = np.stack(
        np.meshgrid(
            np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij"
        )
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


def _adjust_window(size_dhw, window_size, shift_size):
    """reference ``_get_window_and_shift_size``: shrink windows larger than
    the input and zero their shifts."""
    ws, ss = list(window_size), list(shift_size)
    for i in range(3):
        if size_dhw[i] <= ws[i]:
            ws[i] = size_dhw[i]
            ss[i] = 0
    return ws, ss


class ShiftedWindowAttention3d(nn.Module):
    """reference ``video/swin_transformer.py:230``."""

    dim: int
    window_size: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]
    num_heads: int

    @nn.compact
    def __call__(self, x, train=False):
        b, t, h, w, c = x.shape
        ws, ss = _adjust_window((t, h, w), self.window_size, self.shift_size)
        wd, wh, ww = ws
        n = wd * wh * ww

        full = self.window_size
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            (
                (2 * full[0] - 1) * (2 * full[1] - 1) * (2 * full[2] - 1),
                self.num_heads,
            ),
        )
        # reference _get_relative_position_bias subsets the FULL window's
        # index matrix ([:n, :n], i.e. the row-major prefix of positions)
        # when the window shrank — NOT a recomputed index over the shrunk
        # window (video/swin_transformer.py:47-57)
        rel_idx = _rel_position_index_3d(self.window_size)[:n, :n]
        bias = table[rel_idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]

        # pad to window multiples
        pt = (-t) % wd
        ph = (-h) % wh
        pw = (-w) % ww
        xp = jnp.pad(x, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)))
        tp, hp, wp = t + pt, h + ph, w + pw

        if sum(ss) > 0:
            xp = jnp.roll(xp, (-ss[0], -ss[1], -ss[2]), axis=(1, 2, 3))

        nt, nh, nw = tp // wd, hp // wh, wp // ww
        num_windows = nt * nh * nw
        xw = xp.reshape(b, nt, wd, nh, wh, nw, ww, c)
        xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b * num_windows, n, c)

        qkv = nn.Dense(3 * self.dim, name="qkv")(xw)
        qkv = qkv.reshape(xw.shape[0], n, 3, self.num_heads, c // self.num_heads)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (c // self.num_heads) ** -0.5, qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        attn = attn + bias

        if sum(ss) > 0:
            # attention mask over shifted 3D windows (reference
            # ``_compute_attention_mask_3d``)
            mask = np.zeros((tp, hp, wp), np.float32)
            cnt = 0
            slices = []
            for size, wsz, s_ in zip((tp, hp, wp), ws, ss):
                slices.append(
                    ((0, size - wsz), (size - wsz, size - s_), (size - s_, size))
                )
            for sd in slices[0]:
                for sh in slices[1]:
                    for sw in slices[2]:
                        mask[sd[0]:sd[1], sh[0]:sh[1], sw[0]:sw[1]] = cnt
                        cnt += 1
            m = mask.reshape(nt, wd, nh, wh, nw, ww)
            m = m.transpose(0, 2, 4, 1, 3, 5).reshape(num_windows, n)
            am = m[:, None, :] - m[:, :, None]
            am = np.where(am != 0, -100.0, 0.0).astype(np.float32)
            attn = attn.reshape(b, num_windows, self.num_heads, n, n)
            attn = attn + jnp.asarray(am)[None, :, None]
            attn = attn.reshape(-1, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(xw.shape[0], n, c)
        out = nn.Dense(self.dim, name="proj")(out)

        out = out.reshape(b, nt, nh, nw, wd, wh, ww, c)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, tp, hp, wp, c)
        if sum(ss) > 0:
            out = jnp.roll(out, (ss[0], ss[1], ss[2]), axis=(1, 2, 3))
        return out[:, :t, :h, :w, :]


class SwinBlock3d(nn.Module):
    dim: int
    num_heads: int
    window_size: Tuple[int, int, int]
    shift_size: Tuple[int, int, int]
    mlp_ratio: float
    sd_prob: float

    @nn.compact
    def __call__(self, x, train=False):
        def sd(v):
            if train and self.sd_prob > 0:
                return stochastic_depth(
                    v, self.sd_prob, "row", True, key=self.make_rng("dropout")
                )
            return v

        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = ShiftedWindowAttention3d(
            self.dim, self.window_size, self.shift_size, self.num_heads,
            name="attn",
        )(h, train)
        x = x + sd(h)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp.0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp.3")(y)
        return x + sd(y)


class SwinTransformer3d(nn.Module):
    """reference ``video/swin_transformer.py:366``. Input (N, T, H, W, C)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    stochastic_depth_prob: float = 0.1
    num_classes: int = 400

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        pt, ph, pw = self.patch_size
        x = nn.Conv(
            self.embed_dim, (pt, ph, pw), (pt, ph, pw), padding="VALID",
            name="patch_embed.proj",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_embed.norm")(x)

        total = sum(self.depths)
        block_id = 0
        layer_idx = 0
        features = {"patch_embed": x}
        for i_stage, depth in enumerate(self.depths):
            dim = self.embed_dim * 2**i_stage
            for i_layer in range(depth):
                sdp = self.stochastic_depth_prob * block_id / (total - 1)
                shift = tuple(
                    0 if i_layer % 2 == 0 else w_ // 2
                    for w_ in self.window_size
                )
                x = SwinBlock3d(
                    dim, self.num_heads[i_stage], tuple(self.window_size),
                    shift, self.mlp_ratio, sdp,
                    name=f"features.{layer_idx}.{i_layer}",
                )(x, train)
                block_id += 1
            features[f"features.{layer_idx}"] = x
            layer_idx += 1
            if i_stage < len(self.depths) - 1:
                # 2D patch merging over (H, W) only (reference uses the
                # image PatchMerging on the last two spatial dims)
                b, t, hh, ww_, c = x.shape
                xp = jnp.pad(
                    x, ((0, 0), (0, 0), (0, hh % 2), (0, ww_ % 2), (0, 0))
                )
                x0 = xp[:, :, 0::2, 0::2, :]
                x1 = xp[:, :, 1::2, 0::2, :]
                x2 = xp[:, :, 0::2, 1::2, :]
                x3 = xp[:, :, 1::2, 1::2, :]
                x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
                x = nn.LayerNorm(
                    epsilon=1e-5, name=f"features.{layer_idx}.norm"
                )(x)
                x = nn.Dense(
                    2 * dim, use_bias=False,
                    name=f"features.{layer_idx}.reduction",
                )(x)
                layer_idx += 1

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        x = nn.Dense(self.num_classes, name="head")(x)
        if return_features:
            return x, features
        return x


def _w(url, acc1, acc5, num_params):
    return Weights(
        url=url,
        transforms=functools.partial(
            VideoClassification, crop_size=(224, 224), resize_size=(256, 256)
        ),
        meta={
            "num_params": num_params,
            "_metrics": {"Kinetics-400": {"acc@1": acc1, "acc@5": acc5}},
        },
    )


class Swin3D_T_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/swin3d_t-7615ae03.pth",
        77.715, 93.519, 28158070,
    )
    DEFAULT = KINETICS400_V1


class Swin3D_S_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/swin3d_s-da41c237.pth",
        79.521, 94.158, 49816678,
    )
    DEFAULT = KINETICS400_V1


class Swin3D_B_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/swin3d_b_1k-24f7c7c6.pth",
        79.427, 94.386, 88048984,
    )
    KINETICS400_IMAGENET22K_V1 = _w(
        "https://download.pytorch.org/models/swin3d_b_22k-7c6ae6fa.pth",
        81.643, 95.574, 88048984,
    )
    DEFAULT = KINETICS400_V1


def _swin3d(dim, depths, heads, sd, weights, **kwargs):
    module = SwinTransformer3d(
        embed_dim=dim, depths=tuple(depths), num_heads=tuple(heads),
        stochastic_depth_prob=sd, **kwargs,
    )
    return build_model(
        module, weights, input_shape=(1, 4, 64, 64, 3), hooks=_swin_hooks
    )


@register_model()
def swin3d_t(*, weights: Optional[Swin3D_T_Weights] = None, **kwargs):
    return _swin3d(96, [2, 2, 6, 2], [3, 6, 12, 24], 0.1,
                   Swin3D_T_Weights.verify(weights), **kwargs)


@register_model()
def swin3d_s(*, weights: Optional[Swin3D_S_Weights] = None, **kwargs):
    return _swin3d(96, [2, 2, 18, 2], [3, 6, 12, 24], 0.1,
                   Swin3D_S_Weights.verify(weights), **kwargs)


@register_model()
def swin3d_b(*, weights: Optional[Swin3D_B_Weights] = None, **kwargs):
    return _swin3d(128, [2, 2, 18, 2], [4, 8, 16, 32], 0.1,
                   Swin3D_B_Weights.verify(weights), **kwargs)
