"""MViT v1/v2 (reference ``torchvision/models/video/mvit.py``, 898 LoC):
multiscale pooled attention video transformers.

All (T, H, W) bookkeeping is static Python (input size fixed at build), so
pooled sequence lengths are compile-time constants; the pooled attention is
batched MXU matmuls with depthwise-conv3d token pooling."""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.ops.stochastic_depth import stochastic_depth
from vision_tpu.transforms._presets import VideoClassification

__all__ = [
    "MViT",
    "MViT_V1_B_Weights",
    "MViT_V2_S_Weights",
    "mvit_v1_b",
    "mvit_v2_s",
]


@dataclasses.dataclass(frozen=True)
class MSBlockConfig:
    num_heads: int
    input_channels: int
    output_channels: int
    kernel_q: Tuple[int, ...]
    kernel_kv: Tuple[int, ...]
    stride_q: Tuple[int, ...]
    stride_kv: Tuple[int, ...]


def _prod(s) -> int:
    out = 1
    for v in s:
        out *= v
    return out


class _TokenPool(nn.Module):
    """reference ``mvit.py:65`` Pool: depthwise conv3d (or maxpool) over
    the spatial tokens, class token passed through; optional LN after."""

    head_dim: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    thw: Tuple[int, int, int]
    kind: str = "conv"  # "conv" | "max"
    with_norm: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [B, H, N+1, D]
        b, h, n1, d = x.shape
        t, hh, ww = self.thw
        cls, tok = x[:, :, :1], x[:, :, 1:]
        tok = tok.reshape(b * h, t, hh, ww, d)
        pads = [(k // 2, k // 2) for k in self.kernel]
        if self.kind == "conv":
            tok = nn.Conv(
                d,
                self.kernel,
                self.stride,
                padding=pads,
                feature_group_count=d,
                use_bias=False,
                name="pool",
            )(tok)
        else:
            tok = jnp.pad(
                tok,
                ((0, 0),) + tuple(pads) + ((0, 0),),
                constant_values=-jnp.inf,
            )
            tok = nn.max_pool(tok, self.kernel, self.stride)
        to, ho, wo = tok.shape[1:4]
        tok = tok.reshape(b, h, to * ho * wo, d)
        out = jnp.concatenate([cls, tok], axis=2)
        if self.with_norm:
            out = nn.LayerNorm(epsilon=1e-6, name="norm_act.0")(out)
        return out, (to, ho, wo)


def _interp_embedding(emb: jax.Array, d: int) -> jax.Array:
    """torch F.interpolate(mode='linear') over the first axis."""
    if emb.shape[0] == d:
        return emb
    from vision_tpu.transforms.v2.functional._resample import resample_matrix

    w = jnp.asarray(resample_matrix(emb.shape[0], d, "linear", False))
    return w @ emb


class MultiscaleAttention(nn.Module):
    """reference ``mvit.py:196``."""

    thw: Tuple[int, int, int]
    embed_dim: int
    output_dim: int
    num_heads: int
    cnf: MSBlockConfig
    residual_pool: bool
    residual_with_cls_embed: bool
    rel_pos_embed: bool
    input_size: Tuple[int, int, int]  # for rel-pos table sizing

    @nn.compact
    def __call__(self, x, train=False):
        b, n, c = x.shape
        head_dim = self.output_dim // self.num_heads
        scaler = 1.0 / math.sqrt(head_dim)
        cnf = self.cnf

        qkv = nn.Dense(3 * self.output_dim, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        thw = self.thw
        k_thw = thw
        if _prod(cnf.kernel_kv) > 1 or _prod(cnf.stride_kv) > 1:
            k, k_thw = _TokenPool(
                head_dim, tuple(cnf.kernel_kv), tuple(cnf.stride_kv), thw,
                name="pool_k",
            )(k)
            v, _ = _TokenPool(
                head_dim, tuple(cnf.kernel_kv), tuple(cnf.stride_kv), thw,
                name="pool_v",
            )(v)
        q_thw = thw
        if _prod(cnf.kernel_q) > 1 or _prod(cnf.stride_q) > 1:
            q, q_thw = _TokenPool(
                head_dim, tuple(cnf.kernel_q), tuple(cnf.stride_q), thw,
                name="pool_q",
            )(q)

        attn = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scaler, k,
            preferred_element_type=jnp.float32,
        )

        if self.rel_pos_embed:
            # reference sizes the tables off the block's CURRENT input size
            # (input_size shrinks as stride_q pools, mvit.py MViT.__init__)
            size = max(self.thw[1:])
            q_size = size // cnf.stride_q[1] if cnf.stride_q else size
            kv_size = size // cnf.stride_kv[1] if cnf.stride_kv else size
            spatial_dim = 2 * max(q_size, kv_size) - 1
            temporal_dim = 2 * self.thw[0] - 1
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.normal(0.02), (spatial_dim, head_dim)
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.normal(0.02), (spatial_dim, head_dim)
            )
            rel_pos_t = self.param(
                "rel_pos_t", nn.initializers.normal(0.02), (temporal_dim, head_dim)
            )
            attn = _add_rel_pos(
                attn, q, q_thw, k_thw, rel_pos_h, rel_pos_w, rel_pos_t
            )

        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        if self.residual_pool:
            if self.residual_with_cls_embed:
                out = out + q
            else:
                out = out.at[:, :, 1:, :].add(q[:, :, 1:, :])
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, self.output_dim)
        out = nn.Dense(self.output_dim, name="project.0")(out)
        return out, q_thw


def _add_rel_pos(attn, q, q_thw, k_thw, rel_pos_h, rel_pos_w, rel_pos_t):
    """reference ``mvit.py:124`` (decomposed relative positions)."""
    q_t, q_h, q_w = q_thw
    k_t, k_h, k_w = k_thw
    dh = 2 * max(q_h, k_h) - 1
    dw = 2 * max(q_w, k_w) - 1
    dt = 2 * max(q_t, k_t) - 1

    def dist(qs, ks):
        qr = max(ks / qs, 1.0)
        kr = max(qs / ks, 1.0)
        return (
            np.arange(qs)[:, None] * qr
            - (np.arange(ks)[None, :] + (1.0 - ks)) * kr
        ).astype(np.int64)

    rh = _interp_embedding(rel_pos_h, dh)[jnp.asarray(dist(q_h, k_h))]
    rw = _interp_embedding(rel_pos_w, dw)[jnp.asarray(dist(q_w, k_w))]
    rt = _interp_embedding(rel_pos_t, dt)[jnp.asarray(dist(q_t, k_t))]

    b, n_head, _, dim = q.shape
    r_q = q[:, :, 1:].reshape(b, n_head, q_t, q_h, q_w, dim)
    rel_h = jnp.einsum("bythwc,hkc->bythwk", r_q, rh)
    rel_w = jnp.einsum("bythwc,wkc->bythwk", r_q, rw)
    rel_t = jnp.einsum(
        "byhwtc,tkc->byhwtk", r_q.transpose(0, 1, 3, 4, 2, 5), rt
    )
    # rel_t is [b, heads, q_h, q_w, q_t, k_t]; reorder to [b, heads, q_t, q_h, q_w, k_t]
    rel_t = rel_t.transpose(0, 1, 4, 2, 3, 5)

    rel = (
        rel_h[:, :, :, :, :, None, :, None]
        + rel_w[:, :, :, :, :, None, None, :]
        + rel_t[:, :, :, :, :, :, None, None]
    ).reshape(b, n_head, q_t * q_h * q_w, k_t * k_h * k_w)
    return attn.at[:, :, 1:, 1:].add(rel)


class MultiscaleBlock(nn.Module):
    """reference ``mvit.py:324``."""

    thw: Tuple[int, int, int]
    cnf: MSBlockConfig
    residual_pool: bool
    residual_with_cls_embed: bool
    rel_pos_embed: bool
    proj_after_attn: bool
    sd_prob: float
    input_size: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x, train=False):
        cnf = self.cnf
        attn_dim = (
            cnf.output_channels if self.proj_after_attn else cnf.input_channels
        )
        needs_proj = cnf.input_channels != cnf.output_channels

        x_norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x_attn, thw_new = MultiscaleAttention(
            self.thw,
            cnf.input_channels,
            attn_dim,
            cnf.num_heads,
            cnf,
            self.residual_pool,
            self.residual_with_cls_embed,
            self.rel_pos_embed,
            self.input_size,
            name="attn",
        )(x_norm1, train)

        if needs_proj and self.proj_after_attn:
            x = nn.Dense(cnf.output_channels, name="project")(x_norm1)
        if _prod(cnf.stride_q) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in cnf.stride_q)
            head_like = x.shape[-1]
            # pool_skip operates on [B, 1, N, C]
            xs, _ = _TokenPool(
                head_like, kernel_skip, tuple(cnf.stride_q), self.thw,
                kind="max", with_norm=False, name="pool_skip",
            )(x[:, None])
            x_skip = xs[:, 0]
        else:
            x_skip = x

        def sd(v):
            if train and self.sd_prob > 0:
                return stochastic_depth(
                    v, self.sd_prob, "row", True, key=self.make_rng("dropout")
                )
            return v

        x = x_skip + sd(x_attn)
        x_norm2 = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        m = nn.Dense(4 * attn_dim, name="mlp.0")(x_norm2)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(cnf.output_channels, name="mlp.3")(m)
        if needs_proj and not self.proj_after_attn:
            x = nn.Dense(cnf.output_channels, name="project")(x_norm2)
        return x + sd(m), thw_new


class MViT(nn.Module):
    """reference ``mvit.py:425``. Input (N, T, H, W, C)."""

    block_setting: Tuple[MSBlockConfig, ...]
    spatial_size: Tuple[int, int] = (224, 224)
    temporal_size: int = 16
    residual_pool: bool = False
    residual_with_cls_embed: bool = False
    rel_pos_embed: bool = False
    proj_after_attn: bool = False
    stochastic_depth_prob: float = 0.2
    dropout: float = 0.5
    num_classes: int = 400

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        embed = self.block_setting[0].input_channels
        x = nn.Conv(
            embed, (3, 7, 7), (2, 4, 4), padding=[(1, 1), (3, 3), (3, 3)],
            name="conv_proj",
        )(x)
        b, t, h, w, c = x.shape
        x = x.reshape(b, t * h * w, c)

        cls_token = self.param(
            "pos_encoding.class_token", nn.initializers.zeros, (embed,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (b, 1, embed)), x], axis=1
        )
        if not self.rel_pos_embed:
            spatial_pos = self.param(
                "pos_encoding.spatial_pos", nn.initializers.zeros,
                (h * w, embed),
            )
            temporal_pos = self.param(
                "pos_encoding.temporal_pos", nn.initializers.zeros, (t, embed)
            )
            class_pos = self.param(
                "pos_encoding.class_pos", nn.initializers.zeros, (embed,)
            )
            pos = jnp.repeat(temporal_pos, h * w, axis=0) + jnp.tile(
                spatial_pos, (t, 1)
            )
            pos = jnp.concatenate([class_pos[None], pos], axis=0)
            x = x + pos[None]

        thw = (t, h, w)
        input_size = thw
        total = len(self.block_setting)
        features = {}
        for i, cnf in enumerate(self.block_setting):
            sdp = self.stochastic_depth_prob * i / (total - 1.0)
            x, thw = MultiscaleBlock(
                thw,
                cnf,
                self.residual_pool,
                self.residual_with_cls_embed,
                self.rel_pos_embed,
                self.proj_after_attn,
                sdp,
                input_size,
                name=f"blocks.{i}",
            )(x, train)
            features[f"blocks.{i}"] = x

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = x[:, 0]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, name="head.1")(x)
        if return_features:
            return x, features
        return x


def _mk_config(config) -> Tuple[MSBlockConfig, ...]:
    return tuple(
        MSBlockConfig(
            num_heads=config["num_heads"][i],
            input_channels=config["input_channels"][i],
            output_channels=config["output_channels"][i],
            kernel_q=tuple(config["kernel_q"][i]),
            kernel_kv=tuple(config["kernel_kv"][i]),
            stride_q=tuple(config["stride_q"][i]),
            stride_kv=tuple(config["stride_kv"][i]),
        )
        for i in range(len(config["num_heads"]))
    )


_V1_CONFIG = {
    "num_heads": [1, 2, 2, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 8, 8],
    "input_channels": [96, 192, 192, 384, 384, 384, 384, 384, 384, 384, 384,
                       384, 384, 384, 768, 768],
    "output_channels": [192, 192, 384, 384, 384, 384, 384, 384, 384, 384,
                        384, 384, 384, 768, 768, 768],
    "kernel_q": [[], [3, 3, 3], [], [3, 3, 3], [], [], [], [], [], [], [],
                 [], [], [], [3, 3, 3], []],
    "kernel_kv": [[3, 3, 3]] * 16,
    "stride_q": [[], [1, 2, 2], [], [1, 2, 2], [], [], [], [], [], [], [],
                 [], [], [], [1, 2, 2], []],
    "stride_kv": [[1, 8, 8], [1, 4, 4], [1, 4, 4], [1, 2, 2], [1, 2, 2],
                  [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 2, 2],
                  [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 1, 1],
                  [1, 1, 1]],
}

_V2_CONFIG = {
    "num_heads": [1, 2, 2, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 8, 8],
    "input_channels": [96, 96, 192, 192, 384, 384, 384, 384, 384, 384, 384,
                       384, 384, 384, 384, 768],
    "output_channels": [96, 192, 192, 384, 384, 384, 384, 384, 384, 384,
                        384, 384, 384, 384, 768, 768],
    "kernel_q": [[3, 3, 3]] * 16,
    "kernel_kv": [[3, 3, 3]] * 16,
    "stride_q": [[1, 1, 1], [1, 2, 2], [1, 1, 1], [1, 2, 2], [1, 1, 1],
                 [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 1],
                 [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 1, 1], [1, 2, 2],
                 [1, 1, 1]],
    "stride_kv": [[1, 8, 8], [1, 4, 4], [1, 4, 4], [1, 2, 2], [1, 2, 2],
                  [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 2, 2],
                  [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 2, 2], [1, 1, 1],
                  [1, 1, 1]],
}


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


class MViT_V1_B_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/mvit_v1_b-dbeb1030.pth",
        78.477, 93.582, 36610672,
    )
    DEFAULT = KINETICS400_V1


class MViT_V2_S_Weights(WeightsEnum):
    KINETICS400_V1 = _w(
        "https://download.pytorch.org/models/mvit_v2_s-ae3be167.pth",
        80.757, 94.665, 34537744,
    )
    DEFAULT = KINETICS400_V1


@register_model()
def mvit_v1_b(*, weights: Optional[MViT_V1_B_Weights] = None, **kwargs):
    weights = MViT_V1_B_Weights.verify(weights)
    module = MViT(
        block_setting=_mk_config(_V1_CONFIG),
        residual_pool=False,
        residual_with_cls_embed=False,
        rel_pos_embed=False,
        proj_after_attn=False,
        **kwargs,
    )
    return build_model(module, weights, input_shape=(1, 16, 224, 224, 3))


@register_model()
def mvit_v2_s(*, weights: Optional[MViT_V2_S_Weights] = None, **kwargs):
    weights = MViT_V2_S_Weights.verify(weights)
    module = MViT(
        block_setting=_mk_config(_V2_CONFIG),
        residual_pool=True,
        residual_with_cls_embed=False,
        rel_pos_embed=True,
        proj_after_attn=True,
        **kwargs,
    )
    return build_model(module, weights, input_shape=(1, 16, 224, 224, 3))
