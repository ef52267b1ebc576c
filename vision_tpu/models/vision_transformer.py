"""Vision Transformer (reference
``torchvision/models/vision_transformer.py``, 864 LoC):
vit_b_16/b_32/l_16/l_32/h_14.

Attention runs as a single fused qkv projection + scaled dot product —
the [B, heads, S, S] matmuls map straight onto the MXU (S <= 1370 for
ViT-H/14 at 518px, SURVEY.md §5 long-context note); a Pallas flash-attention
kernel can drop in behind the same module interface.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._api import Weights, WeightsEnum, register_model
from vision_tpu.models._utils import VisionModel, build_model
from vision_tpu.transforms._presets import ImageClassification

__all__ = [
    "VisionTransformer",
    "ViT_B_16_Weights",
    "ViT_B_32_Weights",
    "ViT_L_16_Weights",
    "ViT_L_32_Weights",
    "ViT_H_14_Weights",
    "vit_b_16",
    "vit_b_32",
    "vit_l_16",
    "vit_l_32",
    "vit_h_14",
]


class MultiheadSelfAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` equivalent (packed qkv). Param names
    in_proj / out_proj are remapped by the converter hook from
    ``in_proj_weight``/``in_proj_bias``."""

    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        b, s, d = x.shape
        dh = d // self.num_heads
        qkv = nn.Dense(3 * d, name="in_proj")(x)  # [B, S, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, self.num_heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        if train and self.dropout > 0:
            # attention dropout requires the materialized score matrix
            attn = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / math.sqrt(dh)
            attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        else:
            from vision_tpu.ops.attention import scaled_dot_product_attention

            out = scaled_dot_product_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return nn.Dense(d, name="out_proj")(out)


class EncoderBlock(nn.Module):
    """reference EncoderBlock."""

    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.LayerNorm(epsilon=1e-6, name="ln_1")(x)
        h = MultiheadSelfAttention(
            self.num_heads, self.attention_dropout, name="self_attention"
        )(h, train)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = x + h
        y = nn.LayerNorm(epsilon=1e-6, name="ln_2")(x)
        y = nn.Dense(self.mlp_dim, name="mlp.0")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(x.shape[-1], name="mlp.3")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y


class VisionTransformer(nn.Module):
    """reference VisionTransformer."""

    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    representation_size: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False, return_features: bool = False):
        feats = {}
        n, h, w, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.hidden_dim, (p, p), (p, p), padding="VALID", name="conv_proj"
        )(x)
        n_h, n_w = x.shape[1], x.shape[2]
        x = x.reshape(n, n_h * n_w, self.hidden_dim)

        class_token = self.param(
            "class_token", nn.initializers.zeros, (1, 1, self.hidden_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(class_token, (n, 1, self.hidden_dim)), x], axis=1
        )

        seq_len = n_h * n_w + 1
        pos_embedding = self.param(
            "encoder.pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, (self.image_size // p) ** 2 + 1, self.hidden_dim),
        )
        if pos_embedding.shape[1] != seq_len:
            pos_embedding = _interpolate_pos_embedding(pos_embedding, n_h, n_w)
        x = x + pos_embedding
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        for i in range(self.num_layers):
            x = EncoderBlock(
                self.num_heads,
                self.mlp_dim,
                self.dropout,
                self.attention_dropout,
                name=f"encoder.layers.encoder_layer_{i}",
            )(x, train)
            feats[f"encoder.layers.encoder_layer_{i}"] = x
        x = nn.LayerNorm(epsilon=1e-6, name="encoder.ln")(x)
        feats["encoder.ln"] = x

        x = x[:, 0]
        if self.representation_size is not None:
            x = jnp.tanh(nn.Dense(self.representation_size, name="heads.pre_logits")(x))
        x = nn.Dense(self.num_classes, name="heads.head")(x)
        if return_features:
            return x, feats
        return x


def _interpolate_pos_embedding(pos, n_h, n_w):
    """reference ``interpolate_embeddings``: bicubic resize of the grid part."""
    from vision_tpu.transforms.v2.functional._resample import resize_2d

    cls, grid = pos[:, :1], pos[:, 1:]
    g = int(math.sqrt(grid.shape[1]))
    grid = grid.reshape(1, g, g, -1)
    grid = resize_2d(grid, (n_h, n_w), mode="bicubic", antialias=False)
    return jnp.concatenate([cls, grid.reshape(1, n_h * n_w, -1)], axis=1)


def _vit_hooks(sd):
    """Rename MultiheadAttention packed params to Dense-style names."""
    out = {}
    for k, v in sd.items():
        if k.endswith("in_proj_weight"):
            out[k.replace("in_proj_weight", "in_proj.weight")] = v
        elif k.endswith("in_proj_bias"):
            out[k.replace("in_proj_bias", "in_proj.bias")] = v
        else:
            out[k] = v
    return out


def _w(url, acc1, acc5, num_params, crop=224, resize=256, interp="bilinear"):
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


class ViT_B_16_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vit_b_16-c867db91.pth",
        81.072, 95.318, 86567656,
    )
    IMAGENET1K_SWAG_E2E_V1 = _w(
        "https://download.pytorch.org/models/vit_b_16_swag-9ac1b537.pth",
        85.304, 97.650, 86859496, crop=384, resize=384, interp="bicubic",
    )
    IMAGENET1K_SWAG_LINEAR_V1 = _w(
        "https://download.pytorch.org/models/vit_b_16_lc_swag-4e70ced5.pth",
        81.886, 96.180, 86567656, interp="bicubic", resize=224,
    )
    DEFAULT = IMAGENET1K_V1


class ViT_B_32_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vit_b_32-d86f8d99.pth",
        75.912, 92.466, 88224232,
    )
    DEFAULT = IMAGENET1K_V1


class ViT_L_16_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vit_l_16-852ce7e3.pth",
        79.662, 94.638, 304326632, crop=224, resize=242,
    )
    IMAGENET1K_SWAG_E2E_V1 = _w(
        "https://download.pytorch.org/models/vit_l_16_swag-4f3808c9.pth",
        88.064, 98.512, 305174504, crop=512, resize=512, interp="bicubic",
    )
    DEFAULT = IMAGENET1K_V1


class ViT_L_32_Weights(WeightsEnum):
    IMAGENET1K_V1 = _w(
        "https://download.pytorch.org/models/vit_l_32-c7638314.pth",
        76.972, 93.07, 306535400,
    )
    DEFAULT = IMAGENET1K_V1


class ViT_H_14_Weights(WeightsEnum):
    IMAGENET1K_SWAG_E2E_V1 = _w(
        "https://download.pytorch.org/models/vit_h_14_swag-80465313.pth",
        88.552, 98.694, 633470440, crop=518, resize=518, interp="bicubic",
    )
    IMAGENET1K_SWAG_LINEAR_V1 = _w(
        "https://download.pytorch.org/models/vit_h_14_lc_swag-c1eb923e.pth",
        85.708, 97.730, 632045800, interp="bicubic", resize=224,
    )
    DEFAULT = IMAGENET1K_SWAG_E2E_V1


def _vit(image_size, patch, layers, heads, hidden, mlp, weights, **kwargs):
    module = VisionTransformer(
        image_size=image_size,
        patch_size=patch,
        num_layers=layers,
        num_heads=heads,
        hidden_dim=hidden,
        mlp_dim=mlp,
        **kwargs,
    )
    return build_model(
        module, weights, input_shape=(1, image_size, image_size, 3),
        hooks=_vit_hooks,
    )


@register_model()
def vit_b_16(*, weights: Optional[ViT_B_16_Weights] = None, **kwargs):
    weights = ViT_B_16_Weights.verify(weights)
    size = 384 if weights is ViT_B_16_Weights.IMAGENET1K_SWAG_E2E_V1 else 224
    return _vit(size, 16, 12, 12, 768, 3072, weights, **kwargs)


@register_model()
def vit_b_32(*, weights: Optional[ViT_B_32_Weights] = None, **kwargs):
    return _vit(224, 32, 12, 12, 768, 3072, ViT_B_32_Weights.verify(weights), **kwargs)


@register_model()
def vit_l_16(*, weights: Optional[ViT_L_16_Weights] = None, **kwargs):
    weights = ViT_L_16_Weights.verify(weights)
    size = 512 if weights is ViT_L_16_Weights.IMAGENET1K_SWAG_E2E_V1 else 224
    return _vit(size, 16, 24, 16, 1024, 4096, weights, **kwargs)


@register_model()
def vit_l_32(*, weights: Optional[ViT_L_32_Weights] = None, **kwargs):
    return _vit(224, 32, 24, 16, 1024, 4096, ViT_L_32_Weights.verify(weights), **kwargs)


@register_model()
def vit_h_14(*, weights: Optional[ViT_H_14_Weights] = None, **kwargs):
    weights = ViT_H_14_Weights.verify(weights)
    size = 518 if weights is ViT_H_14_Weights.IMAGENET1K_SWAG_E2E_V1 else 224
    return _vit(size, 14, 32, 16, 1280, 5120, weights, **kwargs)
