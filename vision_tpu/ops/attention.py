"""Attention dispatch: Pallas flash attention on TPU, einsum fallback.

ViT/MaxViT blocks (SURVEY.md §5 long-context note: ViT-H/14 at 518px is
~1370 tokens) route through here; the flash path avoids materializing the
[B, H, S, S] score matrix in HBM.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["scaled_dot_product_attention"]


def _einsum_attention(q, k, v, scale):
    attn = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def _flash_supported(q) -> bool:
    """Route to the Pallas flash kernel only where it wins: short
    sequences (ViT-B/16 at 224px is s=197) fit the whole [S, S] score
    block in VMEM, so the einsum path is faster there and flash's
    block machinery only pays off once S is past a few hundred
    (``benchmarks/attention.py`` measures the crossover). Env override
    ``VISION_TPU_FLASH_ATTENTION=0|1`` forces a path for A/B."""
    forced = os.environ.get("VISION_TPU_FLASH_ATTENTION")
    if forced is not None:
        return forced == "1"
    if jax.default_backend() != "tpu":
        return False
    b, h, s, d = q.shape
    # flash kernel wants lane-aligned head_dim and enough length to win
    return d % 128 == 0 or d in (64,) and s >= 512


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """q, k, v: [B, H, S, D] -> [B, H, S, D]. Full (non-causal) attention."""
    b, h, s, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    if not _flash_supported(q):
        return _einsum_attention(q, k, v, scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    # pad seq to a 128 multiple; padded tokens get their own segment id so
    # they never mix with real tokens
    pad = (-s) % 128
    if pad:
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        seg = jnp.concatenate(
            [jnp.zeros((b, s), jnp.int32), jnp.ones((b, pad), jnp.int32)],
            axis=1,
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        qp, kp, vp = q, k, v
        segment_ids = None

    out = flash_attention(
        qp, kp, vp, segment_ids=segment_ids, causal=False, sm_scale=scale
    )
    return out[:, :, :s, :]
