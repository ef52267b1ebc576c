"""TPU-offloaded JPEG decode: device half.

The host half (``_codecs.jpeg_coefficients_native``) stops after Huffman
entropy decoding — the only inherently serial stage of JPEG decode — and
ships quantized DCT coefficients. This module runs the data-parallel tail
under ``jit``:

    dequantize -> 8x8 IDCT (two small matmuls per block — MXU work)
    -> chroma upsample -> YCbCr->RGB -> uint8

This is the TPU-native counterpart of the reference's nvJPEG batch decode
(``torchvision/io/image.py:233`` ``decode_jpegs_cuda``): there is no JPEG
engine on TPU, so the split point moves to the coefficient boundary
instead of the bitstream boundary. On a host whose CPUs bound the input
pipeline this roughly halves host cost per image on photographic content
(Huffman ~40% of libjpeg decode time), and the IDCT/color math fuses into
the same XLA program as the model's preprocessing.

Numerics: libjpeg uses a fixed-point integer IDCT and a triangular "fancy"
chroma upsampler; this path uses a float IDCT and bilinear (half-pixel
center) chroma upsampling — the same filter and phase as the fancy
upsampler in the interior. Outputs match libjpeg within a few counts
(tested max-abs-diff bound, not bit-exact).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "idct8x8",
    "planes_to_rgb",
    "decode_coefs",
    "host_entropy_decode",
    "decode_jpeg_batch_tpu",
]


@functools.lru_cache(maxsize=8)
def _idct_basis(m: int = 8) -> np.ndarray:
    """B_M[u, j] = c(u)/2 * cos((2j+1) u pi / (2M)); pixel = B^T F B.

    m == 8 is the exact inverse of the JPEG forward DCT. m < 8 is the
    M-point truncated IDCT used by libjpeg's DCT scaling (jidctred):
    reconstructing the cosine series from the top-left MxM coefficients
    at M samples yields an M/8-scale band-limited image; the DC
    normalization c(0)=1/sqrt(2) is scale-invariant, so no extra factor
    is needed."""
    u = np.arange(m)[:, None]
    j = np.arange(m)[None, :]
    b = 0.5 * np.cos((2 * j + 1) * u * np.pi / (2.0 * m))
    b[0, :] *= 1.0 / np.sqrt(2.0)
    return b.astype(np.float32)


def idct8x8(blocks: jax.Array) -> jax.Array:
    """Inverse MxM DCT over the last two axes ([..., M, M] float32)."""
    b = jnp.asarray(_idct_basis(blocks.shape[-1]))
    return jnp.einsum("...uv,ui,vj->...ij", blocks, b, b)


def _component_plane(coefs: jax.Array, qtab: jax.Array) -> jax.Array:
    """(bh, bw, M*M) quantized coefficients -> (bh*M, bw*M) float plane
    centered at 128 (JPEG level shift). qtab is the full 64-entry table;
    its top-left MxM is used when the coefficients are truncated."""
    bh, bw, per_block = coefs.shape
    m = int(round(per_block ** 0.5))
    q = qtab.astype(jnp.float32).reshape(8, 8)[:m, :m].reshape(-1)
    deq = coefs.astype(jnp.float32) * q
    px = idct8x8(deq.reshape(bh, bw, m, m)) + 128.0
    return px.transpose(0, 2, 1, 3).reshape(bh * m, bw * m)


def _upsample_chroma(
    plane: jax.Array, y_shape: Tuple[int, int], factors: Tuple[int, int]
) -> jax.Array:
    """Upsample a chroma plane by exact integer ``factors`` (v, h) with
    half-pixel-center bilinear — the same filter and phase as libjpeg's
    triangular "fancy" upsampler — then crop to the luma plane.

    The scale must be the exact sampling ratio (NOT y_shape/plane.shape:
    both planes are independently padded to block multiples, so that
    ratio is non-integral and would drift the phase across the image)."""
    fv, fh = factors
    if fv == 1 and fh == 1:
        return plane[: y_shape[0], : y_shape[1]]
    up = jax.image.resize(
        plane,
        (plane.shape[0] * fv, plane.shape[1] * fh),
        method="bilinear",
    )
    return up[: y_shape[0], : y_shape[1]]


def planes_to_rgb(
    y: jax.Array,
    cb: jax.Array,
    cr: jax.Array,
    h: int,
    w: int,
    chroma_factors: Tuple[int, int] = (2, 2),
) -> jax.Array:
    """Full-plane Y/Cb/Cr (chroma possibly subsampled) -> (h, w, 3) uint8."""
    if cb.shape != y.shape:
        cb = _upsample_chroma(cb, y.shape, chroma_factors)
        cr = _upsample_chroma(cr, y.shape, chroma_factors)
    y = y[:h, :w]
    cb = cb[:h, :w] - 128.0
    cr = cr[:h, :w] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255).astype(jnp.uint8)


def decode_coefs(
    coefs: Sequence[jax.Array],
    qtabs: Sequence[jax.Array],
    h: int,
    w: int,
    samp: Optional[Sequence[Tuple[int, int]]] = None,
) -> jax.Array:
    """Jittable device decode of one image's DCT coefficients.

    ``coefs[ci]``: (bh, bw, M*M) int16 (natural order; M=8 full decode,
    M<8 DCT-scaled decode at M/8 output size), ``qtabs[ci]``: (64,),
    ``samp[ci]``: (h_samp, v_samp) per component (defaults to 4:2:0).
    ``h``/``w`` are the FULL image dims; the output is
    (ceil(h*M/8), ceil(w*M/8), 3) uint8 RGB (grayscale replicated)."""
    m = int(round(coefs[0].shape[-1] ** 0.5))
    h = -(-h * m // 8)
    w = -(-w * m // 8)
    planes = [_component_plane(c, q) for c, q in zip(coefs, qtabs)]
    if len(planes) == 1:
        g = jnp.clip(jnp.round(planes[0][:h, :w]), 0, 255).astype(jnp.uint8)
        return jnp.repeat(g[..., None], 3, axis=-1)
    if samp is None:
        samp = [(2, 2), (1, 1), (1, 1)]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    # upsample each chroma plane by ITS OWN sampling factors — Cb and Cr
    # may legally differ (e.g. samp = [(2,2),(1,1),(2,2)])
    y, cb, cr = planes
    if cb.shape != y.shape:
        cb = _upsample_chroma(
            cb, y.shape, (max_v // samp[1][1], max_h // samp[1][0])
        )
    if cr.shape != y.shape:
        cr = _upsample_chroma(
            cr, y.shape, (max_v // samp[2][1], max_h // samp[2][0])
        )
    return planes_to_rgb(y, cb, cr, h, w)


def host_entropy_decode(data: bytes, coef_limit: int = 0):
    """Host half: Huffman-decode to coefficients. None if unsupported."""
    from vision_tpu.io._codecs import jpeg_coefficients_native

    return jpeg_coefficients_native(data, coef_limit)


def _stacked_geometry(metas) -> bool:
    first = metas[0]
    return all(
        m[0] == first[0] and m[1] == first[1] and m[2] == first[2]
        for m in metas
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _decode_batch_jit(coefs, qtabs, h: int, w: int, samp):
    one = lambda cs, qs: decode_coefs(cs, qs, h, w, samp)
    return jax.vmap(one)(coefs, qtabs)


def decode_jpeg_batch_tpu(
    buffers: Sequence[bytes],
    coef_limit: int = 0,
) -> Optional[jax.Array]:
    """Batch JPEG decode with the IDCT tail on device.

    All images must share geometry (dims + sampling) — the fixed-shape
    batch case of an input pipeline; returns None when geometry differs or
    a stream is unsupported, so callers can fall back to host decode
    (mirroring the reference's nvJPEG -> CPU fallback chain).

    ``coef_limit`` M in 1..7 performs DCT-scaled decode: only the
    top-left MxM coefficients ship to the device ((M/8)^2 of the bytes)
    and the output is the M/8-scale image — the on-device analog of
    ``decode_jpeg(scale=(M, 8))``."""
    decoded = []
    for buf in buffers:
        r = host_entropy_decode(buf, coef_limit)
        if r is None:
            return None
        decoded.append(r)
    metas = [
        (hw, tuple(c.shape for c in cs), tuple(samp))
        for cs, qt, samp, hw in decoded
    ]
    if not _stacked_geometry(metas):
        return None
    h, w = decoded[0][3]
    ncomp = len(decoded[0][0])
    coefs = tuple(
        jnp.asarray(np.stack([d[0][ci] for d in decoded]))
        for ci in range(ncomp)
    )
    qtabs = tuple(
        jnp.asarray(
            np.stack([d[1][ci].astype(np.float32) for d in decoded])
        )
        for ci in range(ncomp)
    )
    samp = tuple(tuple(s) for s in decoded[0][2])
    return _decode_batch_jit(coefs, qtabs, h, w, samp)
