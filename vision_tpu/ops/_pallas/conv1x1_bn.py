"""Fused 1x1-conv (matmul) + BatchNorm-stats Pallas TPU kernel.

Training-mode BatchNorm costs ~12 ms/step of pure HBM bandwidth on a
ResNet-50 b128 v5e step (measured r4: live-BN 51.5 ms vs frozen-stats
39.7 ms): every BN reads its conv's output once just to reduce
mean/var, and the normalize of the *previous* BN materializes a second
copy of each tensor feeding a 1x1 conv. XLA cannot fuse either pass
into the conv because the conv is an opaque HLO.

This kernel computes, for ``x2d [M, K]`` and ``w [K, N]``::

    xn = relu(x * scale + shift)   # optional prologue: the PREVIOUS
                                   # BN's normalize+ReLU, applied to the
                                   # input tile in VMEM (never
                                   # materialized in HBM)
    y  = xn @ w                    # MXU, f32 accumulation
    s1 = sum_m  y[m, :]            # epilogue: THIS conv's BN stats,
    s2 = sum_m  y[m, :]**2         # accumulated in f32 across M tiles

so a bottleneck's 1x1 convs get their BN statistics for free (the
output tile is still in VMEM when it is reduced) and the expand conv
additionally consumes the 3x3 conv's raw output, folding bn2's
normalize+ReLU into its own read.

Layout: grid ``(N/bn, M/bm)`` with the M axis innermost. The weight
block and the ``[1, bn]`` stats blocks keep the same block index across
the M sweep, so Pallas leaves them resident in VMEM; ``s1/s2`` are
zeroed at ``i == 0`` and flushed to HBM only when the N-tile changes.

Stats semantics match ``flax.linen.BatchNorm`` (``use_fast_variance``):
the sums are taken over the *rounded* output ``y.astype(out_dtype)``
cast back to f32 — exactly the tensor the unfused flax BN would have
reduced — so ``mean = s1/M`` and ``var = max(0, s2/M - mean**2)``
reproduce the unfused statistics to f32 round-off.

Autodiff: ``matmul_stats`` carries a custom VJP (hand-derived; the
backward is plain XLA matmuls + elementwise, which XLA fuses as well as
the unfused path's backward). The cotangents ``ds1/ds2`` arriving from
the downstream normalize expression fold into the effective output
cotangent ``dy + ds1 + 2*y*ds2`` — the standard BN backward terms.

Reference being replaced: ``torchvision`` has no analog (cuDNN exposes
fused conv+BN epilogues in inference only); the spec for the BN math is
``flax.linen.normalization`` and reference semantics
``torchvision/models/resnet.py:Bottleneck`` (conv->bn->relu chains).

MEASURED NEGATIVE RESULT (v5e-1, 2026-08-19, same-session A/B at
ResNet-50 b128 bf16): routing the Bottleneck 1x1 convs through this
kernel (``ResNet(fused_bn=True)``) *lost* throughput end to end —
train_true 1,485.9 img/s fused vs 2,185.6 standard; live-BN train step
1,592.7 vs 2,484.0. The stats-bandwidth saving is real but small next
to what the pallas_call boundaries give up: XLA's 1x1 convs come out of
the conv emitter with input/output fusions and layout freedom, while
every ``matmul_stats`` call pins its operands/results to materialized
[M, K]/[M, N] buffers, and the custom-VJP backward materializes the
f32 ``dy + ds1 + 2*y*ds2`` cotangent instead of fusing it into the
backward matmuls. ``fused_bn`` therefore stays **opt-in** (default
False); the kernel is kept as a correct, tested building block (exact
flax-parity stats + gradients, ``tests/test_fused_bn.py``) for a
future whole-block kernel where the 3x3 conv also lives in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["matmul_stats"]

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_bm(m: int, k: int, bn: int, itemsize: int) -> int | None:
    """Largest row-tile dividing M that fits the VMEM budget.

    Budget: double-buffered x block + resident w block + double-buffered
    out block + f32 stats/prologue overhead.
    """
    for bm in (1024, 896, 784, 768, 512, 448, 392, 256, 224, 128, 112,
               64, 56, 32, 16, 8):
        if m % bm:
            continue
        est = (
            2 * bm * k * itemsize      # x blocks (pipelined)
            + k * bn * itemsize        # w block (resident)
            + 2 * bm * bn * itemsize   # y blocks (pipelined)
            + bm * k * 4               # prologue f32 intermediate
            + 4 * bn * 8               # stats blocks
        )
        if est <= _VMEM_BUDGET:
            return bm
    return None


def _make_kernel(prologue: bool, n_mt: int, out_dtype):
    def kernel(*refs):
        if prologue:
            x_ref, w_ref, sc_ref, sh_ref, y_ref, s1_ref, s2_ref = refs
        else:
            x_ref, w_ref, y_ref, s1_ref, s2_ref = refs
        i = pl.program_id(1)

        xb = x_ref[:]
        if prologue:
            # previous BN's normalize + ReLU on the tile, f32 math, cast
            # back to the compute dtype (bit-matching the materialized
            # unfused path: bf16(relu(y_prev*scale + shift)))
            xb = jax.nn.relu(
                xb.astype(jnp.float32) * sc_ref[:] + sh_ref[:]
            ).astype(x_ref.dtype)

        y32 = jnp.dot(xb, w_ref[:], preferred_element_type=jnp.float32)
        yb = y32.astype(out_dtype)
        y_ref[:] = yb

        # stats of the ROUNDED output (what unfused flax BN reduces)
        yf = yb.astype(jnp.float32)

        @pl.when(i == 0)
        def _():
            s1_ref[:] = jnp.zeros_like(s1_ref)
            s2_ref[:] = jnp.zeros_like(s2_ref)

        s1_ref[:] += jnp.sum(yf, axis=0, keepdims=True)
        s2_ref[:] += jnp.sum(yf * yf, axis=0, keepdims=True)

    return kernel


def _pallas_impl(x, w, scale, shift, interpret=False):
    m, k = x.shape
    n = w.shape[1]
    prologue = scale is not None
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    bn = n if n <= 512 else 512
    if n % bn:
        return None
    bm = _pick_bm(m, k, bn, jnp.dtype(x.dtype).itemsize)
    if bm is None:
        return None
    n_mt, n_nt = m // bm, n // bn

    in_specs = [
        pl.BlockSpec((bm, k), lambda j, i: (i, 0)),
        pl.BlockSpec((k, bn), lambda j, i: (0, j)),
    ]
    args = [x, w]
    if prologue:
        in_specs += [
            pl.BlockSpec((1, k), lambda j, i: (0, 0)),
            pl.BlockSpec((1, k), lambda j, i: (0, 0)),
        ]
        args += [
            scale.astype(jnp.float32).reshape(1, k),
            shift.astype(jnp.float32).reshape(1, k),
        ]

    flops = 2 * m * k * n
    isz = jnp.dtype(x.dtype).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    y, s1, s2 = pl.pallas_call(
        _make_kernel(prologue, n_mt, out_dtype),
        grid=(n_nt, n_mt),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), out_dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=m * k * isz + n_nt * k * n * isz + m * n * osz,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return y, s1[0], s2[0]


def _reference_impl(x, w, scale, shift):
    """jnp reference with the kernel's exact numerics (non-TPU fallback
    and the oracle the kernel is tested against)."""
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    xb = x
    if scale is not None:
        xb = jax.nn.relu(
            x.astype(jnp.float32) * scale.astype(jnp.float32)
            + shift.astype(jnp.float32)
        ).astype(x.dtype)
    y = jnp.dot(xb, w, preferred_element_type=jnp.float32).astype(out_dtype)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def _dispatch(x, w, scale, shift, interpret):
    if interpret or jax.default_backend() == "tpu":
        out = _pallas_impl(x, w, scale, shift, interpret=interpret)
        if out is not None:
            return out
    return _reference_impl(x, w, scale, shift)


# ---------------------------------------------------------------- vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mm_np(x, w, interpret=False):
    return _dispatch(x, w, None, None, interpret)


def _mm_np_fwd(x, w, interpret=False):
    out = _dispatch(x, w, None, None, interpret)
    return out, (x, w, out[0])


def _mm_np_bwd(interpret, res, cts):
    x, w, y = res
    dy, ds1, ds2 = cts
    dyf = (
        dy.astype(jnp.float32)
        + ds1[None, :]
        + 2.0 * y.astype(jnp.float32) * ds2[None, :]
    )
    dy_c = dyf.astype(x.dtype)
    dx = jnp.dot(dy_c, w.T, preferred_element_type=jnp.float32).astype(
        x.dtype
    )
    dw = jnp.dot(x.T, dy_c, preferred_element_type=jnp.float32).astype(
        w.dtype
    )
    return dx, dw


_mm_np.defvjp(_mm_np_fwd, _mm_np_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _mm_p(x, w, scale, shift, interpret=False):
    return _dispatch(x, w, scale, shift, interpret)


def _mm_p_fwd(x, w, scale, shift, interpret=False):
    out = _dispatch(x, w, scale, shift, interpret)
    return out, (x, w, scale, shift, out[0])


def _mm_p_bwd(interpret, res, cts):
    x, w, scale, shift, y = res
    dy, ds1, ds2 = cts
    dyf = (
        dy.astype(jnp.float32)
        + ds1[None, :]
        + 2.0 * y.astype(jnp.float32) * ds2[None, :]
    )
    dy_c = dyf.astype(x.dtype)
    z = (
        x.astype(jnp.float32) * scale.astype(jnp.float32)
        + shift.astype(jnp.float32)
    )
    xn = jax.nn.relu(z).astype(x.dtype)
    dxn = jnp.dot(dy_c, w.T, preferred_element_type=jnp.float32)
    dw = jnp.dot(xn.T, dy_c, preferred_element_type=jnp.float32).astype(
        w.dtype
    )
    dz = dxn * (z > 0)
    dx = (dz * scale.astype(jnp.float32)).astype(x.dtype)
    dscale = jnp.sum(dz * x.astype(jnp.float32), axis=0).astype(scale.dtype)
    dshift = jnp.sum(dz, axis=0).astype(shift.dtype)
    return dx, dw, dscale, dshift


_mm_p.defvjp(_mm_p_fwd, _mm_p_bwd)


def matmul_stats(x, w, scale=None, shift=None, *, interpret=False):
    """``y = (relu(x*scale+shift) if scale else x) @ w`` plus per-column
    f32 ``sum`` / ``sum-of-squares`` of ``y`` — the BN-stats epilogue.

    Args:
      x: ``[M, K]`` activations (bf16 or f32).
      w: ``[K, N]`` weights (the 1x1 conv kernel reshaped).
      scale/shift: optional ``[K]`` f32 per-channel affine applied with a
        ReLU before the matmul (the previous BN's normalize, folded).
      interpret: run the Pallas kernel in interpreter mode (tests).

    Returns:
      ``(y [M, N], s1 [N] f32, s2 [N] f32)``.
    """
    if scale is None:
        return _mm_np(x, w, interpret)
    return _mm_p(x, w, scale, shift, interpret)
