"""Fused Pallas window-pool kernel (ops/_pallas/window_pool.py).

Parity oracle is a direct numpy einsum over each roi's window, so these
tests pin the kernel independently of the XLA windowed path (which is
itself pinned against the dense per-level roi_align in
tests/test_poolers_window.py). The interpreter emulates the manual
window DMAs, so the CPU test uses a deliberately tiny config; the
real-TPU pipeline parity test carries the full FRCNN-shaped config and
runs standalone (pytest -m tpu on a TPU host).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.ops._pallas.window_pool import window_pool_pallas


def _case(rng, k, ph, pw, winy, winx, r_rows, wmax, c, dtype=np.float32):
    stacked = rng.randn(r_rows, wmax, c).astype(np.float32)
    row0 = (rng.randint(0, (r_rows - winy) // 8, k) * 8).astype(np.int32)
    x0 = rng.randint(0, wmax - winx + 1, k).astype(np.int32)
    w_y = rng.rand(k, ph, winy).astype(np.float32)
    w_x = rng.rand(k, pw, winx).astype(np.float32)
    return stacked, row0, x0, w_y, w_x


def _oracle(stacked, row0, x0, w_y, w_x):
    k, _, winy = w_y.shape
    winx = w_x.shape[2]
    return np.stack(
        [
            np.einsum(
                "py,qx,yxc->pqc",
                w_y[i],
                w_x[i],
                stacked[row0[i] : row0[i] + winy, x0[i] : x0[i] + winx],
            )
            for i in range(k)
        ]
    )


def test_kernel_matches_numpy_oracle_interpret():
    """Tiny config (interpret-mode DMA emulation is slow): exercises
    roi-block padding (K=5 -> BK=2 pad), rectangular windows, and the
    double-buffer schedule (3 grid steps)."""
    rng = np.random.RandomState(0)
    stacked, row0, x0, w_y, w_x = _case(
        rng, k=5, ph=2, pw=3, winy=16, winx=8, r_rows=48, wmax=16, c=128
    )
    got = window_pool_pallas(
        jnp.asarray(stacked),
        jnp.asarray(row0),
        jnp.asarray(x0),
        jnp.asarray(w_y),
        jnp.asarray(w_x),
        interpret=True,
    )
    want = _oracle(stacked, row0, x0, w_y, w_x)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_kernel_rejects_unaligned_channels():
    rng = np.random.RandomState(1)
    stacked, row0, x0, w_y, w_x = _case(
        rng, k=2, ph=2, pw=2, winy=16, winx=8, r_rows=32, wmax=16, c=64
    )
    with pytest.raises(ValueError, match="C % 128"):
        window_pool_pallas(
            jnp.asarray(stacked),
            jnp.asarray(row0),
            jnp.asarray(x0),
            jnp.asarray(w_y),
            jnp.asarray(w_x),
            interpret=True,
        )


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a real TPU"
)
class TestOnTPU:
    def test_frcnn_shape_parity_and_grads(self):
        """Full FRCNN-shaped config on the chip: kernel vs the XLA
        windowed contraction, values and feature grads (the custom_vjp
        differentiates via the XLA path)."""
        from vision_tpu.ops.poolers import _window_pool_fused, _window_pool_xla

        rng = np.random.RandomState(0)
        stacked, row0, x0, w_y, w_x = _case(
            rng, k=256, ph=7, pw=7, winy=40, winx=32,
            r_rows=422, wmax=208, c=256,
        )
        args = [
            jnp.asarray(a) for a in (stacked, row0, x0, w_y, w_x)
        ]
        got = window_pool_pallas(*args)
        want = _window_pool_xla(*args)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-3, rtol=5e-4
        )

        def loss_fused(s):
            return jnp.sum(_window_pool_fused(s, *args[1:]) ** 2)

        def loss_xla(s):
            return jnp.sum(_window_pool_xla(s, *args[1:]) ** 2)

        g_f = jax.grad(loss_fused)(args[0])
        g_x = jax.grad(loss_xla)(args[0])
        np.testing.assert_allclose(
            np.asarray(g_f), np.asarray(g_x), atol=5e-2, rtol=5e-3
        )
