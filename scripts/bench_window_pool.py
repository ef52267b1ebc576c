"""A/B the fused Pallas window-pool kernel vs the XLA gather+einsum path
on the real chip, at the Faster R-CNN box-head and Mask R-CNN mask-head
configs (K=1000 rois, C=256, 832x832 input pyramid).

Run with the inherited env (no PYTHONPATH — it breaks the axon plugin):
    python scripts/bench_window_pool.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.ops.poolers import _window_pool_xla
    from vision_tpu.ops._pallas.window_pool import window_pool_pallas

    rng = np.random.RandomState(0)
    # FRCNN 832x832 pyramid stacked along H: P2..P5 = 208+104+52+26 rows,
    # wmax 208, + 32 pad rows
    heights = [208, 104, 52, 26]
    wmax, c, win = 208, 256, 32
    r_rows = sum(heights) + win

    for dtype, label in [(jnp.bfloat16, "bf16"), (jnp.float32, "f32")]:
        stacked = jnp.asarray(
            rng.randn(r_rows, wmax, c).astype(np.float32)
        ).astype(dtype)
        winy = win + 8
        for k, ph in [(1000, 7), (1000, 14)]:
            row0 = jnp.asarray(
                (rng.randint(0, (r_rows - winy) // 8, k) * 8).astype(np.int32)
            )
            x0 = jnp.asarray(rng.randint(0, wmax - win, k).astype(np.int32))
            w_y = jnp.asarray(rng.rand(k, ph, winy).astype(np.float32))
            w_x = jnp.asarray(rng.rand(k, ph, win).astype(np.float32))

            f_pal = jax.jit(window_pool_pallas)
            f_xla = jax.jit(_window_pool_xla)

            def timeit(f, n=20):
                out = f(stacked, row0, x0, w_y, w_x)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(n):
                    out = f(stacked, row0, x0, w_y, w_x)
                jax.block_until_ready(out)
                return (time.perf_counter() - t0) / n * 1000, out

            ms_p, out_p = timeit(f_pal)
            ms_x, out_x = timeit(f_xla)
            diff = float(
                jnp.max(
                    jnp.abs(
                        out_p.astype(jnp.float32) - out_x.astype(jnp.float32)
                    )
                )
            )
            print(
                f"{label} K={k} PH={ph}: pallas {ms_p:.3f} ms "
                f"({k/ms_p*1000/1000:.0f}k rois/s) vs xla {ms_x:.3f} ms "
                f"({k/ms_x*1000/1000:.0f}k rois/s)  "
                f"speedup {ms_x/ms_p:.2f}x  max|diff| {diff:.2e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
