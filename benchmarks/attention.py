"""Attention-path A/B: Pallas flash kernel vs the einsum path.

Measures ``vision_tpu.ops.attention.scaled_dot_product_attention`` at the
zoo's real attention shapes and prints which path wins — the data behind
the ``_flash_supported`` routing rule (short sequences -> einsum, long
-> flash). Chained-fori single-fetch methodology (bench.py; the axon
tunnel adds ~35ms per dispatch).

Run: ``python benchmarks/attention.py [--iters 20]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (label, B, H, S, D) — B folds batch x windows for windowed attention
SHAPES = [
    ("vit_b16@224 (s=197)", 64, 12, 197, 64),
    ("vit_l16@224 (s=197)", 64, 16, 197, 64),
    ("vit_h14@518 (s=1370)", 8, 16, 1370, 80),
    ("vit_b16@512 (s=1025)", 16, 12, 1025, 64),
]


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.ops import attention

    for label, b, h, s, d in SHAPES:
        rng = np.random.RandomState(0)
        q, k, v = (
            jnp.asarray(rng.rand(b, h, s, d).astype(np.float32)).astype(
                jnp.bfloat16
            )
            for _ in range(3)
        )

        def timed(force):
            os.environ["VISION_TPU_FLASH_ATTENTION"] = force

            @jax.jit
            def loop(q, k, v):
                def body(_, carry):
                    q, k, v = carry
                    out = attention.scaled_dot_product_attention(q, k, v)
                    return q + out * 1e-12, k, v

                q, k, v = jax.lax.fori_loop(0, args.iters, body, (q, k, v))
                return jnp.sum(q[0, 0, 0].astype(jnp.float32))

            try:
                float(loop(q, k, v))  # compile
                t0 = time.perf_counter()
                float(loop(q, k, v))
                return (time.perf_counter() - t0) / args.iters
            except Exception as e:  # noqa: BLE001 — report, keep sweeping
                return f"{type(e).__name__}"
            finally:
                del os.environ["VISION_TPU_FLASH_ATTENTION"]

        dt_f = timed("1")
        dt_e = timed("0")
        if isinstance(dt_f, str) or isinstance(dt_e, str):
            print(f"{label}: flash={dt_f} einsum={dt_e}")
            continue
        winner = "flash" if dt_f < dt_e else "einsum"
        print(
            f"{label}: flash {dt_f * 1e3:.2f} ms, einsum {dt_e * 1e3:.2f} ms"
            f" -> {winner} {max(dt_f, dt_e) / min(dt_f, dt_e):.2f}x"
        )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    main(p.parse_args())
