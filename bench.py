"""Benchmark: ResNet-50 inference throughput (images/sec/chip).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``

Measurement notes: the axon tunnel adds ~35 ms of fixed round-trip latency
per host->device dispatch+fetch, and ``block_until_ready`` does not reliably
block through it. So the benchmark runs all iterations in ONE on-device
``lax.fori_loop`` whose carry chains iterations (preventing both XLA
loop-invariant hoisting and overlapped timing illusions) and fetches a
single scalar at the end — the honest wall-clock of N sequential forwards.

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
reported against the north-star proxy of 2000 img/s/chip (≈2x A100-class
ResNet-50 bf16 inference at batch 64).
"""

from __future__ import annotations

import json
import time


BASELINE_IMG_PER_SEC = 2000.0  # 2x A100-class proxy (BASELINE.json north star)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.models import resnet50

    batch = 64
    n_iters = 50
    model = resnet50()
    module, variables = model.module, model.variables

    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32
        else x,
        variables,
    )

    @jax.jit
    def bench_fn(variables, x):
        def body(i, acc):
            # acc feeds back into the input: serializes iterations and
            # defeats loop-invariant code motion
            out = module.apply(
                variables, x + (acc * 1e-12).astype(x.dtype), train=False
            )
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, 224, 224, 3), jnp.bfloat16
    )

    float(bench_fn(variables, x))  # compile + warm
    t0 = time.perf_counter()
    float(bench_fn(variables, x))  # scalar fetch forces full execution
    dt = time.perf_counter() - t0

    img_per_sec = batch * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "resnet50_fwd_images_per_sec_per_chip",
                "value": round(img_per_sec, 1),
                "unit": "images/sec",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
