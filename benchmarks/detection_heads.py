"""Detection-head throughput on device: NMS and RoIAlign boxes/sec
(BASELINE.md north-star metric "NMS+RoIAlign boxes/sec ... on device").

Same honest timing methodology as bench.py: all iterations inside one
on-device ``lax.fori_loop`` with a chained carry, single scalar fetch.

Run: ``python benchmarks/detection_heads.py [--boxes 1024] [--iters 20]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.ops.nms import nms_mask
    from vision_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(0)
    n = args.boxes

    # --- NMS ----------------------------------------------------------
    wh = rng.uniform(10, 80, (n, 2)).astype(np.float32)
    xy = rng.uniform(0, 800, (n, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))

    @jax.jit
    def nms_loop(boxes, scores, iters):
        def body(_, carry):
            b, s = carry
            keep = nms_mask(b, s, 0.5)
            # chain: perturb scores by the keep mask so iterations depend
            s = s + keep.astype(s.dtype) * 1e-6
            return b, s
        b, s = jax.lax.fori_loop(0, iters, body, (boxes, scores))
        return s.sum()

    nms_loop(boxes, scores, 1).block_until_ready()  # compile
    t0 = time.perf_counter()
    float(nms_loop(boxes, scores, args.iters))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"nms {n} boxes: {dt * 1e3:.2f} ms -> {n / dt:,.0f} boxes/s")

    # --- RoIAlign -----------------------------------------------------
    feat = jnp.asarray(rng.rand(1, 50, 50, 256).astype(np.float32))
    k = args.rois
    r_xy = rng.uniform(0, 40, (k, 2)).astype(np.float32)
    r_wh = rng.uniform(2, 10, (k, 2)).astype(np.float32)
    rois = jnp.asarray(
        np.concatenate([np.zeros((k, 1), np.float32), r_xy, r_xy + r_wh], 1)
    )

    @jax.jit
    def roi_loop(feat, rois, iters):
        def body(_, carry):
            f, acc = carry
            out = roi_align(f, rois, (7, 7), 1.0, 2)
            return f + out.mean() * 1e-9, acc + out.sum()
        _, acc = jax.lax.fori_loop(0, iters, body, (feat, jnp.float32(0)))
        return acc

    roi_loop(feat, rois, 1).block_until_ready()
    t0 = time.perf_counter()
    float(roi_loop(feat, rois, args.iters))
    dt = (time.perf_counter() - t0) / args.iters
    print(f"roi_align {k} rois (7x7x256): {dt * 1e3:.2f} ms -> {k / dt:,.0f} rois/s")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--boxes", type=int, default=1024)
    p.add_argument("--rois", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    main(p.parse_args())
