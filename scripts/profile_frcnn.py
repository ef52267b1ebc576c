"""Per-stage decomposition of the Faster R-CNN eval step on TPU.

Times cumulative prefixes of the pipeline (one jit each) so each stage's
marginal cost is attributable, and A/Bs the windowed vs dense
MultiScaleRoIAlign backend inside the full pipeline.

Run on the real chip (inherited env, no PYTHONPATH):
    python scripts/profile_frcnn.py [--size 832] [--batch 1]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=832)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="s1,s2,s3,full_window,full_dense")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.models import get_model
    from vision_tpu.models._utils import fast_init

    size, batch, n_iters = args.size, args.batch, args.iters
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))

    with fast_init():
        frcnn = get_model("fasterrcnn_resnet50_fpn")
    mod, fvars = frcnn.module, dict(frcnn.variables)

    def timed(fn, label):
        @jax.jit
        def loop(x):
            def body(_, carry):
                x, acc = carry
                out = fn(x)
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(
                    jnp.sum(l.astype(jnp.float32)) * 1e-9 for l in leaves
                )
                return x + acc * 1e-12, acc + s

            return jax.lax.fori_loop(0, n_iters, body, (x, 0.0))[1]

        t0 = time.perf_counter()
        float(loop(img))  # compile
        compile_s = time.perf_counter() - t0
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(img))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ms = best / n_iters * 1000
        print(
            f"{label}: {ms:.2f} ms/step  "
            f"({batch * n_iters / best:.1f} img/s, compile {compile_s:.0f}s)",
            flush=True,
        )
        return ms

    stages = args.stages.split(",")
    image_size = (size, size)

    def s1(x):  # backbone + FPN + RPN head + anchors
        return mod.apply(fvars, x, train=False, method="_features_and_rpn")[1]

    def _s2(m, x):  # + filter_proposals
        feats, obj, dl, anch = m._features_and_rpn(x, train=False)
        return m.rpn.filter_proposals(obj, dl, anch, image_size).boxes

    def s2(x):
        return mod.apply(fvars, x, method=_s2)

    def _s3(m, x):  # + roi pool + box head (no postprocess)
        feats, obj, dl, anch = m._features_and_rpn(x, train=False)
        props = m.rpn.filter_proposals(obj, dl, anch, image_size)
        rois = m._make_rois(props.boxes)
        logits, reg = m._box_branch(feats, rois, image_size)
        return logits

    def s3(x):
        return mod.apply(fvars, x, method=_s3)

    def full(x):
        d = mod.apply(fvars, x, train=False)
        return (d.boxes, d.scores, d.labels)

    import os

    results = {}
    if "s1" in stages:
        results["s1_backbone_rpnhead"] = timed(s1, "s1 backbone+rpnhead")
    if "s2" in stages:
        results["s2_plus_filter"] = timed(s2, "s2 +filter_proposals")
    if "s3" in stages:
        os.environ["VISION_TPU_MSROI"] = "window"
        results["s3_plus_boxbranch_window"] = timed(
            s3, "s3 +pool/boxhead (window)"
        )
    if "full_window" in stages:
        os.environ["VISION_TPU_MSROI"] = "window"
        results["full_window"] = timed(full, "full (window)")
    if "full_dense" in stages:
        os.environ["VISION_TPU_MSROI"] = "dense"
        results["full_dense"] = timed(full, "full (dense)")
    print(results)


if __name__ == "__main__":
    main()
