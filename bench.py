"""Benchmark: ResNet-50 end-to-end throughput (decode -> transform ->
forward), images/sec/chip — the BASELINE.json north-star metric — plus
forward-only throughput, detection-head NMS boxes/sec, and a bf16 MFU
estimate, all in ONE JSON line:

``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}``

Backend guard: the axon TPU plugin can fail transiently on init
(round-1 failure: BENCH_r01 rc=1 "Unable to initialize backend 'axon'").
Before importing jax for real work, the backend is probed in bounded-retry
SUBPROCESSES (a failed in-process init poisons jax's backend cache). On
persistent failure a diagnostic JSON line is still printed (value 0.0,
explicit "error" field) so the driver artifact is parseable.

Measurement notes: the axon tunnel adds ~35 ms of fixed round-trip latency
per host->device dispatch+fetch. Device-bound sections therefore run all
iterations in ONE on-device ``lax.fori_loop`` whose carry chains iterations
(preventing loop-invariant hoisting) and fetch a single scalar at the end.
The e2e section instead chains batches through an on-device accumulator and
fetches once after the last batch, so host decode / H2D / compute overlap is
measured honestly without a per-batch sync.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_IMG_PER_SEC = 2000.0  # 2x A100-class proxy (BASELINE.json north star)
V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e peak bf16 FLOP/s (public spec)
RESNET50_FWD_FLOPS = 8.24e9  # 4.12 GMACs * 2, 224x224 (reference meta _ops)


def _probe_backend(max_attempts: int = 3):
    """Probe device init in subprocesses with backoff. Returns
    (ok, backend_or_error)."""
    delays = [0, 10, 30]
    last_err = "unknown"
    for attempt in range(max_attempts):
        if delays[attempt]:
            time.sleep(delays[attempt])
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax, jax.numpy as jnp;"
                    "jnp.zeros(()).block_until_ready();"
                    "print('BACKEND=' + jax.default_backend())",
                ],
                capture_output=True,
                text=True,
                timeout=420,
            )
        except subprocess.TimeoutExpired:
            last_err = f"probe attempt {attempt + 1}: timeout after 420s"
            continue
        if proc.returncode == 0 and "BACKEND=" in proc.stdout:
            backend = proc.stdout.rsplit("BACKEND=", 1)[1].strip()
            return True, backend
        last_err = (
            f"probe attempt {attempt + 1}: rc={proc.returncode} "
            + proc.stderr.strip().splitlines()[-1:][0]
            if proc.stderr.strip()
            else f"probe attempt {attempt + 1}: rc={proc.returncode}"
        )
    return False, last_err


def _bench_forward(module, variables, batch, n_iters):
    """Forward-only img/s: n_iters chained forwards in one fori_loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def bench_fn(variables, x):
        def body(i, acc):
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
    return batch * n_iters / dt


def _make_jpegs(n_unique=32, h=375, w=500, quality=75):
    """Photo-like synthetic JPEGs (smooth structure + sensor-ish noise).

    Pure uniform noise is the worst case for Huffman decode (~2x slower
    than photographic content, no run-length wins) and misrepresents an
    ImageNet-val pipeline; smooth-plus-noise compresses and decodes like a
    real photo."""
    import numpy as np

    from vision_tpu.io.image import encode_jpeg

    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = []
    for k in range(n_unique):
        base = 128 + 60 * np.sin(xx / (13 + k % 7)) * np.cos(yy / (19 + k % 5))
        img = base[..., None] + rng.randn(h, w, 3) * 18
        out.append(
            encode_jpeg(np.clip(img, 0, 255).astype(np.uint8), quality=quality)
        )
    return out


def _bench_e2e(module, variables, batch, n_batches):
    """End-to-end decode -> transform -> forward img/s using the prefetch
    pipeline (vision_tpu/io/prefetch.py). JPEG decode on host threads,
    uint8 H2D, on-device resize/crop/normalize fused into the forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.io.image import decode_jpeg
    from vision_tpu.io.prefetch import prefetch_to_device

    n_unique = 32
    jpegs = _make_jpegs(n_unique)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

    @jax.jit
    def step(variables, raw_u8, acc):
        # on-device preprocessing: resize short side 232 -> center crop 224
        x = raw_u8.astype(jnp.float32)
        x = jax.image.resize(
            x, (x.shape[0], 232, 309, 3), method="bilinear", antialias=True
        )
        top, left = (232 - 224) // 2, (309 - 224) // 2
        x = x[:, top : top + 224, left : left + 224, :]
        x = ((x - mean) / std).astype(jnp.bfloat16)
        out = module.apply(variables, x, train=False)
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

    def host_batches():
        for b in range(n_batches):
            arrs = [
                np.asarray(decode_jpeg(jpegs[(b * batch + i) % n_unique]))
                for i in range(batch)
            ]
            yield np.stack(arrs)

    # warm: compile the step on one batch
    warm = next(iter(host_batches()))
    acc = jnp.float32(0.0)
    acc = step(variables, jnp.asarray(warm), acc)
    float(acc)

    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for raw in prefetch_to_device(host_batches(), depth=2):
        acc = step(variables, raw, acc)
    float(acc)  # single sync at the end
    dt = time.perf_counter() - t0
    return batch * n_batches / dt


def _bench_e2e_tpu_decode(module, variables, batch, n_batches):
    """End-to-end with the TPU-offloaded JPEG path (io/jpeg_tpu.py): host
    does Huffman only, device does dequant+IDCT+upsample+color fused into
    the same program as preprocessing + forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.io._codecs import jpeg_coefficients_native
    from vision_tpu.io.jpeg_tpu import decode_coefs
    from vision_tpu.io.prefetch import prefetch_to_device

    # DCT-scaled offload: ship only the top-left 5x5 coefficients per
    # block ((5/8)^2 = 39% of the bytes) and decode at 5/8 scale on
    # device — short side 235 still covers the 232-resize preset
    coef_m = 5
    n_unique = 32
    jpegs = _make_jpegs(n_unique)
    first = jpeg_coefficients_native(jpegs[0], coef_m)
    if first is None:
        return None
    _, qt, samp_l, (h, w) = first
    samp = tuple(tuple(s) for s in samp_l)
    qtabs = tuple(jnp.asarray(q.astype(np.float32)) for q in qt)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

    @jax.jit
    def step(variables, coef_batch, acc):
        def decode_one(cs):
            return decode_coefs(cs, qtabs, h, w, samp)

        imgs = jax.vmap(decode_one)(coef_batch)
        x = imgs.astype(jnp.float32)
        x = jax.image.resize(
            x, (x.shape[0], 232, 309, 3), method="bilinear", antialias=True
        )
        x = x[:, 4:228, 42:266, :]
        x = ((x - mean) / std).astype(jnp.bfloat16)
        out = module.apply(variables, x, train=False)
        return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

    def host_batches():
        for b in range(n_batches):
            per = [
                jpeg_coefficients_native(
                    jpegs[(b * batch + i) % n_unique], coef_m
                )[0]
                for i in range(batch)
            ]
            yield tuple(
                np.stack([p[ci] for p in per]) for ci in range(len(per[0]))
            )

    warm = next(iter(host_batches()))
    acc = jnp.float32(0.0)
    float(step(variables, jax.tree_util.tree_map(jnp.asarray, warm), acc))

    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for coef_batch in prefetch_to_device(host_batches(), depth=2):
        acc = step(variables, coef_batch, acc)
    float(acc)
    dt = time.perf_counter() - t0
    return batch * n_batches / dt


def _bench_train_step(module, variables, batch, n_iters):
    """ResNet-50 training step (fwd + bwd + SGD-momentum update) img/s —
    the production training number. bf16 compute, f32 loss, n_iters
    chained steps in one fori_loop on device."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, x, labels):
        out = module.apply(
            {"params": params, **rest},
            x,
            train=False,  # frozen stats: isolates compute from BN plumbing
        )
        logp = jax.nn.log_softmax(out.astype(jnp.float32))
        return -jnp.mean(
            jnp.take_along_axis(logp, labels[:, None], axis=1)
        )

    @jax.jit
    def bench_fn(params, x, labels):
        mom0 = jax.tree_util.tree_map(jnp.zeros_like, params)

        def body(i, carry):
            params, mom, acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, x + (acc * 1e-12).astype(x.dtype), labels
            )
            mom = jax.tree_util.tree_map(
                lambda m, g: 0.9 * m + g.astype(m.dtype), mom, grads
            )
            params = jax.tree_util.tree_map(
                lambda p, m: p - 0.01 * m.astype(p.dtype), params, mom
            )
            return params, mom, acc + loss * 1e-6

        _, _, acc = jax.lax.fori_loop(
            0, n_iters, body, (params, mom0, jnp.float32(0.0))
        )
        return acc

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3), jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 1000, (batch,)), jnp.int32)
    float(bench_fn(params, x, labels))  # compile + warm
    t0 = time.perf_counter()
    float(bench_fn(params, x, labels))
    dt = time.perf_counter() - t0
    return batch * n_iters / dt


def _bench_nms(n_boxes=1024, n_iters=20):
    """Detection-head NMS boxes/sec on device (BASELINE boxes/sec metric).

    Returns (boxes/sec on the default path, boxes/sec with the Pallas
    kernel disabled) — on TPU the default path IS the Pallas kernel
    (ops/nms.py:_pallas_nms_enabled), so the pair quantifies its win."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.ops import nms as nms_module
    from vision_tpu.ops.nms import _nms_sorted_chunked, nms_mask

    rng = np.random.RandomState(0)
    wh = rng.uniform(10, 80, (n_boxes, 2)).astype(np.float32)
    xy = rng.uniform(0, 800, (n_boxes, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1))
    scores = jnp.asarray(rng.rand(n_boxes).astype(np.float32))

    def timed(fn):
        @jax.jit
        def loop(boxes, scores):
            def body(_, carry):
                b, s = carry
                keep = fn(b, s)
                return b, s + keep.astype(s.dtype) * 1e-6

            b, s = jax.lax.fori_loop(0, n_iters, body, (boxes, scores))
            return s.sum()

        float(loop(boxes, scores))  # compile
        t0 = time.perf_counter()
        float(loop(boxes, scores))
        dt = (time.perf_counter() - t0) / n_iters
        return n_boxes / dt

    default_bps = timed(lambda b, s: nms_mask(b, s, 0.5))
    xla_bps = timed(
        lambda b, s: _nms_sorted_chunked(b[jnp.argsort(-s, stable=True)], 0.5)
    )
    return default_bps, xla_bps


def _bench_roi_align(n_rois=512, n_iters=20):
    """MultiScale-style RoIAlign rois/sec on device (the other half of the
    BASELINE 'NMS+RoIAlign on device' boxes/sec requirement). P2-like
    feature (1, 200, 272, 256), 7x7 output, sampling_ratio=2 — the
    Faster R-CNN box-head configuration."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(1, 200, 272, 256).astype(np.float32))
    xy = rng.uniform(0, 600, (n_rois, 2)).astype(np.float32)
    wh = rng.uniform(20, 200, (n_rois, 2)).astype(np.float32)
    rois = jnp.asarray(
        np.concatenate([np.zeros((n_rois, 1), np.float32), xy, xy + wh], 1)
    )

    @jax.jit
    def loop(feat, rois):
        def body(_, carry):
            f, r = carry
            out = roi_align(f, r, (7, 7), spatial_scale=0.25, sampling_ratio=2)
            return f + jnp.mean(out) * 1e-12, r

        f, r = jax.lax.fori_loop(0, n_iters, body, (feat, rois))
        return jnp.sum(f[0, 0, 0])

    float(loop(feat, rois))  # compile
    t0 = time.perf_counter()
    float(loop(feat, rois))
    dt = (time.perf_counter() - t0) / n_iters
    return n_rois / dt


def main():
    ok, backend_or_err = _probe_backend()
    if not ok:
        print(
            json.dumps(
                {
                    "metric": "resnet50_e2e_images_per_sec_per_chip",
                    "value": 0.0,
                    "unit": "images/sec",
                    "vs_baseline": 0.0,
                    "error": f"backend init failed after retries: "
                    f"{backend_or_err}",
                }
            )
        )
        return

    import jax
    import jax.numpy as jnp

    from vision_tpu.models import resnet50

    batch = 64
    model = resnet50()
    module, variables = model.module, model.variables
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32
        else x,
        variables,
    )

    fwd_img_s = _bench_forward(module, variables, batch, n_iters=50)
    # batch sweep on v5e: b64 2882 / b128 3101 / b256 2987 img/s
    train_img_s = _bench_train_step(module, variables, 128, n_iters=20)
    e2e_img_s = _bench_e2e(module, variables, batch, n_batches=12)
    e2e_tpu_dec = _bench_e2e_tpu_decode(module, variables, batch, n_batches=12)
    nms_boxes_s, nms_xla_boxes_s = _bench_nms()
    roi_rois_s = _bench_roi_align()

    from vision_tpu.models import vit_b_16

    vit = vit_b_16()
    vit_vars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if isinstance(x, jax.Array) and x.dtype == jnp.float32
        else x,
        vit.variables,
    )
    vit_img_s = _bench_forward(vit.module, vit_vars, batch, n_iters=30)
    # ViT-B/16 = 17.56 GMACs (reference meta _ops) -> 35.1 GFLOPs
    vit_mfu = vit_img_s * 2 * 17.56e9 / V5E_BF16_PEAK_FLOPS

    mfu = fwd_img_s * RESNET50_FWD_FLOPS / V5E_BF16_PEAK_FLOPS
    # fwd+bwd ~= 3x fwd FLOPs (standard MFU accounting for training)
    train_mfu = train_img_s * 3 * RESNET50_FWD_FLOPS / V5E_BF16_PEAK_FLOPS
    best_e2e = max(e2e_img_s, e2e_tpu_dec or 0.0)

    print(
        json.dumps(
            {
                "metric": "resnet50_e2e_images_per_sec_per_chip",
                "value": round(best_e2e, 1),
                "unit": "images/sec",
                "vs_baseline": round(best_e2e / BASELINE_IMG_PER_SEC, 3),
                "extra": {
                    "backend": backend_or_err,
                    "fwd_images_per_sec": round(fwd_img_s, 1),
                    "fwd_bf16_mfu_vs_v5e_peak": round(mfu, 4),
                    "train_step_images_per_sec": round(train_img_s, 1),
                    "train_bf16_mfu_vs_v5e_peak": round(train_mfu, 4),
                    "vit_b16_fwd_images_per_sec": round(vit_img_s, 1),
                    "vit_b16_fwd_bf16_mfu": round(vit_mfu, 4),
                    "e2e_host_decode_images_per_sec": round(e2e_img_s, 1),
                    "e2e_tpu_offload_decode_images_per_sec": round(
                        e2e_tpu_dec, 1
                    )
                    if e2e_tpu_dec
                    else None,
                    "nms_boxes_per_sec": round(nms_boxes_s, 0),
                    "nms_xla_fallback_boxes_per_sec": round(
                        nms_xla_boxes_s, 0
                    ),
                    "roi_align_rois_per_sec": round(roi_rois_s, 0),
                    "host_cpu_cores": os.cpu_count(),
                    "note": "e2e includes host JPEG entropy decode; this "
                    "sandbox host has 1 vCPU shared with the TPU-tunnel "
                    "relay, so the host side bounds e2e (prod v5e hosts "
                    "have ~14 vCPU/chip); fwd/train rows are the "
                    "chip-bound numbers",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
