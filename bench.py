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


def _bench_forward(module, variables, batch, n_iters, input_shape=(224, 224, 3)):
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
            return acc + sum(
                jnp.sum(leaf.astype(jnp.float32)) * 1e-9
                for leaf in jax.tree_util.tree_leaves(out)
            )

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, *input_shape), jnp.bfloat16
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


def _bench_train_live_bn(module, variables, batch, n_iters):
    """Live-BN train step img/s WITHOUT augmentation: train=True (batch
    stats reductions + their backward), SGD-momentum + EMA, fixed input.
    This is the honest compute ceiling for ``train_true`` — the
    frozen-stats ``_bench_train_step`` row underprices real training by
    the BN plumbing (~12 ms/step at b128 on v5e)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(params, stats, x, labels):
        out, updates = module.apply(
            {"params": params, "batch_stats": stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(out.astype(jnp.float32))
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
        return loss, updates["batch_stats"]

    @jax.jit
    def bench_fn(params, stats, x, labels):
        mom0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        ema0 = jax.tree_util.tree_map(lambda p: p + 0.0, params)

        def body(i, carry):
            params, stats, mom, ema, acc = carry
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, x + (acc * 1e-12).astype(x.dtype), labels)
            stats = jax.tree_util.tree_map(
                lambda o, n: n.astype(o.dtype), stats, new_stats
            )
            mom = jax.tree_util.tree_map(
                lambda m, g: 0.9 * m + g.astype(m.dtype), mom, grads
            )
            params = jax.tree_util.tree_map(
                lambda p, m: p - 0.01 * m.astype(p.dtype), params, mom
            )
            ema = jax.tree_util.tree_map(
                lambda e, p: e * 0.9999 + p.astype(e.dtype) * 1e-4,
                ema, params,
            )
            return params, stats, mom, ema, acc + loss * 1e-6

        _, _, _, ema, acc = jax.lax.fori_loop(
            0, n_iters, body, (params, stats, mom0, ema0, jnp.float32(0.0))
        )
        return acc + (
            jax.tree_util.tree_leaves(ema)[0].astype(jnp.float32).sum()
            * 1e-20
        )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, 224, 224, 3), jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 1000, (batch,)), jnp.int32)
    float(bench_fn(params, batch_stats, x, labels))  # compile + warm
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        float(bench_fn(params, batch_stats, x, labels))
        best = min(best, time.perf_counter() - t0)
    return batch * n_iters / best


def _bench_train_true(module, variables, batch, n_iters):
    """Production training step img/s: the fused device-augmentation
    pipeline (RandomResizedCrop + flip + RandAugment + normalize +
    RandomErasing — the ``--device-augment --auto-augment ra`` path) AND
    the real train step (``train=True``: live BatchNorm batch_stats
    update, fwd + bwd + SGD-momentum) compiled into ONE program, n_iters
    chained in one on-device fori_loop.

    This is the number the round-2 frozen-stats bench could not give:
    augment and train previously benched separately (3.5k / 3.2k img/s;
    serial composition ~1.7k) — here XLA compiles them into one program.

    r4 findings (decomposition measured on chip, b128):
    * live-BN train step alone = 51.5 ms (2,484 img/s) vs the frozen-BN
      "compute-only" row's 39.7 ms — train-mode BatchNorm's stats
      reductions + backward terms cost ~12 ms/step. The honest ceiling
      for THIS metric is therefore the live-BN row
      (``train_live_bn_compute_images_per_sec``), not the frozen-BN one.
    * augment now rides the MXU: RandomResizedCrop+flip fused into one
      two-matmul batched resample (was 5.4 ms of vmapped gathers) and
      the RandAugment color stage bucketed to ~N/14 gathered samples
      per branch (engine 16.7 -> 8.6 ms) — full pipeline ~11 ms.
    * double-buffering augment(i+1) against train(i) was REMOVED: TPU
      executes one program's ops serially, so it bought no overlap and
      the extra [N,224,224,3] f32 carry cost ~1.9 ms/step (A/B: 2,094
      vs 2,033 img/s).
    The EMA shadow update runs IN the timed loop (r3 weak #5).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.transforms import v2 as T

    rrc = T.RandomResizedCrop(224, antialias=True)
    ra = T.RandAugment(magnitude=9)  # batched TPU engine (no vmapped switch)
    post = T.Compose(
        [
            T.ToDtype(jnp.float32, scale=True),
            T.Normalize(mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]),
            T.RandomErasing(p=0.1),
        ]
    )

    def pipeline_batch(raw_u8, key):
        k1, k2, k3 = jax.random.split(key, 3)
        # crop + flip fused into one two-matmul MXU resample (r4)
        imgs = rrc.batched(raw_u8, k1, flip_p=0.5)
        imgs = ra.batched(imgs, k2)
        pkeys = jax.random.split(k3, raw_u8.shape[0])
        return jax.vmap(lambda im, k: post(im, key=k))(imgs, pkeys)

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def loss_fn(params, batch_stats, x, labels):
        out, updates = module.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        logp = jax.nn.log_softmax(out.astype(jnp.float32))
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
        return loss, updates["batch_stats"]

    @jax.jit
    def bench_fn(params, batch_stats, raw_u8, labels, key):
        mom0 = jax.tree_util.tree_map(jnp.zeros_like, params)
        ema0 = jax.tree_util.tree_map(lambda p: p + 0.0, params)

        def body(i, carry):
            params, stats, mom, ema, acc, key = carry
            key, kb = jax.random.split(key)
            imgs = pipeline_batch(raw_u8, kb)
            x = (imgs + (acc * 1e-12)).astype(jnp.bfloat16)
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats, x, labels)
            # flax BatchNorm emits f32 stat updates; match the carry dtype
            new_stats = jax.tree_util.tree_map(
                lambda n, o: n.astype(o.dtype), new_stats, stats
            )
            mom = jax.tree_util.tree_map(
                lambda m, g: 0.9 * m + g.astype(m.dtype), mom, grads
            )
            params = jax.tree_util.tree_map(
                lambda p, m: p - 0.01 * m.astype(p.dtype), params, mom
            )
            ema = jax.tree_util.tree_map(
                lambda e, p: e * 0.9999 + p.astype(e.dtype) * 1e-4,
                ema, params,
            )
            return params, new_stats, mom, ema, acc + loss * 1e-6, key

        _, _, _, ema, acc, _ = jax.lax.fori_loop(
            0,
            n_iters,
            body,
            (params, batch_stats, mom0, ema0, jnp.float32(0.0), key),
        )
        # consume the EMA shadow so XLA cannot dead-code it out of the loop
        ema_probe = jax.tree_util.tree_leaves(ema)[0].astype(jnp.float32)
        return acc + ema_probe.sum() * 1e-20

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 256, (batch, 256, 256, 3)), jnp.uint8)
    labels = jnp.asarray(rng.randint(0, 1000, (batch,)), jnp.int32)
    key = jax.random.PRNGKey(0)
    float(bench_fn(params, batch_stats, raw, labels, key))  # compile + warm
    t0 = time.perf_counter()
    float(bench_fn(params, batch_stats, raw, labels, key))
    dt = time.perf_counter() - t0
    return batch * n_iters / dt


def _bench_e2e_device_input(module, variables, batch, n_iters):
    """Chip-bound e2e ceiling: device-resident decoded uint8 frames
    (375x500, the e2e shape) -> on-device resize/center-crop/normalize ->
    forward, n_iters chained in one fori_loop. Decode excluded — this is
    what a host that keeps up with the chip would sustain, recorded so the
    host-bound headline number has a measured chip-side counterpart."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0

    @jax.jit
    def bench_fn(variables, raw_u8):
        def body(i, acc):
            x = raw_u8.astype(jnp.float32) + (acc * 1e-12)
            x = jax.image.resize(
                x, (x.shape[0], 232, 309, 3), method="bilinear", antialias=True
            )
            x = x[:, 4:228, 42:266, :]
            x = ((x - mean) / std).astype(jnp.bfloat16)
            out = module.apply(variables, x, train=False)
            return acc + jnp.sum(out.astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 256, (batch, 375, 500, 3)), jnp.uint8)
    float(bench_fn(variables, raw))  # compile + warm
    t0 = time.perf_counter()
    float(bench_fn(variables, raw))
    dt = time.perf_counter() - t0
    return batch * n_iters / dt


def _bench_host_decode_cost(n_images=64):
    """Host-side JPEG cost, ms/image on ONE core: (full libjpeg decode,
    Huffman-only coefficient pass). These are the inputs to the prod-host
    projection: a v5e host has ~14 vCPU/chip, so host capacity ~=
    n_worker_cores / (ms_per_image / 1000)."""
    import numpy as np

    from vision_tpu.io._codecs import jpeg_coefficients_native
    from vision_tpu.io.image import decode_jpeg

    jpegs = _make_jpegs(16)
    # warm (dlopen, code paths)
    np.asarray(decode_jpeg(jpegs[0]))
    jpeg_coefficients_native(jpegs[0], 5)

    t0 = time.perf_counter()
    for i in range(n_images):
        np.asarray(decode_jpeg(jpegs[i % len(jpegs)]))
    full_ms = (time.perf_counter() - t0) / n_images * 1e3

    t0 = time.perf_counter()
    for i in range(n_images):
        jpeg_coefficients_native(jpegs[i % len(jpegs)], 5)
    huff_ms = (time.perf_counter() - t0) / n_images * 1e3
    return full_ms, huff_ms


def _bench_nms(n_boxes=1024, n_iters=None):
    """Detection-head NMS boxes/sec on device (BASELINE boxes/sec metric).

    Returns (boxes/sec on the default path, boxes/sec with the Pallas
    kernel disabled) — on TPU the default path IS the Pallas bitmask
    kernel (ops/nms.py:_pallas_nms_enabled), so the pair quantifies it.

    Methodology (changed r4): best-of-3 timings with enough fori
    iterations to amortize dispatch — the r2/r3 numbers (iters<=20,
    single timing) were dominated by the ~0.3-0.5 ms per-call dispatch
    through the TPU tunnel and understated every kernel ~5x; a trivial
    copy kernel measured the same per-call cost as full NMS at n<=4k."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.ops.nms import _nms_sorted_chunked, nms_mask

    if n_iters is None:
        n_iters = max(5, min(100, 100000 // n_boxes))
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
        best = min(
            _timed_call(lambda: float(loop(boxes, scores)))
            for _ in range(3)
        )
        return n_boxes * n_iters / best

    default_bps = timed(lambda b, s: nms_mask(b, s, 0.5))
    xla_bps = timed(
        lambda b, s: _nms_sorted_chunked(b[jnp.argsort(-s, stable=True)], 0.5)
    )
    return default_bps, xla_bps


def _timed_call(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _bench_nms_sweep(sizes=(256, 1024, 4096, 20000)):
    """NMS boxes/s at detection-relevant sizes (RetinaNet feeds ~1k/level
    x 5 levels pre-merge; the reference switches batched-NMS strategy at
    4k/100k boxes, ``ops/boxes.py:86``). Pallas vs XLA-chunked at each
    size; a size whose kernel fails to fit (SMEM bound) reports null."""
    sweep = {}
    for n in sizes:
        try:
            pallas_bps, xla_bps = _bench_nms(n_boxes=n)
            sweep[str(n)] = {
                "pallas": round(pallas_bps, 0),
                "xla": round(xla_bps, 0),
            }
        except Exception as e:  # noqa: BLE001 — record, don't kill the bench
            sweep[str(n)] = {"error": type(e).__name__}
    return sweep


def _bench_roi_align(n_rois=512, n_iters=20):
    """MultiScale-style RoIAlign rois/sec on device (the other half of the
    BASELINE 'NMS+RoIAlign on device' boxes/sec requirement). P2-like
    feature (1, 200, 272, 256), 7x7 output, sampling_ratio=2 — the
    Faster R-CNN box-head configuration.

    Four rows: the gather path (round-2 baseline), the MXU separable-
    matmul path at f32 with the r4 default precision="high" (bf16x3 —
    the training path, parity ~1e-6), MXU f32/"highest" (bf16x6, exact-
    parity opt-in), and MXU at bf16/"default" (the inference hot path
    `roi_align` dispatches to on TPU).

    Methodology (changed r4): best-of-3 — the earlier single-timing rows
    (72.3k f32) were dominated by per-call dispatch through the TPU
    tunnel; honest amortized numbers are ~4.5x higher across all paths
    (VERDICT r3 weak #4 was a measurement artifact, not a kernel gap)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.ops.roi_align import _roi_align_gather, roi_align_mxu

    rng = np.random.RandomState(0)
    feat32 = jnp.asarray(rng.rand(1, 200, 272, 256).astype(np.float32))
    feat16 = feat32.astype(jnp.bfloat16)
    xy = rng.uniform(0, 600, (n_rois, 2)).astype(np.float32)
    wh = rng.uniform(20, 200, (n_rois, 2)).astype(np.float32)
    rois = jnp.asarray(
        np.concatenate([np.zeros((n_rois, 1), np.float32), xy, xy + wh], 1)
    )

    def timed(fn, feat):
        @jax.jit
        def loop(feat, rois):
            def body(_, carry):
                f, r = carry
                out = fn(f, r)
                return f + (jnp.mean(out) * 1e-12).astype(f.dtype), r

            f, r = jax.lax.fori_loop(0, n_iters, body, (feat, rois))
            return jnp.sum(f[0, 0, 0].astype(jnp.float32))

        float(loop(feat, rois))  # compile
        best = min(
            _timed_call(lambda: float(loop(feat, rois))) for _ in range(3)
        )
        return n_rois * n_iters / best

    kw = dict(spatial_scale=0.25, sampling_ratio=2)
    gather = timed(
        lambda f, r: _roi_align_gather(f, r, (7, 7), **kw), feat32
    )
    mxu_f32 = timed(lambda f, r: roi_align_mxu(f, r, (7, 7), **kw), feat32)
    mxu_f32_exact = timed(
        lambda f, r: roi_align_mxu(f, r, (7, 7), precision="highest", **kw),
        feat32,
    )
    mxu_bf16 = timed(lambda f, r: roi_align_mxu(f, r, (7, 7), **kw), feat16)

    # Pallas fused-separable kernel (VERDICT r4: shipped untimed) — the
    # declared fix for the HBM-bound einsum intermediate; measured here
    # in the same harness so the A/B is like-for-like.
    from vision_tpu.ops._pallas.roi_align import roi_align_pallas

    def _try_pallas(feat):
        try:
            return timed(
                lambda f, r: roi_align_pallas(f, r, (7, 7), **kw), feat
            )
        except Exception:  # noqa: BLE001 — scoped-vmem limits are config-dependent
            return 0.0

    pallas_f32 = _try_pallas(feat32)
    pallas_bf16 = _try_pallas(feat16)
    return gather, mxu_f32, mxu_f32_exact, mxu_bf16, pallas_f32, pallas_bf16


def _bench_zoo_fwd():
    """fwd img/s + bf16 MFU for four more zoo families (VERDICT r4 item
    8): EfficientNet-V2-S (fused-MBConv, 384px eval size), ConvNeXt-T
    (7x7 depthwise + LN), Swin-T (windowed attention -> flash path),
    MViT-V2-S (video, pooled attention). GMACs per sample are the
    reference weights-meta ``_ops`` values at each model's eval size
    (``models/_meta_extra.py``)."""
    import jax
    import jax.numpy as jnp

    from vision_tpu.models import get_model
    from vision_tpu.models._utils import fast_init

    configs = [
        ("efficientnet_v2_s", 32, (384, 384, 3), 8.366),
        ("convnext_tiny", 64, (224, 224, 3), 4.456),
        ("swin_t", 64, (224, 224, 3), 4.491),
        ("mvit_v2_s", 4, (16, 224, 224, 3), 64.224),
        # segmentation at the reference's 520x520 _ops size
        ("deeplabv3_resnet50", 4, (520, 520, 3), 178.722),
        # video _ops are computed at T=16 (reference
        # test/common_extended_utils.py:get_dims hard-codes 16 frames)
        ("swin3d_t", 4, (16, 224, 224, 3), 43.882),
    ]
    out = {}
    for name, batch, shape, gmacs in configs:
        try:
            with fast_init():
                m = get_model(name)
            variables = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if isinstance(x, jax.Array) and x.dtype == jnp.float32
                else x,
                m.variables,
            )
            img_s = _bench_forward(
                m.module, variables, batch, n_iters=20, input_shape=shape
            )
            out[name] = {
                "fwd_images_per_sec": round(img_s, 1),
                "fwd_bf16_mfu": round(
                    img_s * 2 * gmacs * 1e9 / V5E_BF16_PEAK_FLOPS, 4
                ),
                "batch": batch,
            }
            del m, variables
        except Exception as e:  # noqa: BLE001 — record, don't kill the bench
            out[name] = {"error": f"{type(e).__name__}: {e}"}

    # RAFT takes two frames; reference _ops (211.007 GMACs) is computed at
    # 512x512 with the full 12 flow updates (test/common_extended_utils.py).
    try:
        import numpy as np

        with fast_init():
            m = get_model("raft_large")
        mod, mvars = m.module, m.variables
        batch, n_iters, gmacs = 2, 10, 211.007
        rng = np.random.RandomState(0)
        i1 = jnp.asarray(rng.rand(batch, 512, 512, 3) * 2 - 1, jnp.bfloat16)
        i2 = jnp.asarray(rng.rand(batch, 512, 512, 3) * 2 - 1, jnp.bfloat16)
        v16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jax.Array) and x.dtype == jnp.float32
            else x,
            mvars,
        )

        @jax.jit
        def raft_loop(variables, a, b):
            def body(i, acc):
                flows = mod.apply(
                    variables, a + (acc * 1e-12).astype(a.dtype), b
                )
                return acc + jnp.sum(flows[-1].astype(jnp.float32)) * 1e-9

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        float(raft_loop(v16, i1, i2))  # compile + warm
        t0 = time.perf_counter()
        float(raft_loop(v16, i1, i2))
        dt = time.perf_counter() - t0
        img_s = batch * n_iters / dt
        out["raft_large"] = {
            "fwd_images_per_sec": round(img_s, 1),
            "fwd_bf16_mfu": round(
                img_s * 2 * gmacs * 1e9 / V5E_BF16_PEAK_FLOPS, 4
            ),
            "batch": batch,
        }
        del m, mvars, v16
    except Exception as e:  # noqa: BLE001
        out["raft_large"] = {"error": f"{type(e).__name__}: {e}"}
    return out


def _bench_detection_e2e(size=832, n_iters=10):
    """Whole-detection-model eval images/sec on device (VERDICT r3 item 1;
    BASELINE configs 3-5): backbone -> FPN -> heads -> decode ->
    batched-NMS -> top-k, ONE jit per model at a static bucketed canvas
    (reference val short-side 800 -> 832 = 64-aligned bucket).

    Rows per model: full-pipeline images/s and a backbone+heads-only
    images/s (same jit minus proposal/postproc), so the postproc share is
    attributable. Mask R-CNN includes the mask branch + paste_masks for
    the top detections. Random weights (fast_init) — identical FLOPs to
    converted checkpoints. A100-class torchvision expectations for
    context: ~40-70 img/s RetinaNet, ~25-40 Faster R-CNN (batch 1, fp32).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vision_tpu.models import get_model
    from vision_tpu.models._utils import fast_init
    from vision_tpu.models.detection.roi_heads import paste_masks_in_image

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    img16 = img.astype(jnp.bfloat16)

    def amp_vars(tree):
        """--amp eval variables: float params/stats -> bf16. Box-coordinate
        math stays f32 regardless via the coder/NMS f32 entry casts (the
        reference's autocast policy: convs reduced-precision, box ops
        f32-registered in csrc/ops/autocast/)."""
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            tree,
        )

    def timed_on(fn, x, batch):
        @jax.jit
        def loop(x):
            def body(_, carry):
                x, acc = carry
                out = fn(x)
                leaves = jax.tree_util.tree_leaves(out)
                s = sum(jnp.sum(l.astype(jnp.float32)) * 1e-9 for l in leaves)
                # feed acc back into the input: a loop-carried dependency so
                # while-loop invariant code motion cannot hoist fn out of
                # the loop (same guard as _bench_forward)
                return x + acc * 1e-12, acc + s
            return jax.lax.fori_loop(0, n_iters, body, (x, 0.0))[1]

        float(loop(x))  # compile
        best = min(_timed_call(lambda: float(loop(x))) for _ in range(3))
        return batch * n_iters / best  # images/sec

    def timed(fn):
        return timed_on(fn, img, 1)

    out = {}

    with fast_init():
        retina = get_model("retinanet_resnet50_fpn")
    rmod, rvars = retina.module, dict(retina.variables)

    def retina_full(x):
        heads = rmod.apply(rvars, x, train=False)
        d = rmod.apply(
            rvars, *heads, (size, size), method="postprocess_detections"
        )
        return (d.boxes, d.scores, d.labels)

    rvars16 = amp_vars(rvars)

    def retina_amp(x):
        heads = rmod.apply(rvars16, x, train=False)
        d = rmod.apply(
            rvars16, *heads, (size, size), method="postprocess_detections"
        )
        return (d.boxes, d.scores, d.labels)

    out["retinanet_resnet50_fpn"] = {
        "e2e_images_per_sec": round(timed(retina_full), 2),
        # --amp eval (engine.py compute_dtype=bf16): convs bf16, box math
        # f32 via the coder/NMS entry casts
        "e2e_amp_images_per_sec": round(timed_on(retina_amp, img16, 1), 2),
        "heads_only_images_per_sec": round(
            timed(lambda x: rmod.apply(rvars, x, train=False)[0]), 2
        ),
        # batched inference (VERDICT r4 item 3): b1 understates a TPU
        "e2e_b4_images_per_sec": round(
            timed_on(
                retina_full,
                jnp.asarray(rng.rand(4, size, size, 3).astype(np.float32)),
                4,
            ),
            2,
        ),
    }

    # RetinaNet TRAIN step (loss + backward, static padded targets) — the
    # reference's detection recipes are training workloads
    # (references/detection/train.py); b4 at the same canvas.
    tb = 4
    timg = jnp.asarray(rng.rand(tb, size, size, 3).astype(np.float32))
    tboxes = jnp.asarray(
        np.stack(
            [
                np.stack(
                    [
                        np.array(
                            [x0, y0, x0 + 80.0, y0 + 60.0], np.float32
                        )
                        for x0, y0 in zip(
                            rng.rand(8) * (size - 100),
                            rng.rand(8) * (size - 100),
                        )
                    ]
                )
                for _ in range(tb)
            ]
        )
    )
    tlabels = jnp.asarray(rng.randint(1, 91, size=(tb, 8)).astype(np.int32))
    tvalid = jnp.ones((tb, 8), bool)
    rparams = rvars["params"]
    rrest = {k: v for k, v in rvars.items() if k != "params"}

    def retina_train_loss(p, x):
        heads = rmod.apply({"params": p, **rrest}, x, train=True)
        losses = rmod.apply(
            {"params": p, **rrest}, *heads, tboxes, tlabels, tvalid,
            method="compute_loss",
        )
        return sum(jnp.sum(v) for v in losses.values())

    grad_fn = jax.value_and_grad(retina_train_loss)

    def retina_train_step(x):
        loss, grads = grad_fn(rparams, x)
        # SGD-shaped consumer so the grads are live outputs
        gnorm = sum(
            jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.tree_util.tree_leaves(grads)
        )
        return loss + gnorm * 1e-12

    out["retinanet_resnet50_fpn"]["train_step_b4_images_per_sec"] = round(
        timed_on(retina_train_step, timg, tb), 2
    )
    del retina, rvars, rvars16, rparams, rrest

    with fast_init():
        frcnn = get_model("fasterrcnn_resnet50_fpn")
    fmod, fvars = frcnn.module, dict(frcnn.variables)

    def frcnn_full(x):
        d = fmod.apply(fvars, x, train=False)
        return (d.boxes, d.scores, d.labels)

    image_size = (size, size)

    def _s2(m, x):  # backbone + rpn head + filter_proposals
        feats, obj, dl, anch = m._features_and_rpn(x, train=False)
        return m.rpn.filter_proposals(obj, dl, anch, image_size).boxes

    def _s3(m, x):  # + roi pool + box head (no postprocess)
        feats, obj, dl, anch = m._features_and_rpn(x, train=False)
        props = m.rpn.filter_proposals(obj, dl, anch, image_size)
        rois = m._make_rois(props.boxes)
        return m._box_branch(feats, rois, image_size)[0]

    fvars16 = amp_vars(fvars)

    def frcnn_amp(x):
        d = fmod.apply(fvars16, x, train=False)
        return (d.boxes, d.scores, d.labels)

    out["fasterrcnn_resnet50_fpn"] = {
        "e2e_images_per_sec": round(timed(frcnn_full), 2),
        "e2e_amp_images_per_sec": round(timed_on(frcnn_amp, img16, 1), 2),
        # cumulative-prefix decomposition (VERDICT r4 item 3): marginal
        # cost of each stage = delta between consecutive rows
        "backbone_images_per_sec": round(
            timed(
                lambda x: fmod.apply(
                    fvars, x, train=False, method="_features_and_rpn"
                )[1]
            ),
            2,
        ),
        "plus_filter_proposals_images_per_sec": round(
            timed(lambda x: fmod.apply(fvars, x, method=_s2)), 2
        ),
        "plus_roipool_boxhead_images_per_sec": round(
            timed(lambda x: fmod.apply(fvars, x, method=_s3)), 2
        ),
        "e2e_b4_images_per_sec": round(
            timed_on(
                frcnn_full,
                jnp.asarray(rng.rand(4, size, size, 3).astype(np.float32)),
                4,
            ),
            2,
        ),
    }
    del frcnn, fvars, fvars16

    with fast_init():
        mask = get_model("maskrcnn_resnet50_fpn")
    mmod, mvars = mask.module, dict(mask.variables)

    def mask_full(x):
        d = mmod.apply(mvars, x, train=False)
        pasted = paste_masks_in_image(
            d.masks[0], d.boxes[0], size, size
        )
        return (d.boxes, d.scores, pasted)

    mvars16 = amp_vars(mvars)

    def mask_amp(x):
        d = mmod.apply(mvars16, x, train=False)
        pasted = paste_masks_in_image(
            d.masks[0].astype(jnp.float32), d.boxes[0], size, size
        )
        return (d.boxes, d.scores, pasted)

    out["maskrcnn_resnet50_fpn_paste"] = {
        "e2e_images_per_sec": round(timed(mask_full), 2),
        "e2e_amp_images_per_sec": round(timed_on(mask_amp, img16, 1), 2),
    }
    del mask, mvars, mvars16

    # BASELINE config #5: the deform-conv backbone variant as a whole
    # pipeline (deformable 3x3s in C3-C5 -> im2col gather + grouped
    # einsum per block). Opt-in: its XLA compile alone takes ~12.5 min
    # at 832x832 on a 1-vCPU host, which would risk the driver's bench
    # budget for one row. NOTE: the "23.7 img/s" figure previously
    # recorded here was measured BEFORE the r4 loop-hoisting timing fix
    # (commit 3e8b7a1) and is an artifact; treat the row as unmeasured
    # until VISION_TPU_BENCH_DEFORM=1 is re-run post-fix.
    if os.environ.get("VISION_TPU_BENCH_DEFORM"):
        with fast_init():
            maskd = get_model("maskrcnn_resnet50_fpn_deform")
        dmod, dvars = maskd.module, dict(maskd.variables)

        def maskd_full(x):
            d = dmod.apply(dvars, x, train=False)
            pasted = paste_masks_in_image(d.masks[0], d.boxes[0], size, size)
            return (d.boxes, d.scores, pasted)

        out["maskrcnn_resnet50_fpn_deform_paste"] = {
            "e2e_images_per_sec": round(timed(maskd_full), 2),
        }
    return out


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

    # Persistent compilation cache: detection/train programs at 832x832
    # compile for minutes each through the TPU tunnel; a warm cache (e.g.
    # prepaid by a builder-session run earlier in the round) makes the
    # driver's end-of-round bench run pay execution time only.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("VTPU_BENCH_CACHE", "/tmp/vtpu_bench_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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
    train_live_bn_img_s = _bench_train_live_bn(
        module, variables, 128, n_iters=10
    )
    train_true_img_s = _bench_train_true(module, variables, 128, n_iters=10)
    e2e_img_s = _bench_e2e(module, variables, batch, n_batches=12)
    e2e_tpu_dec = _bench_e2e_tpu_decode(module, variables, batch, n_batches=12)
    e2e_dev_in = _bench_e2e_device_input(module, variables, batch, n_iters=20)
    host_full_ms, host_huff_ms = _bench_host_decode_cost()
    nms_sweep = _bench_nms_sweep()
    nms_1k = nms_sweep.get("1024", {})
    nms_boxes_s = nms_1k.get("pallas", 0.0)
    nms_xla_boxes_s = nms_1k.get("xla", 0.0)
    (
        roi_gather_s,
        roi_mxu_f32_s,
        roi_mxu_f32_exact_s,
        roi_mxu_bf16_s,
        roi_pallas_f32_s,
        roi_pallas_bf16_s,
    ) = _bench_roi_align()
    try:
        detection_e2e = _bench_detection_e2e()
    except Exception as e:  # noqa: BLE001 — record, don't kill the bench
        detection_e2e = {"error": f"{type(e).__name__}: {e}"}
    zoo_fwd = _bench_zoo_fwd()

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
    train_true_mfu = (
        train_true_img_s * 3 * RESNET50_FWD_FLOPS / V5E_BF16_PEAK_FLOPS
    )
    best_e2e = max(e2e_img_s, e2e_tpu_dec or 0.0)
    # prod-host projection: ~14 vCPU/chip on a v5e host; 13 decode workers
    # (1 reserved for the runtime); with the TPU-offload path the host only
    # pays the Huffman pass per image.
    host_capacity_14vcpu = 13.0 * 1000.0 / host_huff_ms if host_huff_ms else 0.0
    e2e_projected = min(e2e_dev_in, host_capacity_14vcpu)

    # The long detail dict is printed FIRST and the compact parsed
    # summary LAST: the driver keeps only a ~2000-char tail of stdout,
    # and in round 4 the headline {metric, value, vs_baseline} fields —
    # which led the single JSON line — were truncated away
    # (BENCH_r04.json parsed: null). The last line must stay compact.
    print(
        json.dumps(
            {
                "detail": {
                    "backend": backend_or_err,
                    "fwd_images_per_sec": round(fwd_img_s, 1),
                    "fwd_bf16_mfu_vs_v5e_peak": round(mfu, 4),
                    "train_step_images_per_sec": round(train_img_s, 1),
                    "train_live_bn_compute_images_per_sec": round(
                        train_live_bn_img_s, 1
                    ),
                    "train_bf16_mfu_vs_v5e_peak": round(train_mfu, 4),
                    "train_true_images_per_sec": round(train_true_img_s, 1),
                    "train_true_bf16_mfu_vs_v5e_peak": round(
                        train_true_mfu, 4
                    ),
                    "vit_b16_fwd_images_per_sec": round(vit_img_s, 1),
                    "vit_b16_fwd_bf16_mfu": round(vit_mfu, 4),
                    "e2e_host_decode_images_per_sec": round(e2e_img_s, 1),
                    "e2e_tpu_offload_decode_images_per_sec": round(
                        e2e_tpu_dec, 1
                    )
                    if e2e_tpu_dec
                    else None,
                    "e2e_device_input_images_per_sec": round(e2e_dev_in, 1),
                    "host_decode_ms_per_image_per_core": round(
                        host_full_ms, 3
                    ),
                    "host_huffman_ms_per_image_per_core": round(
                        host_huff_ms, 3
                    ),
                    "e2e_projected_14vcpu_images_per_sec": round(
                        e2e_projected, 1
                    ),
                    "nms_boxes_per_sec": nms_boxes_s,
                    "nms_xla_fallback_boxes_per_sec": nms_xla_boxes_s,
                    "nms_sweep_boxes_per_sec": nms_sweep,
                    "roi_align_rois_per_sec": round(roi_mxu_f32_s, 0),
                    "roi_align_gather_rois_per_sec": round(roi_gather_s, 0),
                    "roi_align_mxu_f32_highest_rois_per_sec": round(
                        roi_mxu_f32_exact_s, 0
                    ),
                    "roi_align_mxu_bf16_rois_per_sec": round(
                        roi_mxu_bf16_s, 0
                    ),
                    "roi_align_pallas_rois_per_sec": round(
                        roi_pallas_f32_s, 0
                    ),
                    "roi_align_pallas_bf16_rois_per_sec": round(
                        roi_pallas_bf16_s, 0
                    ),
                    "detection_e2e_images_per_sec": detection_e2e,
                    "zoo_fwd": zoo_fwd,
                    "host_cpu_cores": os.cpu_count(),
                    "note": "headline value = measured e2e incl. host JPEG "
                    "entropy decode on THIS host (1 vCPU shared with the "
                    "TPU-tunnel relay). Chip-side ceiling is "
                    "e2e_device_input_images_per_sec (decode excluded); "
                    "e2e_projected_14vcpu = min(chip ceiling, 13 workers / "
                    "host_huffman_ms_per_image_per_core) projects a prod "
                    "v5e host (~14 vCPU/chip). train_true = fused "
                    "device-augment + live-BN train step; train_step = "
                    "frozen-stats compute-only variant kept for r2 "
                    "continuity. roi_align_rois_per_sec = MXU f32/high "
                    "(bf16x3, the r4 TPU dispatch default for f32; "
                    "_highest row = bf16x6 exact-parity opt-in). "
                    "NMS/roi_align "
                    "rows use best-of-3 amortized timing from r4 on — "
                    "r2/r3 component rows were ~5x understated by the "
                    "~0.3-0.5ms per-call dispatch through the TPU tunnel "
                    "(a trivial copy kernel measured the same per-call "
                    "cost as full NMS at n<=4k). detection_e2e = whole "
                    "models (backbone->FPN->heads->decode->batched NMS) "
                    "in one jit at 832x832 batch 1, f32, random weights; "
                    "e2e_amp rows = the engine's --amp recipe (convs "
                    "bf16, box-coordinate math f32-registered at the "
                    "coder/NMS seams).",
                },
            }
        )
    )
    summary = {
        "metric": "resnet50_e2e_images_per_sec_per_chip",
        "value": round(best_e2e, 1),
        "unit": "images/sec",
        "vs_baseline": round(best_e2e / BASELINE_IMG_PER_SEC, 3),
        "fwd_images_per_sec": round(fwd_img_s, 1),
        "train_true_images_per_sec": round(train_true_img_s, 1),
        "e2e_device_input_images_per_sec": round(e2e_dev_in, 1),
        "nms_boxes_per_sec": nms_boxes_s,
        "roi_align_rois_per_sec": round(roi_mxu_f32_s, 0),
    }
    if isinstance(detection_e2e, dict) and "error" not in detection_e2e:
        summary["detection_e2e_images_per_sec"] = {
            k: v.get("e2e_images_per_sec")
            for k, v in detection_e2e.items()
            if isinstance(v, dict)
        }
        summary["detection_e2e_amp_images_per_sec"] = {
            k: v.get("e2e_amp_images_per_sec")
            for k, v in detection_e2e.items()
            if isinstance(v, dict) and "e2e_amp_images_per_sec" in v
        }
    line = json.dumps(summary)
    if len(line) > 1800:  # never let the parsed line outgrow the tail
        line = json.dumps(
            {k: summary[k] for k in ("metric", "value", "unit", "vs_baseline")}
        )
    sys.stdout.flush()
    print(line)


if __name__ == "__main__":
    main()
