"""Codec throughput benchmark (reference
``benchmarks/encoding_decoding.py``: machine-relative jpeg/png/webp
encode/decode timings; prints, stores nothing).

Run: ``python benchmarks/encoding_decoding.py [--size 512] [--iters 50]``
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench(fn, iters):
    fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main(args):
    from vision_tpu.io import _codecs
    from vision_tpu.io.image import (
        decode_image,
        decode_jpeg,
        decode_png,
        encode_jpeg,
        encode_png,
    )

    print(f"native codec available: {_codecs.has_native()}")
    rng = np.random.RandomState(0)
    # gradient+noise image: representative entropy, stable across runs
    base = np.linspace(0, 255, args.size, dtype=np.float32)
    img = np.clip(
        base[None, :, None]
        + base[:, None, None] * 0.5
        + rng.randn(args.size, args.size, 3) * 8,
        0, 255,
    ).astype(np.uint8)

    jpeg_bytes = encode_jpeg(img, quality=85)
    png_bytes = encode_png(img)
    rows = [
        ("encode_jpeg q85", lambda: encode_jpeg(img, quality=85)),
        ("decode_jpeg", lambda: decode_jpeg(jpeg_bytes)),
        ("encode_png", lambda: encode_png(img)),
        ("decode_png", lambda: decode_png(png_bytes)),
        ("decode_image (sniff)", lambda: decode_image(jpeg_bytes)),
    ]
    mpix = args.size * args.size / 1e6
    print(f"{args.size}x{args.size} RGB ({mpix:.2f} MPix), {args.iters} iters")
    for name, fn in rows:
        dt = bench(fn, args.iters)
        print(f"  {name:24s} {dt * 1e3:8.2f} ms/img  {mpix / dt:8.1f} MPix/s")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=50)
    main(p.parse_args())
