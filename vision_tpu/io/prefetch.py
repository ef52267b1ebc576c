"""Host -> HBM async prefetch queue — the TPU slot for the reference's
nvJPEG batch decode path (``io/image.py:233`` decode_jpegs_cuda) and
DataLoader worker processes (SURVEY.md §2.1 TPU plan).

There is no on-TPU JPEG engine; throughput comes from (a) fanning decode
across host threads (libjpeg shim releases the GIL inside ctypes calls)
and (b) overlapping ``jax.device_put`` of batch N+1 with compute on batch N.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, Iterator, Optional

import jax
import numpy as np

__all__ = ["decode_batch", "PrefetchIterator", "prefetch_to_device"]


def decode_batch(
    buffers: Iterable[bytes],
    decode_fn: Optional[Callable[[bytes], np.ndarray]] = None,
    num_threads: int = 8,
):
    """Decode a batch of compressed images across host threads (the
    reference's batched nvJPEG entry point, same API shape)."""
    if decode_fn is None:
        from vision_tpu.io.image import decode_image

        decode_fn = decode_image
    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        return list(pool.map(decode_fn, buffers))


class PrefetchIterator:
    """Wrap a host batch iterator; a background thread stays ``depth``
    batches ahead and lands them on device with ``jax.device_put``."""

    _SENTINEL = object()

    def __init__(
        self,
        iterable: Iterable[Any],
        depth: int = 2,
        sharding=None,
    ):
        self._iterable = iterable
        self._depth = depth
        self._sharding = sharding

    def __iter__(self) -> Iterator[Any]:
        # Two pipeline stages in separate threads so host batch PRODUCTION
        # (decode — CPU-bound) overlaps with device_put (network/DMA-bound,
        # releases the GIL): stage1 host batches -> q_host, stage2
        # device_put -> q_dev. A single combined worker would serialize
        # decode behind every transfer.
        #
        # On a single-core host the two-stage split inverts: decode,
        # transfer, and the runtime's own I/O threads thrash the one CPU
        # (measured 4x collapse: 36 MB device_put 43 ms idle -> 1.9 s under
        # decode contention), so everything runs in ONE worker thread and
        # the pipeline degrades gracefully to decode->put serial order.
        if os.cpu_count() == 1:
            yield from self._iter_single_worker()
            return
        q_host: "queue.Queue" = queue.Queue(maxsize=self._depth)
        q_dev: "queue.Queue" = queue.Queue(maxsize=self._depth)
        err = []
        put = self._put

        def producer():
            try:
                for batch in self._iterable:
                    q_host.put(batch)
            except Exception as e:  # surfaced on the consumer side
                err.append(e)
            finally:
                q_host.put(self._SENTINEL)

        def transfer():
            try:
                while True:
                    batch = q_host.get()
                    if batch is self._SENTINEL:
                        break
                    q_dev.put(put(batch))
            except Exception as e:
                err.append(e)
            finally:
                q_dev.put(self._SENTINEL)

        for fn in (producer, transfer):
            threading.Thread(target=fn, daemon=True).start()
        while True:
            item = q_dev.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


    def _put(self, batch):
        """Land a host batch on device (sharding-aware); shared by both
        pipeline shapes."""
        if self._sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._sharding), batch
            )
        return jax.tree_util.tree_map(jax.device_put, batch)

    def _iter_single_worker(self) -> Iterator[Any]:
        """Degenerate pipeline for 1-vCPU hosts: one background thread
        decodes and lands batches on device; the consumer still overlaps
        device compute with the next batch's host work."""
        q_dev: "queue.Queue" = queue.Queue(maxsize=self._depth)
        err = []
        put = self._put

        def worker():
            try:
                for batch in self._iterable:
                    q_dev.put(put(batch))
            except Exception as e:
                err.append(e)
            finally:
                q_dev.put(self._SENTINEL)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q_dev.get()
            if item is self._SENTINEL:
                if err:
                    raise err[0]
                return
            yield item


def prefetch_to_device(iterable, depth: int = 2, sharding=None):
    """Convenience: ``for batch in prefetch_to_device(loader): ...``"""
    return iter(PrefetchIterator(iterable, depth=depth, sharding=sharding))
