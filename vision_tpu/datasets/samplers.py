"""Samplers + host-side DataLoader — the TPU input-pipeline replacement
for torch DataLoader + DistributedSampler (SURVEY.md §2.10: per-host
sharded file lists + device_put prefetch).
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, List, Optional, Sequence

import numpy as np

__all__ = [
    "DistributedSampler",
    "RandomClipSampler",
    "UniformClipSampler",
    "DataLoader",
    "default_collate",
]


class DistributedSampler:
    """reference ``datasets/samplers/clip_sampler.py:11`` /
    torch DistributedSampler: shards indices across hosts, pads to equal
    length, reshuffles per epoch with set_epoch."""

    def __init__(
        self,
        dataset,
        num_replicas: int = 1,
        rank: int = 0,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        if rank >= num_replicas or rank < 0:
            raise ValueError(f"invalid rank {rank} for {num_replicas} replicas")
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        n = len(dataset)
        if drop_last and n % num_replicas != 0:
            self.num_samples = n // num_replicas
        else:
            self.num_samples = math.ceil(n / num_replicas)
        self.total_size = self.num_samples * num_replicas
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[int]:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            indices = rng.permutation(n).tolist()
        else:
            indices = list(range(n))
        if not self.drop_last:
            pad = self.total_size - len(indices)
            indices += indices[:pad] if pad <= len(indices) else (
                indices * math.ceil(pad / max(len(indices), 1))
            )[:pad]
        else:
            indices = indices[: self.total_size]
        return iter(indices[self.rank : self.total_size : self.num_replicas])

    def __len__(self) -> int:
        return self.num_samples


class UniformClipSampler:
    """reference ``clip_sampler.py:106``: evenly spaced clips per video."""

    def __init__(self, video_clips, num_clips_per_video: int):
        self.video_clips = video_clips
        self.num_clips_per_video = num_clips_per_video

    def __iter__(self):
        idxs = []
        s = 0
        for c in self.video_clips.clips:
            length = len(c)
            if length == 0:
                continue
            sampled = np.linspace(
                s, s + length - 1, num=self.num_clips_per_video
            ).astype(np.int64)
            s += length
            idxs.extend(sampled.tolist())
        return iter(idxs)

    def __len__(self):
        return sum(
            self.num_clips_per_video
            for c in self.video_clips.clips
            if len(c) > 0
        )


class RandomClipSampler:
    """reference ``clip_sampler.py:142``: up to N random clips per video."""

    def __init__(self, video_clips, max_clips_per_video: int, seed: int = 0):
        self.video_clips = video_clips
        self.max_clips_per_video = max_clips_per_video
        self.seed = seed

    def __iter__(self):
        rng = np.random.RandomState(self.seed)
        idxs = []
        s = 0
        for c in self.video_clips.clips:
            length = len(c)
            size = min(length, self.max_clips_per_video)
            sampled = rng.permutation(length)[:size] + s
            s += length
            idxs.append(sampled)
        if not idxs:
            return iter([])
        all_idx = np.concatenate(idxs)
        return iter(all_idx[rng.permutation(len(all_idx))].tolist())

    def __len__(self):
        return sum(
            min(len(c), self.max_clips_per_video)
            for c in self.video_clips.clips
        )


def default_collate(batch: List[Any]):
    """Stack a list of samples into batched numpy arrays (torch
    default_collate semantics for the array/scalar/tuple/dict cases)."""
    elem = batch[0]
    if isinstance(elem, np.ndarray):
        return np.stack(batch)
    if isinstance(elem, (int, np.integer)):
        return np.asarray(batch, dtype=np.int64)
    if isinstance(elem, (float, np.floating)):
        return np.asarray(batch, dtype=np.float64)
    if isinstance(elem, (tuple, list)):
        return type(elem)(default_collate(list(s)) for s in zip(*batch))
    if isinstance(elem, dict):
        return {k: default_collate([d[k] for d in batch]) for k in elem}
    return batch


class DataLoader:
    """Host-side batching loader (the torch DataLoader slot): thread-pool
    sample loading (the decode shim releases the GIL), optional shuffle,
    custom collate. Combine with ``io.prefetch_to_device`` for the async
    host->HBM stage."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        sampler: Optional[Any] = None,
        num_workers: int = 0,
        collate_fn: Optional[Callable] = None,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.sampler = sampler
        self.num_workers = num_workers
        self.collate_fn = collate_fn or default_collate
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch
        if self.sampler is not None and hasattr(self.sampler, "set_epoch"):
            self.sampler.set_epoch(epoch)

    def _indices(self):
        if self.sampler is not None:
            return list(self.sampler)
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            return rng.permutation(n).tolist()
        return list(range(n))

    def __iter__(self):
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        if self.num_workers > 0:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            get = lambda idx: pool.submit(self.dataset.__getitem__, idx)  # noqa: E731
            try:
                for batch_idx in batches:
                    futures = [get(i) for i in batch_idx]
                    yield self.collate_fn([f.result() for f in futures])
            finally:
                pool.shutdown(wait=False)
        else:
            for batch_idx in batches:
                yield self.collate_fn([self.dataset[i] for i in batch_idx])

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)
