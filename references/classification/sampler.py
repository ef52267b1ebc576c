"""Repeated-augmentation sampler (reference
``references/classification/sampler.py`` RASampler, from the DeiT recipe):
each sample is repeated ``repetitions`` times per epoch and the copies are
strided across hosts, so each host sees a *different* augmentation of the
same image. On TPU "replica" = host process (jax.process_index)."""

from __future__ import annotations

import math

import numpy as np


class RASampler:
    def __init__(self, dataset, num_replicas=None, rank=None, shuffle=True,
                 seed=0, repetitions=3):
        import jax

        if num_replicas is None:
            num_replicas = jax.process_count()
        if rank is None:
            rank = jax.process_index()
        self.dataset = dataset
        self.num_replicas = num_replicas
        self.rank = rank
        self.epoch = 0
        self.num_samples = int(
            math.ceil(len(dataset) * float(repetitions) / num_replicas)
        )
        self.total_size = self.num_samples * num_replicas
        self.num_selected_samples = int(
            math.floor(len(dataset) // 256 * 256 / num_replicas)
        )
        self.shuffle = shuffle
        self.seed = seed
        self.repetitions = repetitions

    def __iter__(self):
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            indices = rng.permutation(len(self.dataset)).tolist()
        else:
            indices = list(range(len(self.dataset)))
        # repeat each index, pad to an even split, stride across replicas
        indices = [i for i in indices for _ in range(self.repetitions)]
        indices += indices[: (self.total_size - len(indices))]
        assert len(indices) == self.total_size
        indices = indices[self.rank : self.total_size : self.num_replicas]
        assert len(indices) == self.num_samples
        return iter(indices[: self.num_selected_samples])

    def __len__(self):
        return self.num_selected_samples

    def set_epoch(self, epoch: int):
        self.epoch = epoch
