"""P-K batch sampler for metric learning (counterpart of reference
``references/similarity/sampler.py``): every batch holds P classes with
K samples each, so each anchor always has K-1 in-batch positives."""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

__all__ = ["create_groups", "PKSampler"]


def create_groups(labels: Sequence[int], k: int) -> Dict[int, List[int]]:
    """reference sampler.py:8: label -> sample indices, dropping classes
    with fewer than k examples (they cannot fill a P-K cell)."""
    groups: Dict[int, List[int]] = {}
    for i, y in enumerate(np.asarray(labels)):
        groups.setdefault(int(y), []).append(i)
    return {c: idx for c, idx in groups.items() if len(idx) >= k}


class PKSampler:
    """reference sampler.py:33. Infinite iterator of index batches of
    size P*K (explicit RandomState instead of global torch RNG)."""

    def __init__(self, labels, p: int, k: int, seed: int = 0,
                 strict: bool = False):
        self.p, self.k = p, k
        self.rng = np.random.RandomState(seed)
        self.groups = (
            create_groups(labels, k) if strict else {}
        )
        if not strict:
            for i, y in enumerate(np.asarray(labels)):
                self.groups.setdefault(int(y), []).append(i)
        if len(self.groups) == 0:
            raise ValueError("no class has >= k samples")

    def __iter__(self):
        classes = list(self.groups)
        while True:
            chosen = self.rng.choice(
                classes, size=min(self.p, len(classes)), replace=False
            )
            batch = []
            for c in chosen:
                idxs = self.groups[c]
                batch.extend(
                    self.rng.choice(
                        idxs, size=self.k, replace=len(idxs) < self.k
                    )
                )
            yield batch
