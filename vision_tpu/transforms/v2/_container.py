"""Container transforms (reference
``torchvision/transforms/v2/_container.py``)."""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.transforms.v2._transform import Transform

__all__ = ["Compose", "RandomApply", "RandomChoice", "RandomOrder"]


class Compose(Transform):
    """Chain transforms; the PRNG key is split across the chain
    (reference ``_container.py`` Compose)."""

    def __init__(self, transforms: Sequence[Callable]):
        super().__init__()
        if not transforms:
            raise ValueError("transforms must not be empty")
        self.transforms = list(transforms)

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        keys = jax.random.split(key, len(self.transforms))
        for t, k in zip(self.transforms, keys):
            if isinstance(t, Transform):
                sample = t(sample, key=k)
            else:
                sample = t(sample)
        return sample

    def __repr__(self):
        inner = ", ".join(repr(t) for t in self.transforms)
        return f"Compose([{inner}])"


class RandomApply(Transform):
    """Apply the whole list with probability p (reference RandomApply)."""

    def __init__(self, transforms: Sequence[Callable], p: float = 0.5):
        super().__init__()
        self.transforms = list(transforms)
        self.p = p

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        gate, inner = jax.random.split(key)
        if float(jax.random.uniform(gate)) >= self.p:
            return sample
        keys = jax.random.split(inner, len(self.transforms))
        for t, k in zip(self.transforms, keys):
            sample = t(sample, key=k) if isinstance(t, Transform) else t(sample)
        return sample


class RandomChoice(Transform):
    """Pick one transform with given probabilities (reference RandomChoice)."""

    def __init__(
        self, transforms: Sequence[Callable], p: Optional[Sequence[float]] = None
    ):
        super().__init__()
        self.transforms = list(transforms)
        if p is None:
            p = [1.0] * len(transforms)
        elif len(p) != len(transforms):
            raise ValueError("length of p must match transforms")
        total = sum(p)
        self.p = [x / total for x in p]

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        pick, inner = jax.random.split(key)
        idx = int(jax.random.choice(pick, len(self.transforms), p=jnp.asarray(self.p)))
        t = self.transforms[idx]
        return t(sample, key=inner) if isinstance(t, Transform) else t(sample)


class RandomOrder(Transform):
    """Apply all transforms in random order (reference RandomOrder)."""

    def __init__(self, transforms: Sequence[Callable]):
        super().__init__()
        self.transforms = list(transforms)

    def __call__(self, *inputs, key: Optional[jax.Array] = None):
        sample = inputs if len(inputs) > 1 else inputs[0]
        if key is None:
            key = self._next_key()
        perm_key, inner = jax.random.split(key)
        order = np.asarray(
            jax.random.permutation(perm_key, len(self.transforms))
        )
        keys = jax.random.split(inner, len(self.transforms))
        for i in order:
            t = self.transforms[int(i)]
            sample = (
                t(sample, key=keys[int(i)]) if isinstance(t, Transform) else t(sample)
            )
        return sample
