"""Training utilities (reference ``references/classification/utils.py``):
SmoothedValue, MetricLogger, accuracy, EMA, checkpointing helpers.

The distributed pieces map to JAX: ``reduce_across_processes`` becomes a
``jax.device_get`` of already-psum'd metrics (SPMD handles the all-reduce);
``init_distributed_mode`` becomes ``jax.distributed.initialize``.
"""

from __future__ import annotations

import datetime
import os
import time
from collections import defaultdict, deque
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SmoothedValue:
    """reference ``utils.py:14``: windowed median/avg + global avg."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median,
            avg=self.avg,
            global_avg=self.global_avg,
            max=self.max,
            value=self.value,
        )


class MetricLogger:
    """reference ``utils.py:69``: throughput/ETA logging."""

    def __init__(self, delimiter: str = "\t"):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def log_every(self, iterable, print_freq: int, header: str = ""):
        """reference ``utils.py:101``."""
        i = 0
        start_time = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                if total:
                    eta = datetime.timedelta(
                        seconds=int(iter_time.global_avg * (total - i))
                    )
                    print(
                        f"{header} [{i}/{total}] eta: {eta} {self} "
                        f"time: {iter_time} data: {data_time}",
                        flush=True,
                    )
                else:
                    print(f"{header} [{i}] {self} time: {iter_time}", flush=True)
            i += 1
            end = time.time()
        total_time = time.time() - start_time
        print(
            f"{header} Total time: {datetime.timedelta(seconds=int(total_time))}",
            flush=True,
        )


def accuracy(logits, targets, topk=(1,)):
    """Top-k accuracy (reference ``utils.py:173``); jit-safe. k is
    clamped to the number of classes (reference crashes on e.g. top-5
    with a 2-class head; we degrade to top-C)."""
    num_classes = logits.shape[-1]
    maxk = min(max(topk), num_classes)
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == targets[:, None]
    return [
        jnp.sum(jnp.any(correct[:, : min(k, num_classes)], axis=1))
        / targets.shape[0]
        * 100.0
        for k in topk
    ]


class ExponentialMovingAverage:
    """Model EMA (reference ``utils.py:159``): decay-averaged params pytree,
    with the reference's adjusted-decay warmup behavior handled by the
    caller passing the effective decay."""

    def __init__(self, params, decay: float = 0.9999):
        self.decay = decay
        # copy: the train step donates its state, so aliasing params here
        # (jnp.asarray is a no-op on device arrays) would leave the shadow
        # pointing at deleted buffers after the first step
        self.shadow = jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), params
        )

    def update(self, params):
        d = self.decay
        self.shadow = jax.tree_util.tree_map(
            lambda s, p: s * d + p.astype(s.dtype) * (1.0 - d),
            self.shadow,
            params,
        )
        return self.shadow


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Orbax whole-state checkpoint (reference ``train.py:374-386``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def checkpoint_keys(path: str):
    """Top-level keys stored in an orbax checkpoint (so a resume template
    can be shaped to match, e.g. detect an "ema" entry)."""
    import orbax.checkpoint as ocp

    meta = ocp.StandardCheckpointer().metadata(os.path.abspath(path))
    item = getattr(meta, "item_metadata", meta)
    try:
        return set(item.keys())
    except (AttributeError, TypeError):
        return set()


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """reference ``train.py:341-351`` resume path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def reduce_across_processes(val):
    """reference ``utils.py`` reduce_across_processes: under SPMD jit the
    psum already happened; this is the host-side fetch."""
    return jax.device_get(val)


def average_checkpoints(paths):
    """reference ``utils.py:272`` average_checkpoints: elementwise mean of
    the params across checkpoint files (post-training weight averaging)."""
    if not paths:
        raise ValueError("need at least one checkpoint path")
    states = [load_checkpoint(p) for p in paths]
    n = float(len(states))
    return jax.tree_util.tree_map(
        lambda *leaves: sum(
            leaf.astype(jnp.float32) for leaf in leaves
        ) / n,
        *states,
    )
