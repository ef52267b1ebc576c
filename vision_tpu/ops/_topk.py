"""Exact large-array top-k for detection postprocessing.

``jax.lax.top_k`` on TPU lowers to a full variadic sort: RetinaNet's
per-level candidate selection (top-1000 of ``HW*A*K`` ~ 8.9M sigmoid
scores at P3/832px, reference ``models/detection/retinanet.py:
postprocess_detections``) spends tens of milliseconds sorting scores
that can never matter. This module computes the same top-k in two small
exact stages built on a row-max decomposition:

    scores as [R, K] rows (anchors x classes):
    1. row_max = max over K          — one bandwidth-bound VPU pass
    2. top-k of row_max over R       — sort of R << R*K elements
    3. gather those k rows ([k, K])  — k*K candidate values
    4. top-k over the k*K candidates — sort of k*K elements

Exactness: every element of the true top-k lives in a row whose max is
>= the k-th largest element; at most k rows can have max >= that value
(each row contributes its max), so the k rows selected in (2) cover the
true top-k. Tie handling differs from ``lax.top_k`` only in ORDER among
equal values (both return k elements, and any value drawn from a tie
class is interchangeable with the one ``lax.top_k`` picks).

The same trick serves any 2D-decomposable flat array; RetinaNet uses
[num_anchors, num_classes].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["top_k_2d", "top_k_flat"]


def top_k_flat(x: jax.Array, k: int, row: int = 16) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of a flat 1D array via row-max pre-selection.

    ``lax.top_k`` on TPU sorts the whole array; for the RPN's per-level
    pre-NMS selection (top-1000 of ~130k objectness logits at P2/832px,
    reference ``rpn.py:242``) most of that sort is wasted. Reshape to
    ``[N/row, row]``, keep the k rows with the largest max (every true
    top-k element lives in such a row — its own row-max bounds it), and
    sort only the ``k*row`` survivors: two sorts of ``N/row`` and
    ``k*row`` elements instead of one of ``N``.

    Same set as ``lax.top_k(x, k)``; order differs only inside exact-tie
    classes. Returns ``(values [k], indices [k])``.
    """
    n = x.shape[0]
    if k * row * 2 >= n or n % row:
        return jax.lax.top_k(x, k)
    xr = x.reshape(n // row, row)
    row_max = jnp.max(xr, axis=1)  # [N/row]
    _, rows = jax.lax.top_k(row_max, k)  # [k]
    cand = xr[rows].reshape(-1)  # [k*row]
    vals, flat = jax.lax.top_k(cand, k)
    idx = rows[flat // row] * row + flat % row
    return vals, idx


def top_k_2d(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of ``scores.reshape(-1)`` for a 2D ``scores [R, K]``.

    Returns ``(values [k], flat_indices [k])`` — the same set as
    ``jax.lax.top_k(scores.reshape(-1), k)`` (order may differ within
    exact-tie classes). Falls back to ``lax.top_k`` when the
    decomposition cannot help (k >= R or a degenerate second dim).
    """
    r, kk = scores.shape
    total = r * kk
    if k > total:
        raise ValueError(f"k={k} > elements={total}")
    if k >= r or kk == 1:
        return jax.lax.top_k(scores.reshape(-1), k)

    row_max = jnp.max(scores, axis=1)  # [R]
    _, rows = jax.lax.top_k(row_max, k)  # [k]
    cand = scores[rows]  # [k, K]
    vals, flat = jax.lax.top_k(cand.reshape(-1), k)
    # candidate-local flat index -> original flat index
    cand_row = flat // kk
    idx = rows[cand_row] * kk + flat % kk
    return vals, idx
