"""Quantized detection ops (reference ``torchvision/csrc/ops/quantized/``:
``cpu/qnms_kernel.cpp``, ``cpu/qroi_align_kernel.cpp``).

The reference reaches these through quantized torch tensors
(``ops/boxes.py:20`` routes ``nms`` to ``torchvision::qnms`` when
``boxes.is_quantized``; ``ops/roi_align.py:251`` unpacks
``int_repr``/``q_scale``/``q_zero_point`` and calls
``torchvision::qroi_align``). JAX has no quantized-tensor type, so the
TPU surface takes the integer representation plus explicit
``(scale, zero_point)`` — exactly the payload the torch wrappers unpack.

Both ops stay static-shape / jittable like their float counterparts.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

from vision_tpu.ops.nms import nms
from vision_tpu.ops.roi_align import _roi_align_gather

__all__ = ["qnms", "qroi_align"]


def qnms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
) -> jax.Array:
    """NMS on quantized boxes/scores (reference ``qnms_kernel.cpp:20-109``).

    ``boxes`` ``[K, 4]`` and ``scores`` ``[K]`` are the integer
    representations (uint8/int8/int32). The reference kernel never
    dequantizes: the common scale cancels in the IoU ratio and the common
    zero point cancels in every coordinate difference (its "Note 1"), and
    integer score order equals dequantized score order — so qnms is
    greedy NMS on the raw integer values cast to float. Returns kept
    indices, score-descending (same static-shape contract as
    :func:`vision_tpu.ops.nms`).
    """
    return nms(
        boxes.astype(jnp.float32), scores.astype(jnp.float32), iou_threshold
    )


def qroi_align(
    input: jax.Array,
    rois: jax.Array,
    input_scale: float,
    input_zero_point: int,
    rois_scale: float,
    rois_zero_point: int,
    spatial_scale: float = 1.0,
    output_size: Union[int, Tuple[int, int]] = (7, 7),
    sampling_ratio: int = -1,
    aligned: bool = False,
) -> jax.Array:
    """RoIAlign on a quantized feature map (reference
    ``qroi_align_kernel.cpp:19-160``).

    ``input`` is ``[N, H, W, C]`` integer (uint8/int8), ``rois`` ``[K, 5]``
    integer rows of ``(batch_index, x1, y1, x2, y2)`` sharing one
    ``(rois_scale, rois_zero_point)``. Returns ``[K, PH, PW, C]`` in the
    input's dtype, requantized with the input's own scale/zero-point —
    the same contract as the reference wrapper
    (``ops/roi_align.py:274``: output quantization params == input's).

    Math note: the kernel accumulates integer samples in f32 and corrects
    the zero point by the realized weight sum
    (``output_val = scale * (acc - zp * sum_w)``) so zero-weighted
    out-of-range samples contribute nothing; dequantizing first gives the
    identical sum because ``(v - zp) * scale`` is only ever added where the
    bilinear weight is nonzero. Requantization uses round-half-even
    (``std::nearbyint``) and clamps to the dtype range. The reference
    kernel hard-codes ``batch_index = 0`` ("FIXME" at
    ``qroi_align_kernel.cpp:50`` — N==1 only); here the index column is
    dequantized and used, which coincides for N==1.
    """
    if isinstance(output_size, int):
        output_size = (output_size, output_size)
    dtype = input.dtype
    if not jnp.issubdtype(dtype, jnp.integer):
        raise ValueError(f"qroi_align expects an integer int_repr, got {dtype}")
    inp_f = (input.astype(jnp.float32) - float(input_zero_point)) * float(
        input_scale
    )
    rois_f = (rois.astype(jnp.float32) - float(rois_zero_point)) * float(
        rois_scale
    )
    batch_idx = jnp.round(rois_f[:, :1])
    rois_f = jnp.concatenate([batch_idx, rois_f[:, 1:]], axis=1)
    out = _roi_align_gather(
        inp_f, rois_f, output_size, spatial_scale, sampling_ratio, aligned
    )
    info = jnp.iinfo(dtype)
    q = float(input_zero_point) + jnp.round(out / float(input_scale))
    return jnp.clip(q, info.min, info.max).astype(dtype)
