"""Import the ACTUAL reference torchvision from /root/reference for direct
oracle parity.

The reference's native extension (``_C``/``_C_stable``) is not built in this
image, and importing the package fails only because
``_meta_registrations.py`` registers fake kernels for ``torchvision::*`` op
schemas that the (unbuilt) extension would normally define
(reference ``torchvision/_meta_registrations.py:16-25``).  We define those
schemas here (transcribed from the ``m.def`` strings in
``torchvision/csrc/ops/*.cpp``), give ``nms`` a greedy CPU impl (reference
CPU algorithm: ``csrc/ops/cpu/nms_kernel.cpp:18-95``), and import the real
package.  ``roi_align`` needs no impl: with ``_has_ops()`` False the
reference itself routes to its pure-Python differentiable ``_roi_align``
(reference ``ops/roi_align.py:276-281``) which it ships exactly for
no-extension environments.

This makes the reference's WHOLE pure-Python surface (121 model builders,
transforms v2 classes + functionals, tv_tensors, ops composites) importable
and runnable on CPU — the direct oracle for parity tests, replacing
transcription-trust (VERDICT r2, "Next round" item 1).
"""

from __future__ import annotations

import sys

_REFERENCE_PATH = "/root/reference"
_tv = None

# Schemas transcribed from the reference csrc ``m.def(...)`` strings
# (csrc/ops/nms.cpp:27, roi_align.cpp:125-128, ps_roi_align.cpp,
# roi_pool.cpp, ps_roi_pool.cpp, deform_conv2d.cpp:166,
# box_iou_rotated.cpp, quantized/cpu/qnms_kernel.cpp:149,
# quantized/cpu/qroi_align_kernel.cpp:225).
_SCHEMAS = [
    "nms(Tensor dets, Tensor scores, float iou_threshold) -> Tensor",
    "qnms(Tensor dets, Tensor scores, float iou_threshold) -> Tensor",
    "roi_align(Tensor input, Tensor rois, float spatial_scale, "
    "SymInt pooled_height, SymInt pooled_width, int sampling_ratio, "
    "bool aligned) -> Tensor",
    "_roi_align_backward(Tensor grad, Tensor rois, float spatial_scale, "
    "SymInt pooled_height, SymInt pooled_width, SymInt batch_size, "
    "SymInt channels, SymInt height, SymInt width, int sampling_ratio, "
    "bool aligned) -> Tensor",
    "ps_roi_align(Tensor input, Tensor rois, float spatial_scale, "
    "SymInt pooled_height, SymInt pooled_width, int sampling_ratio) "
    "-> (Tensor, Tensor)",
    "_ps_roi_align_backward(Tensor grad, Tensor rois, "
    "Tensor channel_mapping, float spatial_scale, SymInt pooled_height, "
    "SymInt pooled_width, int sampling_ratio, SymInt batch_size, "
    "SymInt channels, SymInt height, SymInt width) -> Tensor",
    "roi_pool(Tensor input, Tensor rois, float spatial_scale, "
    "SymInt pooled_height, SymInt pooled_width) -> (Tensor, Tensor)",
    "_roi_pool_backward(Tensor grad, Tensor rois, Tensor argmax, "
    "float spatial_scale, SymInt pooled_height, SymInt pooled_width, "
    "SymInt batch_size, SymInt channels, SymInt height, SymInt width) "
    "-> Tensor",
    "ps_roi_pool(Tensor input, Tensor rois, float spatial_scale, "
    "SymInt pooled_height, SymInt pooled_width) -> (Tensor, Tensor)",
    "_ps_roi_pool_backward(Tensor grad, Tensor rois, "
    "Tensor channel_mapping, float spatial_scale, SymInt pooled_height, "
    "SymInt pooled_width, SymInt batch_size, SymInt channels, "
    "SymInt height, SymInt width) -> Tensor",
    "deform_conv2d(Tensor input, Tensor weight, Tensor offset, "
    "Tensor mask, Tensor bias, SymInt stride_h, SymInt stride_w, "
    "SymInt pad_h, SymInt pad_w, SymInt dilation_h, SymInt dilation_w, "
    "SymInt groups, SymInt offset_groups, bool use_mask) -> Tensor",
    "_deform_conv2d_backward(Tensor grad, Tensor input, Tensor weight, "
    "Tensor offset, Tensor mask, Tensor bias, SymInt stride_h, "
    "SymInt stride_w, SymInt pad_h, SymInt pad_w, SymInt dilation_h, "
    "SymInt dilation_w, SymInt groups, SymInt offset_groups, "
    "bool use_mask) -> (Tensor, Tensor, Tensor, Tensor, Tensor)",
    "box_iou_rotated(Tensor boxes1, Tensor boxes2) -> Tensor",
    "qroi_align(Tensor input, Tensor rois, float input_scale, "
    "int input_zero_point, float rois_scale, int rois_zero_point, "
    "float spatial_scale, SymInt pooled_height, SymInt pooled_width, "
    "int sampling_ratio, bool aligned) -> Tensor",
]


def _greedy_nms_cpu(dets, scores, iou_threshold):
    """Greedy NMS, the reference CPU algorithm
    (csrc/ops/cpu/nms_kernel.cpp:18-95): stable-sort scores descending,
    suppress any later box with IoU > threshold against a kept box."""
    import torch

    order = torch.argsort(scores, descending=True, stable=True)
    x1, y1, x2, y2 = dets.unbind(dim=1)
    areas = (x2 - x1) * (y2 - y1)
    keep = []
    suppressed = torch.zeros(dets.shape[0], dtype=torch.bool)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        xx1 = torch.maximum(x1[idx], x1)
        yy1 = torch.maximum(y1[idx], y1)
        xx2 = torch.minimum(x2[idx], x2)
        yy2 = torch.minimum(y2[idx], y2)
        w = (xx2 - xx1).clamp(min=0)
        h = (yy2 - yy1).clamp(min=0)
        inter = w * h
        iou = inter / (areas[idx] + areas - inter)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.long)


def load_reference():
    """Import and return the reference ``torchvision`` (cached)."""
    global _tv
    if _tv is not None:
        return _tv
    import torch

    if "torchvision" in sys.modules and not getattr(
        sys.modules["torchvision"], "__file__", ""
    ).startswith(_REFERENCE_PATH):
        raise RuntimeError("a different torchvision is already imported")

    lib = torch.library.Library("torchvision", "FRAGMENT")
    for schema in _SCHEMAS:
        try:
            lib.define(schema)
        except RuntimeError:
            pass  # already defined (re-import in the same process)
    try:
        lib.impl("nms", _greedy_nms_cpu, "CPU")
    except RuntimeError:
        pass
    # keep the Library object alive for the life of the process
    load_reference._lib = lib

    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    import torchvision  # noqa: F401

    if not torchvision.__file__.startswith(_REFERENCE_PATH):
        raise RuntimeError(
            f"imported torchvision from {torchvision.__file__}, "
            f"expected {_REFERENCE_PATH}"
        )
    # nms goes through our CPU impl; _has_ops() stays False so roi_align
    # takes the reference's own pure-Python path (ops/roi_align.py:276-281).
    import torchvision.ops.boxes as _boxes

    _boxes._assert_has_ops = lambda: None
    _tv = torchvision
    return _tv
