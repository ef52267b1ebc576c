"""Conversion-hook registry: builder name -> state-dict rewrite hooks.

The per-family hooks live next to their models (``_vgg_hooks`` etc.) and are
wired into the builders' own weight-loading paths; this registry exposes the
same mapping to offline tools (``scripts/convert_weights.py``) that convert a
locally-saved torch checkpoint without a network round trip.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

__all__ = ["get_conversion_hooks"]


def get_conversion_hooks(name: str) -> Optional[Callable[[Dict], Dict]]:
    """Hooks for ``name`` (a registered builder), or None."""
    if name == "alexnet":
        from vision_tpu.models.alexnet import _alexnet_hooks

        return _alexnet_hooks
    if name.startswith("vgg"):
        from vision_tpu.models.vgg import _vgg_hooks

        return _vgg_hooks
    if name.startswith("vit_"):
        from vision_tpu.models.vision_transformer import _vit_hooks

        return _vit_hooks
    if name.startswith(("swin_", "swin3d_")):
        from vision_tpu.models.swin_transformer import _swin_hooks

        return _swin_hooks
    if name == "maxvit_t":
        from vision_tpu.models.maxvit import _maxvit_hooks

        return _maxvit_hooks
    if name == "googlenet":
        from vision_tpu.models.googlenet import _googlenet_hooks

        return _googlenet_hooks(False)
    if name.startswith(("fasterrcnn", "maskrcnn", "keypointrcnn")):
        from vision_tpu.models.detection.faster_rcnn import _frcnn_hooks

        return _frcnn_hooks
    if name.startswith("retinanet"):
        from vision_tpu.models.detection.retinanet import _retinanet_hooks

        return _retinanet_hooks
    if name.startswith("fcos"):
        from vision_tpu.models.detection.fcos import _fcos_hooks

        return _fcos_hooks
    if name.startswith("ssdlite"):
        from vision_tpu.models.detection.ssdlite import _ssdlite_hooks

        return _ssdlite_hooks
    return None
