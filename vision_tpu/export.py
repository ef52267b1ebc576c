"""Serialized model export for deployment (``jax.export`` / StableHLO).

TPU-native analog of the reference's deployment-export surface: where the
reference lowers its custom ops to ONNX symbolics so a model with
nms/roi_align can leave the torch runtime
(``torchvision/ops/_register_onnx_ops.py:1-107``, exercised by
``test/test_onnx.py``), here every model — including the detection stacks
with their static-shape NMS/RoIAlign — is already a pure XLA program, so
the *whole forward* (weights baked in as constants) serializes to one
self-contained StableHLO artifact via ``jax.export``.

The artifact is loadable with jax alone (no vision_tpu, no flax, no model
code) and runs on any exported-for platform; lower once with
``platforms=("tpu", "cpu")`` for a serving binary that runs on both.
Dynamic serving batch sizes are supported through shape polymorphism
(``batch_dim="b"``).

Usage::

    from vision_tpu.export import export_model, load_exported

    exp = export_model("resnet50", path="/tmp/resnet50.stablehlo")
    # serving process (only needs jax):
    model = load_exported("/tmp/resnet50.stablehlo")
    logits = model(images)          # (N, 224, 224, 3) -> (N, 1000)
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import export as _jax_export

__all__ = ["export_model", "load_exported", "ExportedModel"]


class ExportedModel:
    """A deserialized artifact, callable like the original model.

    Thin wrapper over ``jax.export.Exported``: ``model(x)`` invokes the
    serialized StableHLO program (jit-compiled for the current backend on
    first call). The underlying object is available as ``.exported`` for
    VJP/platform introspection.
    """

    def __init__(self, exported: _jax_export.Exported):
        self.exported = exported

    @property
    def platforms(self) -> Tuple[str, ...]:
        return tuple(self.exported.platforms)

    @property
    def in_avals(self):
        return self.exported.in_avals

    def __call__(self, *args):
        return self.exported.call(*args)

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return (
            f"ExportedModel(fn_name={self.exported.fun_name!r}, "
            f"platforms={self.platforms}, in_avals={self.in_avals})"
        )


def _resolve(model) -> Tuple[Any, Any, Optional[str]]:
    """Accept a model name, a VisionModel, or a ``(module, variables)``
    pair; return ``(module, variables, name)``."""
    if isinstance(model, str):
        from vision_tpu.models import get_model

        vm = get_model(model)
        return vm.module, vm.variables, model
    if hasattr(model, "module") and hasattr(model, "variables"):
        return model.module, model.variables, getattr(model, "name", None)
    if isinstance(model, tuple) and len(model) == 2:
        return model[0], model[1], None
    raise TypeError(
        "model must be a registered model name, a VisionModel, or a "
        f"(module, variables) tuple; got {type(model).__name__}"
    )


def export_model(
    model,
    *,
    input_shape: Sequence[int] = (1, 224, 224, 3),
    dtype=jnp.float32,
    batch_dim: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    path: Optional[Union[str, os.PathLike]] = None,
    **apply_kwargs,
) -> ExportedModel:
    """Export a model's inference forward to a serialized StableHLO artifact.

    Args:
        model: registered model name (``"resnet50"``), a ``VisionModel``
            (from :func:`vision_tpu.models.get_model`), or a
            ``(flax_module, variables)`` pair.
        input_shape: full input shape including batch, channels-last.
        dtype: input dtype the serving boundary receives (the model's own
            internal dtypes are unaffected).
        batch_dim: if set (e.g. ``"b"``), dimension 0 is exported
            symbolically — one artifact serves every batch size. Requires
            the model to be batch-polymorphic (all zoo classification /
            segmentation models are; detection postprocess tops are too
            since their shapes derive from static capacities).
        platforms: lowering platforms, e.g. ``("tpu", "cpu")``. Default:
            the current jax default backend only.
        path: if given, the serialized bytes are also written there.
        **apply_kwargs: forwarded to ``module.apply`` (after
            ``train=False``), e.g. ``return_features=True``.

    Returns:
        :class:`ExportedModel` (already deserialized-equivalent; call it
        directly, or read ``.exported.serialize()`` for the bytes).
    """
    module, variables, _name = _resolve(model)

    def infer(x):
        return module.apply(variables, x, train=False, **apply_kwargs)

    if batch_dim is not None:
        dims = ", ".join([batch_dim] + [str(d) for d in input_shape[1:]])
        shape = _jax_export.symbolic_shape(dims)
    else:
        shape = tuple(input_shape)
    aval = jax.ShapeDtypeStruct(shape, dtype)

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = _jax_export.export(jax.jit(infer), **kwargs)(aval)

    if path is not None:
        data = exported.serialize()
        with open(path, "wb") as f:
            f.write(data)
    return ExportedModel(exported)


def load_exported(src: Union[str, os.PathLike, bytes, bytearray]) -> ExportedModel:
    """Load a serialized artifact produced by :func:`export_model`.

    Accepts a file path or raw bytes. The loading process needs only jax —
    none of vision_tpu's model code, weights files, or flax."""
    if isinstance(src, (bytes, bytearray)):
        data = bytes(src)
    else:
        with open(src, "rb") as f:
            data = f.read()
    return ExportedModel(_jax_export.deserialize(data))
