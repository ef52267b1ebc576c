"""Quantization (reference ``torchvision/models/quantization/`` —
eager-mode PTQ/QAT via torch.ao for googlenet/inception/mobilenet/resnet/
shufflenet).

TPU plan (SURVEY.md §2.6): the torch int8 eager stack has no TPU analog;
the TPU-idiomatic story is AQT-style symmetric int8:

* :func:`quantize_model` — post-training weight quantization: per-output-
  channel symmetric int8 for conv/dense kernels, stored as (int8, scale).
  4x weight-memory reduction; compute runs in bf16/f32 after on-the-fly
  dequant (XLA fuses the rescale into the consumer matmul).
* :func:`simulate_quantization` — fake-quant (quantize->dequantize in
  fp32) for accuracy-impact evaluation, the PTQ analog of the reference's
  eager ``quantize=True`` eval path.

Quantized builders mirror the reference's list: resnet18/50, googlenet,
inception_v3, mobilenet_v2/v3_large, shufflenet_v2_x1_0.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._utils import VisionModel

__all__ = [
    "calibrate_activations",
    "apply_with_activation_quant",
    "fake_quant_ste",
    "fake_quant_params_ste",
    "qat_apply",
    "quantize_weights",
    "dequantize_weights",
    "quantize_model",
    "simulate_quantization",
    "QuantizedVisionModel",
]

_QUANT_MIN_SIZE = 1024  # leave small params (biases, norms) in float


def _is_kernel(path, leaf) -> bool:
    name = str(getattr(path[-1], "key", path[-1]))
    return name in ("kernel", "embedding") and leaf.size >= _QUANT_MIN_SIZE


def quantize_weights(params: Any) -> Tuple[Any, Any]:
    """Per-output-channel symmetric int8 of conv/dense kernels.

    Returns (qparams, scales): qparams has int8 leaves where quantized and
    the original leaves elsewhere; scales has matching float leaves (or
    None markers as 0-size arrays)."""

    def q(path, leaf):
        if not _is_kernel(path, leaf):
            return leaf, jnp.zeros((0,), jnp.float32)
        # output channels are the last dim for both HWIO conv and IO dense
        absmax = jnp.max(jnp.abs(leaf), axis=tuple(range(leaf.ndim - 1)))
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        qv = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
        return qv, scale.astype(jnp.float32)

    flat = jax.tree_util.tree_map_with_path(q, params)
    qparams = jax.tree_util.tree_map(
        lambda pair: pair[0], flat, is_leaf=lambda x: isinstance(x, tuple)
    )
    scales = jax.tree_util.tree_map(
        lambda pair: pair[1], flat, is_leaf=lambda x: isinstance(x, tuple)
    )
    return qparams, scales


def dequantize_weights(qparams: Any, scales: Any, dtype=jnp.float32) -> Any:
    def dq(qv, scale):
        if qv.dtype == jnp.int8:
            return (qv.astype(dtype) * scale.astype(dtype)).astype(dtype)
        return qv

    return jax.tree_util.tree_map(dq, qparams, scales)


def simulate_quantization(params: Any) -> Any:
    """Fake-quant round trip for accuracy evaluation."""
    q, s = quantize_weights(params)
    return dequantize_weights(q, s)


class QuantizedVisionModel:
    """int8-weight model: stores quantized kernels, dequantizes on the fly
    inside the jitted forward (the rescale fuses into the consumer op).

    Activation quantization (reference PTQ observer flow,
    ``quantization/utils.py:21``): call :meth:`calibrate` with a few
    batches to record per-layer scales, then set ``quantize_activations``
    (or pass none and get dynamic per-batch scales)."""

    def __init__(
        self,
        model: VisionModel,
        compute_dtype=jnp.float32,
        quantize_activations: bool = False,
    ):
        self.module = model.module
        self.compute_dtype = compute_dtype
        variables = dict(model.variables)
        self.qparams, self.scales = quantize_weights(variables.pop("params"))
        self.other_variables = variables
        self.preprocess = model.preprocess
        self.meta = model.meta
        self.quantize_activations = quantize_activations
        self.activation_scales = None

    def _variables(self):
        params = dequantize_weights(
            self.qparams, self.scales, self.compute_dtype
        )
        return {"params": params, **self.other_variables}

    def calibrate(self, batches, **apply_kwargs):
        """PTQ observer pass over calibration batches (run eagerly)."""
        from vision_tpu.models.quantization.activation import (
            calibrate_activations,
        )

        self.activation_scales = calibrate_activations(
            self.module.apply, self._variables(), batches, **apply_kwargs
        )
        self.quantize_activations = True
        return self.activation_scales

    def __call__(self, *inputs, train: bool = False, **kwargs):
        if self.quantize_activations:
            from vision_tpu.models.quantization.activation import (
                apply_with_activation_quant,
            )

            return apply_with_activation_quant(
                self.module.apply,
                self._variables(),
                *inputs,
                scales=self.activation_scales,
                train=train,
                **kwargs,
            )
        return self.module.apply(
            self._variables(), *inputs, train=train, **kwargs
        )

    def memory_bytes(self) -> int:
        flat = jax.tree_util.tree_leaves(self.qparams)
        return sum(l.size * l.dtype.itemsize for l in flat)


def quantize_model(
    model: VisionModel,
    compute_dtype=jnp.float32,
    quantize_activations: bool = False,
) -> QuantizedVisionModel:
    return QuantizedVisionModel(
        model, compute_dtype, quantize_activations=quantize_activations
    )


def _make_quantized_builder(name):
    from vision_tpu.models._api import get_model_builder, register_model

    def builder(
        *,
        weights=None,
        quantize: bool = True,
        quantize_activations: bool = False,
        **kwargs,
    ):
        base = get_model_builder(name)(weights=weights, **kwargs)
        if not quantize:
            return base
        return quantize_model(
            base, quantize_activations=quantize_activations
        )

    builder.__name__ = f"quantized_{name}"
    builder.__doc__ = (
        f"int8 weight-quantized {name} (reference "
        f"``torchvision/models/quantization/``)."
    )
    return register_model()(builder)


quantized_resnet18 = _make_quantized_builder("resnet18")
quantized_resnet50 = _make_quantized_builder("resnet50")
quantized_googlenet = _make_quantized_builder("googlenet")
quantized_inception_v3 = _make_quantized_builder("inception_v3")
quantized_mobilenet_v2 = _make_quantized_builder("mobilenet_v2")
quantized_mobilenet_v3_large = _make_quantized_builder("mobilenet_v3_large")
quantized_shufflenet_v2_x0_5 = _make_quantized_builder("shufflenet_v2_x0_5")
quantized_shufflenet_v2_x1_0 = _make_quantized_builder("shufflenet_v2_x1_0")
quantized_shufflenet_v2_x1_5 = _make_quantized_builder("shufflenet_v2_x1_5")
quantized_shufflenet_v2_x2_0 = _make_quantized_builder("shufflenet_v2_x2_0")
quantized_resnext101_32x8d = _make_quantized_builder("resnext101_32x8d")
quantized_resnext101_64x4d = _make_quantized_builder("resnext101_64x4d")


from vision_tpu.models.quantization.activation import (  # noqa: E402
    apply_with_activation_quant,
    calibrate_activations,
    fake_quant_params_ste,
    fake_quant_ste,
    qat_apply,
)
