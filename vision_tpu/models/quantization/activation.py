"""Activation quantization + QAT fake-quant (reference
``torchvision/models/quantization/utils.py:21`` quantize_model: eager-mode
PTQ observers / QAT prepare; reference ``references/classification/
train_quantization.py`` is the training entry).

TPU-native formulation: there is no eager observer graph rewrite — instead
a flax *method interceptor* fake-quantizes the input of every Conv/Dense
call (symmetric per-tensor int8), and a straight-through-estimator
``fake_quant_ste`` makes the same transform differentiable for QAT. XLA
fuses the quantize->dequantize pair into the neighboring ops, so simulated
int8 costs one extra VPU round per layer.

* PTQ: :func:`calibrate_activations` runs calibration batches eagerly and
  records per-layer absmax -> scales; :func:`apply_with_activation_quant`
  evaluates with those scales (or dynamic per-batch scales).
* QAT: :func:`qat_apply` fake-quantizes weights AND activations inside the
  train step with STE gradients; drop it into any existing train loop.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fake_quant_ste",
    "fake_quant_params_ste",
    "calibrate_activations",
    "apply_with_activation_quant",
    "qat_apply",
]

_QUANT_LAYERS = (nn.Conv, nn.ConvTranspose, nn.Dense)


def _fq(x: jax.Array, scale: jax.Array) -> jax.Array:
    s = jnp.maximum(scale, 1e-8)
    return jnp.clip(jnp.round(x / s), -127, 127) * s


@jax.custom_vjp
def fake_quant_ste(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 fake-quant with straight-through gradients."""
    return _fq(x, scale)


def _fq_fwd(x, scale):
    s = jnp.maximum(scale, 1e-8)
    q = jnp.round(x / s)
    return jnp.clip(q, -127, 127) * s, (q,)


def _fq_bwd(res, g):
    # STE with range gating (torch FakeQuantize backward): gradients pass
    # straight through INSIDE the quant range and are zeroed where the
    # forward clipped — otherwise saturated outliers keep receiving
    # identity gradients and QAT drifts.
    (q,) = res
    in_range = (q >= -127) & (q <= 127)
    return jnp.where(in_range, g, jnp.zeros_like(g)), jnp.zeros(())


fake_quant_ste.defvjp(_fq_fwd, _fq_bwd)


def fake_quant_params_ste(params: Any, min_size: int = 1024) -> Any:
    """QAT weight path: per-output-channel symmetric int8 fake-quant of
    conv/dense kernels with STE gradients (mirrors ``quantize_weights``)."""

    def q(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name not in ("kernel", "embedding") or leaf.size < min_size:
            return leaf
        absmax = jnp.max(
            jnp.abs(jax.lax.stop_gradient(leaf)),
            axis=tuple(range(leaf.ndim - 1)),
        )
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        # per-channel STE: vmap the scalar-scale primitive over channels
        moved = jnp.moveaxis(leaf, -1, 0)
        qv = jax.vmap(fake_quant_ste)(
            moved.reshape(moved.shape[0], -1), scale
        ).reshape(moved.shape)
        return jnp.moveaxis(qv, 0, -1)

    return jax.tree_util.tree_map_with_path(q, params)


def _module_path(context) -> str:
    return "/".join(str(p) for p in context.module.path)


def _interceptor(
    scales: Optional[Dict[str, Any]],
    collect: Optional[Dict[str, Any]],
    ste: bool,
):
    def interceptor(next_fun, args, kwargs, context):
        if (
            context.method_name == "__call__"
            and isinstance(context.module, _QUANT_LAYERS)
            and args
            # numpy too: eager calibration feeds the FIRST layer the raw
            # host batch, and skipping it would leave that layer with no
            # calibrated scale while jitted eval quantizes it dynamically
            and isinstance(args[0], (jax.Array, np.ndarray))
        ):
            x = jnp.asarray(args[0])
            path = _module_path(context)
            if collect is not None:
                absmax = jnp.max(jnp.abs(x))
                prev = collect.get(path)
                collect[path] = (
                    absmax if prev is None else jnp.maximum(prev, absmax)
                )
            else:
                if scales is not None and path in scales:
                    s = jnp.asarray(scales[path]) / 127.0
                else:  # dynamic per-batch fallback
                    s = jnp.max(jnp.abs(jax.lax.stop_gradient(x))) / 127.0
                x = fake_quant_ste(x, s) if ste else _fq(x, s)
                args = (x,) + args[1:]
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate_activations(
    apply_fn: Callable, variables: Any, batches, **apply_kwargs
) -> Dict[str, Any]:
    """PTQ observer pass: run calibration batches EAGERLY (not under jit —
    the collected absmax dict is host state) and return per-layer absmax
    scales keyed by module path."""
    collect: Dict[str, Any] = {}
    for batch in batches:
        with nn.intercept_methods(_interceptor(None, collect, ste=False)):
            apply_fn(variables, batch, **apply_kwargs)
    return {k: jnp.asarray(v) for k, v in collect.items()}


def apply_with_activation_quant(
    apply_fn: Callable,
    variables: Any,
    *args,
    scales: Optional[Dict[str, Any]] = None,
    **kwargs,
):
    """Evaluate with fake-quantized activations (calibrated ``scales`` or
    dynamic per-batch). Jittable."""
    with nn.intercept_methods(_interceptor(scales, None, ste=False)):
        return apply_fn(variables, *args, **kwargs)


def qat_apply(
    apply_fn: Callable,
    variables: Dict[str, Any],
    *args,
    scales: Optional[Dict[str, Any]] = None,
    **kwargs,
):
    """QAT forward: fake-quant weights (per-channel) and activations
    (per-tensor) with STE gradients. Use inside a train step:

        def loss_fn(params, batch, key):
            logits = qat_apply(
                model.apply, {"params": params, **rest}, batch["image"],
                train=True, rngs={"dropout": key},
            )
            ...
    """
    variables = dict(variables)
    if "params" in variables:
        variables["params"] = fake_quant_params_ste(variables["params"])
    with nn.intercept_methods(_interceptor(scales, None, ste=True)):
        return apply_fn(variables, *args, **kwargs)
