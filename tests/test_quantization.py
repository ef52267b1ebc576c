"""int8 weight quantization (reference ``test/test_models_quantized*``
strategy: quantized output close to float output)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.models import get_model
from vision_tpu.models.quantization import (
    dequantize_weights,
    quantize_model,
    quantize_weights,
    simulate_quantization,
)


def test_quantize_roundtrip_error_small(rng):
    params = {"layer": {"kernel": jnp.asarray(rng.randn(64, 32).astype(np.float32))}}
    q, s = quantize_weights(params)
    assert q["layer"]["kernel"].dtype == jnp.int8
    back = dequantize_weights(q, s)
    err = np.abs(np.asarray(back["layer"]["kernel"]) - np.asarray(params["layer"]["kernel"]))
    scale = np.abs(np.asarray(params["layer"]["kernel"])).max(axis=0) / 127
    assert (err <= scale[None, :] * 0.51 + 1e-7).all()


def test_small_params_left_float(rng):
    params = {"bn": {"scale": jnp.ones((8,))}}
    q, s = quantize_weights(params)
    assert q["bn"]["scale"].dtype != jnp.int8


def test_quantized_model_close_to_float(rng):
    m = get_model("resnet18", num_classes=10)
    qm = quantize_model(m)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref = np.asarray(m(x))
    out = np.asarray(qm(x))
    # logits drift a little but ranking should agree
    assert np.abs(out - ref).max() < 0.5
    assert (np.argmax(out, -1) == np.argmax(ref, -1)).all()
    # 4x weight memory reduction on kernels
    flat = jax.tree_util.tree_leaves(m.variables["params"])
    full = sum(l.size * 4 for l in flat)
    assert qm.memory_bytes() < full / 3


def test_quantized_builders_registered():
    from vision_tpu.models import list_models

    names = list_models()
    assert "quantized_resnet18" in names
    assert "quantized_mobilenet_v2" in names


# ------------------------- activation quantization + QAT (round 2) -------
def test_activation_fake_quant_close_and_quantized(rng):
    """PTQ with calibrated activation scales: output close to float, and
    activations really pass through an int8 grid (reference
    test_models_quantized closeness strategy)."""
    from vision_tpu.models.quantization import quantize_model

    m = get_model("resnet18", num_classes=10)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    ref = np.asarray(m(x))

    qm = quantize_model(m, quantize_activations=True)
    scales = qm.calibrate([x])
    assert len(scales) > 10  # one per conv/dense call site
    out = np.asarray(qm(x))
    assert np.abs(out - ref).max() < 1.0
    assert (np.argmax(out, -1) == np.argmax(ref, -1)).all()


@pytest.mark.slow
def test_activation_quant_dynamic_fallback(rng):
    from vision_tpu.models.quantization import quantize_model

    m = get_model("mobilenet_v2", num_classes=10)
    qm = quantize_model(m, quantize_activations=True)  # no calibration
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    out = np.asarray(qm(x))
    assert np.isfinite(out).all()


def test_fake_quant_ste_gradients():
    """STE: d/dx passes through (non-zero grads despite round())."""
    from vision_tpu.models.quantization import fake_quant_ste

    x = jnp.linspace(-1.0, 1.0, 32)
    g = jax.grad(lambda t: jnp.sum(fake_quant_ste(t, jnp.float32(0.01)) ** 2))(x)
    assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.slow
def test_qat_apply_trains(rng):
    """One QAT SGD step reduces the (fake-quantized) loss; grads flow
    through both weight and activation fake-quant."""
    import optax

    from vision_tpu.models.quantization import qat_apply

    m = get_model("resnet18", num_classes=4)
    variables = m.variables
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(np.arange(4) % 4)
    tx = optax.sgd(0.05)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = qat_apply(
            m.module.apply, {"params": p, **rest}, x, train=False
        )
        onehot = jax.nn.one_hot(y, 4)
        return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), -1))

    l0, grads = jax.value_and_grad(loss_fn)(params)
    gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0, "no gradient flow through STE"
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    l1 = loss_fn(params)
    assert float(l1) < float(l0)


def test_new_quantized_builders_registered():
    from vision_tpu.models import list_models

    names = list_models()
    for n in (
        "quantized_resnext101_32x8d",
        "quantized_resnext101_64x4d",
        "quantized_shufflenet_v2_x0_5",
        "quantized_shufflenet_v2_x1_5",
        "quantized_shufflenet_v2_x2_0",
    ):
        assert n in names, n
