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
