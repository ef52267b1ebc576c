"""Deployment export (``vision_tpu/export.py``) — the reference's ONNX
export surface (``test/test_onnx.py``) translated to jax.export/StableHLO:
serialize -> load-without-model-code -> numerical identity, plus shape
polymorphism and multi-platform lowering."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_tpu.export import ExportedModel, export_model, load_exported
from vision_tpu.models import get_model
from vision_tpu.models._utils import fast_init


def _model(name, **kw):
    with fast_init():
        return get_model(name, **kw)


def test_roundtrip_identity(tmp_path):
    vm = _model("resnet18", num_classes=10)
    path = tmp_path / "resnet18.stablehlo"
    exp = export_model(vm, input_shape=(2, 64, 64, 3), path=path)
    assert isinstance(exp, ExportedModel)
    assert path.stat().st_size > 1000  # weights baked into the artifact

    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    want = np.asarray(vm(jnp.asarray(x)))

    loaded = load_exported(path)
    got = np.asarray(loaded(x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # bytes entry point too
    loaded2 = load_exported(path.read_bytes())
    np.testing.assert_allclose(np.asarray(loaded2(x)), want, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_symbolic_batch():
    vm = _model("mobilenet_v3_small", num_classes=10)
    exp = export_model(vm, input_shape=(1, 64, 64, 3), batch_dim="b")
    rng = np.random.RandomState(1)
    for n in (1, 3, 5):
        x = rng.rand(n, 64, 64, 3).astype(np.float32)
        got = np.asarray(exp(x))
        want = np.asarray(vm(jnp.asarray(x)))
        assert got.shape == (n, 10)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_multiplatform_lowering():
    vm = _model("squeezenet1_0", num_classes=10)
    exp = export_model(
        vm, input_shape=(1, 64, 64, 3), platforms=("cpu", "tpu")
    )
    assert exp.platforms == ("cpu", "tpu")
    x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(exp(x)), np.asarray(vm(jnp.asarray(x))),
        rtol=1e-5, atol=1e-5,
    )


def test_apply_kwargs_forwarded():
    vm = _model("resnet18", num_classes=10)
    exp = export_model(
        vm, input_shape=(1, 64, 64, 3), return_features=True
    )
    x = np.random.RandomState(3).rand(1, 64, 64, 3).astype(np.float32)
    out = exp(x)
    want = vm(jnp.asarray(x), return_features=True)
    got_leaves = jax.tree_util.tree_leaves(out)
    want_leaves = jax.tree_util.tree_leaves(want)
    assert len(got_leaves) == len(want_leaves) > 1
    for g, w in zip(got_leaves, want_leaves):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5
        )


@pytest.mark.slow
def test_segmentation_model_exports():
    vm = _model("lraspp_mobilenet_v3_large", num_classes=5)
    exp = export_model(vm, input_shape=(1, 64, 64, 3))
    x = np.random.RandomState(4).rand(1, 64, 64, 3).astype(np.float32)
    out = exp(x)
    want = vm(jnp.asarray(x))
    got_l = jax.tree_util.tree_leaves(out)
    want_l = jax.tree_util.tree_leaves(want)
    for g, w in zip(got_l, want_l):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4
        )


def test_name_entry_point():
    exp = export_model(
        "shufflenet_v2_x0_5", input_shape=(1, 64, 64, 3)
    )
    x = np.zeros((1, 64, 64, 3), np.float32)
    assert np.asarray(exp(x)).shape == (1, 1000)


@pytest.mark.slow
def test_detection_model_exports():
    # static-shape NMS/anchors/postprocess make even the detection stack a
    # single exportable XLA program — the capability the reference needs
    # ONNX symbolics for (ops/_register_onnx_ops.py).
    vm = _model("ssdlite320_mobilenet_v3_large", num_classes=5)
    exp = export_model(vm, input_shape=(1, 320, 320, 3))
    x = np.random.RandomState(5).rand(1, 320, 320, 3).astype(np.float32)
    out = exp(x)
    want = vm(jnp.asarray(x))
    got_l = jax.tree_util.tree_leaves(out)
    want_l = jax.tree_util.tree_leaves(want)
    assert len(got_l) == len(want_l)
    for g, w in zip(got_l, want_l):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=1e-4
        )
