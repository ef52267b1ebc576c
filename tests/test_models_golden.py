"""Golden-file regression over EVERY registered builder (reference
``test/test_models.py:25,134``: 125 pickled expect files, regenerated with
``EXPECTTEST_ACCEPT=1``).

Here: each builder is constructed under ``fast_init`` (deterministic
numpy-Philox parameter materialization — no flax init forward), run jitted
on a tiny deterministic input, and its flattened output leaves are pinned
against ``tests/expect/<name>.npz``. Regenerate with
``VISION_TPU_EXPECT_ACCEPT=1 pytest tests/test_models_golden.py``.

This doubles as a forward-smoke test for all 116 builders: any numeric
drift — a changed default, a reordered op, a dtype slip — fails here.
"""

from __future__ import annotations

import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.models import get_model, list_models
from vision_tpu.models._utils import fast_init

EXPECT_DIR = pathlib.Path(__file__).parent / "expect"
ACCEPT = os.environ.get("VISION_TPU_EXPECT_ACCEPT", "0") == "1"

# per-model input overrides: (shape, kwargs). Classification default is
# (1, 64, 64, 3) + num_classes=10 (reference tiny-input strategy,
# test/test_models.py:399). Architectural minimums force exceptions.
DEFAULT_SHAPE = (1, 64, 64, 3)
CONFIG = {
    # fixed classifier geometries need the native resolution
    "alexnet": ((1, 224, 224, 3), {"num_classes": 10}),
    "inception_v3": ((1, 160, 160, 3), {"num_classes": 10}),
    "quantized_inception_v3": ((1, 160, 160, 3), {"num_classes": 10}),
    "maxvit_t": ((1, 224, 224, 3), {"num_classes": 10}),
    # ViT position embeddings are size-bound
    "vit_b_16": ((1, 224, 224, 3), {"num_classes": 10}),
    "vit_b_32": ((1, 224, 224, 3), {"num_classes": 10}),
    "vit_l_16": ((1, 224, 224, 3), {"num_classes": 10}),
    "vit_l_32": ((1, 224, 224, 3), {"num_classes": 10}),
    "vit_h_14": ((1, 224, 224, 3), {"num_classes": 10}),
}
VGG_SHAPE = ((1, 224, 224, 3), {"num_classes": 10})
VIDEO_SHAPE = ((1, 8, 64, 64, 3), {"num_classes": 10})
MVIT_SHAPE = ((1, 16, 224, 224, 3), {"num_classes": 10})
NO_KWARGS_SHAPE = (DEFAULT_SHAPE, {})


def _config(name):
    if name in CONFIG:
        return CONFIG[name]
    if name.startswith("vgg"):
        return VGG_SHAPE
    if name.startswith(("r3d", "mc3", "r2plus1d", "s3d", "swin3d")):
        return VIDEO_SHAPE
    if name.startswith("mvit"):
        return MVIT_SHAPE
    if name.startswith(
        (
            "fasterrcnn", "maskrcnn", "keypointrcnn", "retinanet", "ssd",
            "fcos", "fcn", "deeplabv3", "lraspp", "raft",
        )
    ):
        return NO_KWARGS_SHAPE
    return (DEFAULT_SHAPE, {"num_classes": 10})


def _forward(name, model, shape):
    x = jnp.asarray(
        np.linspace(0.0, 1.0, int(np.prod(shape)), dtype=np.float32).reshape(
            shape
        )
    )
    if not hasattr(model, "variables"):  # QuantizedVisionModel
        return model(x)
    module, variables = model.module, model.variables
    if name.startswith("raft"):
        fwd = jax.jit(
            lambda v, a: module.apply(v, a, a * 0.5, num_flow_updates=1)
        )
        return fwd(variables, x)
    fwd = jax.jit(lambda v, a: module.apply(v, a, train=False))
    return fwd(variables, x)


# fast smoke subset (one small representative per family group); the
# rest of the 121-builder sweep is `slow` (run with `-m slow` or no -m)
FAST = {
    "resnet18", "mobilenet_v3_small", "efficientnet_b0",
    "shufflenet_v2_x0_5", "squeezenet1_1", "densenet121", "convnext_tiny",
    "swin_t", "vit_b_32", "regnet_y_400mf",
    "fasterrcnn_resnet50_fpn", "fcn_resnet50", "r3d_18", "raft_small",
    "quantized_resnet18",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=() if n in FAST else pytest.mark.slow)
        for n in list_models()
    ],
)
def test_builder_output_pinned(name):
    shape, kwargs = _config(name)
    with fast_init():
        model = get_model(name, **kwargs)
    out = _forward(name, model, shape)
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(out)]
    path = EXPECT_DIR / f"{name}.npz"
    if ACCEPT:
        EXPECT_DIR.mkdir(exist_ok=True)
        np.savez_compressed(path, *leaves)
        return
    if not path.exists():
        pytest.fail(
            f"no golden for {name}; regenerate with "
            "VISION_TPU_EXPECT_ACCEPT=1"
        )
    with np.load(path) as z:
        golden = [z[k] for k in z.files]
    assert len(golden) == len(leaves), (
        f"{name}: output arity changed {len(golden)} -> {len(leaves)}"
    )
    for i, (g, l) in enumerate(zip(golden, leaves)):
        assert g.shape == l.shape, (
            f"{name} leaf {i}: shape {g.shape} -> {l.shape}"
        )
        np.testing.assert_allclose(
            l, g, rtol=1e-3, atol=1e-4, err_msg=f"{name} leaf {i}"
        )
