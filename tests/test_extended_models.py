"""Weight-meta validation beyond param counts (reference
``test/test_extended_models.py`` + ``common_extended_utils.py:33-113``):
the _ops (GMACs) meta is checked against FLOPs measured from the compiled
XLA executable — no hand-maintained per-op counter table."""

import jax
import numpy as np
import pytest

from vision_tpu.models import get_model, get_model_weights
from vision_tpu.models._ops_count import count_gmacs
from vision_tpu.models._utils import fast_init

OPS_MODELS = [
    "resnet18", "resnet34", "resnet50", "resnet101",
    "resnext50_32x4d", "wide_resnet50_2",
]


@pytest.mark.parametrize("name", OPS_MODELS)
def test_ops_meta_matches_xla_measured(name):
    enum = get_model_weights(name)
    meta_ops = enum.DEFAULT.meta["_ops"]
    with fast_init():
        m = get_model(name)
    measured = count_gmacs(m, (1, 224, 224, 3))
    # XLA folds some elementwise work the reference's table counts; the
    # reference itself allows approximate matches
    assert abs(measured - meta_ops) / meta_ops < 0.08, (
        f"{name}: measured {measured:.3f} GMACs vs meta {meta_ops}"
    )


def test_file_size_meta_present():
    enum = get_model_weights("resnet50")
    for member in enum:
        assert member.meta["_file_size"] > 90  # MB, reference meta
        assert member.meta["_ops"] == 4.089
