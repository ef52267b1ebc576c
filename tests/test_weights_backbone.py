"""weights_backbone: loading a CLASSIFICATION checkpoint into a detection
trunk (reference builders' ``weights_backbone=`` parameter,
``backbone_utils.py _resnet_fpn_extractor``). Uses the actual reference
torchvision's state_dict key spaces as the source of truth."""

from __future__ import annotations

import numpy as np
import pytest

import jax

from tests._reference_import import load_reference
from vision_tpu.models import get_model
from vision_tpu.models._utils import fast_init
from vision_tpu.models.detection.backbone_utils import load_backbone_state_dict


def _np_sd(torch_model):
    return {k: v.numpy() for k, v in torch_model.state_dict().items()}


def test_resnet_backbone_loads_into_retinanet():
    tv = load_reference()
    import torch

    torch.manual_seed(0)
    sd = _np_sd(tv.models.resnet50())
    with fast_init():
        m = get_model("retinanet_resnet50_fpn", num_classes=5)
    new = load_backbone_state_dict(dict(m.variables), sd)

    # conv1 kernel transferred (OIHW -> HWIO)
    got = np.asarray(new["params"]["backbone"]["body"]["conv1"]["kernel"])
    want = sd["conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # BN entries landed in the FrozenBatchNorm buffers
    fr = new["frozen"]["backbone"]["body"]["layer1.0"]
    key = [k for k in fr if k.startswith("bn")][0]
    np.testing.assert_allclose(
        np.asarray(fr[key]["running_var"]), sd[f"layer1.0.{key}.running_var"]
    )
    # non-backbone params untouched
    h0 = jax.tree_util.tree_leaves(m.variables["params"]["head"])[0]
    h1 = jax.tree_util.tree_leaves(new["params"]["head"])[0]
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))


def test_mobilenet_backbone_loads_into_frcnn():
    tv = load_reference()
    import torch

    torch.manual_seed(0)
    sd = _np_sd(tv.models.mobilenet_v3_large())
    with fast_init():
        m = get_model("fasterrcnn_mobilenet_v3_large_320_fpn", num_classes=5)

    def mmap(k):
        return (
            "backbone.body." + k[len("features."):]
            if k.startswith("features.")
            else None
        )

    new = load_backbone_state_dict(dict(m.variables), sd, trunk_map=mmap)
    got = np.asarray(
        new["params"]["backbone"]["body.0"]["0"]["kernel"]
    )
    want = sd["features.0.0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_vgg_backbone_loads_into_ssd():
    tv = load_reference()
    import torch

    torch.manual_seed(0)
    sd = _np_sd(tv.models.vgg16())
    with fast_init():
        m = get_model("ssd300_vgg16", num_classes=5)

    def vmap(k):
        return "backbone." + k if k.startswith("features.") else None

    new = load_backbone_state_dict(
        dict(m.variables), sd, trunk_map=vmap, body_key="features"
    )
    got = np.asarray(new["params"]["backbone"]["features.0"]["kernel"])
    want = sd["features.0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_coverage_guard_rejects_wrong_keyspace():
    tv = load_reference()
    import torch

    torch.manual_seed(0)
    sd = _np_sd(tv.models.mobilenet_v3_small())  # wrong family for resnet
    with fast_init():
        m = get_model("retinanet_resnet50_fpn", num_classes=5)
    with pytest.raises(ValueError, match="does not match"):
        load_backbone_state_dict(dict(m.variables), sd)


def test_ssdlite_weights_backbone_rejected():
    with pytest.raises(ValueError, match="weights_backbone"):
        with fast_init():
            get_model(
                "ssdlite320_mobilenet_v3_large",
                num_classes=5,
                weights_backbone="MobileNet_V3_Large_Weights.IMAGENET1K_V1",
            )
