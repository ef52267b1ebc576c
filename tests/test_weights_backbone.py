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


def test_ssdlite_weights_backbone_loads_full_tail():
    """ImageNet MobileNetV3-Large (FULL tail — the reference builds
    reduce_tail only when weights_backbone is None, ssdlite.py:282) loads
    into the split extractor: classification features.13.block.* keys
    remap across the C4 split."""
    tv = load_reference()
    import torch

    import jax.numpy as jnp

    from vision_tpu.models._utils import init_variables
    from vision_tpu.models.detection.backbone_utils import (
        _ssdlite_trunk_map,
    )
    from vision_tpu.models.detection.ssdlite import SSDLite

    torch.manual_seed(0)
    sd = _np_sd(tv.models.mobilenet_v3_large())  # full-tail checkpoint
    module = SSDLite(num_classes=5, reduced_tail=False)
    with fast_init():
        variables = init_variables(
            module, jax.random.PRNGKey(0),
            jnp.zeros((1, 320, 320, 3), jnp.float32),
        )
    new = load_backbone_state_dict(
        dict(variables), sd, trunk_map=_ssdlite_trunk_map,
        body_key="features",
    )
    p = new["params"]["backbone"]
    # stem conv
    np.testing.assert_allclose(
        np.asarray(p["features.0.0"]["0"]["kernel"]),
        sd["features.0.0.weight"].transpose(2, 3, 1, 0), rtol=1e-6,
    )
    # C4 expansion landed on the features.0 side of the split
    np.testing.assert_allclose(
        np.asarray(p["features.0.13.0"]["kernel"]),
        sd["features.13.block.0.0.weight"].transpose(2, 3, 1, 0), rtol=1e-6,
    )
    # C4 depthwise landed on the features.1 side (re-indexed block.1 -> 0)
    np.testing.assert_allclose(
        np.asarray(p["features.1.0.0.0"]["kernel"]),
        sd["features.13.block.1.0.weight"].transpose(2, 3, 1, 0), rtol=1e-6,
    )
    # a post-C4 block shifted to features.1.(K-13)
    np.testing.assert_allclose(
        np.asarray(p["features.1.1"]["block.0.0"]["kernel"]),
        sd["features.14.block.0.0.weight"].transpose(2, 3, 1, 0), rtol=1e-6,
    )
