"""ResNet parity: torch reference (random weights) -> converter -> flax,
logits must match (the reference validates builders against golden pkl
outputs, ``test/test_models.py:134``; our golden source is a live torch
transcription)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_refs import randomize_bn_stats, torch_resnet18, torch_resnet50
from vision_tpu._torch_convert import convert_torch_state_dict
from vision_tpu.models import resnet as R


def _convert_and_compare(torch_model, flax_model, atol=2e-4, size=64):
    torch_model.eval()
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_torch_state_dict(sd, flax_model.variables)
    x = np.random.RandomState(0).rand(2, size, size, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    module = flax_model.module
    fwd = jax.jit(lambda v, t: module.apply(v, t, train=False))
    out = np.asarray(fwd(variables, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-4)


def _abstract_build(builder, **kwargs):
    """Builder under abstract_init: oracle tests overwrite every variable
    with converted torch weights, so real flax init is wasted work."""
    from vision_tpu.models._utils import abstract_init

    with abstract_init():
        return builder(**kwargs)


def test_resnet18_matches_torch():
    tm = randomize_bn_stats(torch_resnet18(num_classes=10))
    fm = _abstract_build(R.resnet18, num_classes=10)
    _convert_and_compare(tm, fm)


def test_resnet50_matches_torch():
    tm = randomize_bn_stats(torch_resnet50(num_classes=10))
    fm = _abstract_build(R.resnet50, num_classes=10)
    _convert_and_compare(tm, fm)


def test_resnet_param_counts():
    """num_params metadata must match actual parameter count
    (reference test_extended_models.py weight-meta validation)."""
    for builder, enum in [
        (R.resnet18, R.ResNet18_Weights),
        (R.resnet50, R.ResNet50_Weights),
    ]:
        m = _abstract_build(builder)
        flat, _ = jax.tree_util.tree_flatten(m.variables["params"])
        n = sum(int(np.prod(l.shape)) for l in flat)
        assert n == enum.DEFAULT.meta["num_params"]


def test_resnet_train_mode_updates_stats():
    m = R.resnet18(num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    out, updates = m(x, train=True)
    assert out.shape == (2, 4)
    assert "batch_stats" in updates
    # stats actually moved
    before = m.variables["batch_stats"]["bn1"]["mean"]
    after = updates["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_registry():
    from vision_tpu.models import get_model, list_models

    names = list_models()
    assert "resnet50" in names and "resnext50_32x4d" in names
    m = get_model("resnet18", num_classes=7)
    x = jnp.zeros((1, 32, 32, 3))
    assert m(x).shape == (1, 7)


def test_return_features():
    m = R.resnet18(num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    _, feats = m(x, return_features=True)
    assert set(feats.keys()) == {"layer1", "layer2", "layer3", "layer4"}
    assert feats["layer4"].shape == (1, 2, 2, 512)


def test_mobilenet_v2_matches_torch():
    from tests.torch_refs import TorchMobileNetV2

    from vision_tpu.models import mobilenet_v2

    tm = randomize_bn_stats(TorchMobileNetV2(num_classes=10))
    fm = _abstract_build(mobilenet_v2, num_classes=10)
    _convert_and_compare(tm, fm, atol=5e-4)


def test_efficientnet_b0_matches_torch():
    from tests.torch_refs import TorchEfficientNetB0

    from vision_tpu.models import efficientnet_b0

    tm = randomize_bn_stats(TorchEfficientNetB0(num_classes=10))
    fm = _abstract_build(efficientnet_b0, num_classes=10)
    _convert_and_compare(tm, fm, atol=1e-3)


def test_shufflenet_v2_matches_torch():
    from tests.torch_refs import TorchShuffleNetV2

    from vision_tpu.models import shufflenet_v2_x1_0

    tm = randomize_bn_stats(TorchShuffleNetV2(num_classes=10))
    fm = _abstract_build(shufflenet_v2_x1_0, num_classes=10)
    _convert_and_compare(tm, fm, atol=5e-4)


def test_r3d_18_matches_torch():
    from tests.torch_refs import TorchR3D18

    from vision_tpu.models.video import r3d_18

    tm = randomize_bn_stats(TorchR3D18(num_classes=7))
    tm.eval()
    fm = _abstract_build(r3d_18, num_classes=7)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_torch_state_dict(sd, fm.variables)
    # video input: ours NTHWC, torch NCTHW
    x = np.random.RandomState(0).rand(1, 8, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    out = np.asarray(fm.module.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-4)


def test_densenet121_matches_torch():
    from tests.torch_refs import TorchDenseNet121

    from vision_tpu.models import densenet121

    tm = randomize_bn_stats(TorchDenseNet121(num_classes=10))
    fm = _abstract_build(densenet121, num_classes=10)
    _convert_and_compare(tm, fm, atol=1e-3)


def test_vgg11_matches_torch():
    """VGG's classifier flattens CHW-ordered features — exercises the
    CHW->HWC Linear-reorder conversion hook."""
    from tests.torch_refs import TorchVGG11

    from vision_tpu.models import vgg11

    tm = TorchVGG11(num_classes=10)
    tm.eval()
    fm = _abstract_build(vgg11, num_classes=10)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_torch_state_dict(sd, fm.variables)
    x = np.random.RandomState(0).rand(1, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(fm.module.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-4)
