"""Mask R-CNN deform-conv backbone variant (BASELINE config #5).

The reference ships ``deform_conv2d`` but no model consumes it; this
variant puts deformable 3x3s in the trunk's C3-C5 bottlenecks
(detectron2's DCN recipe over the reference op,
``/root/reference/torchvision/ops/deform_conv.py:14-110``). Tests:
zero-init offset predictors make the variant EXACTLY the plain model at
construction (so ImageNet/COCO checkpoints convert losslessly), the
modulated (DCNv2) path deviates only through its sigmoid(0)=0.5 gate,
and a train step moves the deform params (they are live, not shelf-ware).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_tpu.models.detection import (
    maskrcnn_resnet50_fpn,
    maskrcnn_resnet50_fpn_deform,
)
from vision_tpu.models.detection.backbone_utils import (
    _DeformFrozenBottleneck,
    _FrozenBottleneck,
)


def _copy_shared(src_vars, dst_vars, skip_offset: bool = False):
    fs = flax.traverse_util.flatten_dict(dict(src_vars))
    fd = flax.traverse_util.flatten_dict(dict(dst_vars))
    for kk, v in fs.items():
        if skip_offset and any("conv2_offset" in str(k) for k in kk):
            continue  # predictor widths differ between v1 and DCNv2
        assert kk in fd, f"plain leaf {kk} missing from deform tree"
        fd[kk] = v
    return flax.traverse_util.unflatten_dict(fd)


def test_deform_block_equals_plain_at_init():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 16, 256).astype(np.float32))
    plain = _FrozenBottleneck(planes=64, stride=2, downsample=True)
    dfm = _DeformFrozenBottleneck(planes=64, stride=2, downsample=True)
    vp = plain.init(jax.random.PRNGKey(0), x)
    vd = _copy_shared(vp, dfm.init(jax.random.PRNGKey(0), x))
    np.testing.assert_allclose(
        np.asarray(plain.apply(vp, x)),
        np.asarray(dfm.apply(vd, x)),
        atol=2e-5,
    )


def test_deform_block_modulated_gates_at_half():
    """DCNv2: sigmoid(0) = 0.5 modulation at init (detectron2 zero-init
    semantics) — the conv2 branch is halved, not equal."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 256).astype(np.float32))
    plain = _DeformFrozenBottleneck(planes=64, stride=1, downsample=True)
    mod = _DeformFrozenBottleneck(
        planes=64, stride=1, downsample=True, modulated=True
    )
    vp = plain.init(jax.random.PRNGKey(0), x)
    vm = _copy_shared(vp, mod.init(jax.random.PRNGKey(0), x), skip_offset=True)
    out_p = np.asarray(plain.apply(vp, x))
    out_m = np.asarray(mod.apply(vm, x))
    assert not np.allclose(out_p, out_m, atol=1e-3)


def test_deform_maskrcnn_matches_plain_at_init():
    """Shared-trunk conversion parity: every plain-model leaf exists in
    the deform tree under the same name, and with zero-init offsets the
    detections are identical."""
    plain = maskrcnn_resnet50_fpn(num_classes=5)
    dfm = maskrcnn_resnet50_fpn_deform(num_classes=5)
    vd = _copy_shared(plain.variables, dfm.variables)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
    op = plain.module.apply(dict(plain.variables), img)
    od = dfm.module.apply(vd, img)
    np.testing.assert_allclose(
        np.asarray(op.boxes), np.asarray(od.boxes), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(op.scores), np.asarray(od.scores), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(op.masks), np.asarray(od.masks), atol=1e-4
    )


def test_deform_maskrcnn_train_step_moves_offsets():
    """Convergence smoke: one SGD step on the compute_loss pipeline
    produces finite loss and NONZERO gradient through the offset
    predictors (the deform op is on the train hot path)."""
    m = maskrcnn_resnet50_fpn_deform(num_classes=3)
    variables = dict(m.variables)
    params = variables.pop("params")

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    gt_boxes = jnp.asarray([[[8.0, 8.0, 40.0, 40.0], [20.0, 20.0, 60.0, 60.0]]])
    gt_labels = jnp.asarray([[1, 2]])
    gt_valid = jnp.asarray([[True, True]])
    gt_masks = jnp.asarray(
        rng.rand(1, 2, 64, 64).astype(np.float32) > 0.5
    ).astype(jnp.float32)

    def loss_fn(p):
        losses = m.module.apply(
            {"params": p, **variables},
            imgs, gt_boxes, gt_labels, gt_valid,
            jax.random.PRNGKey(0), gt_masks=gt_masks,
            method=m.module.compute_loss,
        )
        return sum(jnp.sum(v) for v in losses.values())

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    flat = flax.traverse_util.flatten_dict(grads)
    off_grads = [
        v for kk, v in flat.items() if any("conv2_offset" in str(k) for k in kk)
    ]
    assert off_grads, "no offset-predictor grads found"
    total = sum(float(jnp.abs(g).sum()) for g in off_grads)
    assert np.isfinite(total) and total > 0.0


def test_deform_builder_registered():
    from vision_tpu.models import get_model, list_models

    assert "maskrcnn_resnet50_fpn_deform" in list_models()
    m = get_model("maskrcnn_resnet50_fpn_deform", num_classes=4)
    out = m(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert out.masks.shape[-2:] == (28, 28)


def _synth_plain_sd(variables):
    """Torch-style state dict synthesized from the plain model's own
    variables (inverse of the `_torch_convert` tensor mappings) — stands
    in for a real checkpoint in this zero-egress sandbox."""
    from vision_tpu._torch_convert import _flatten, _torch_key

    sd = {}
    for coll, tree in dict(variables).items():
        flat = _flatten(tree if isinstance(tree, dict) else dict(tree))
        for path, leaf in flat.items():
            tk, kind = _torch_key(coll, path)
            arr = np.asarray(leaf)
            if kind == "kernel":
                if arr.ndim == 4:    # HWIO -> OIHW
                    arr = arr.transpose(3, 2, 0, 1)
                elif arr.ndim == 2:  # IO -> OI
                    arr = arr.transpose(1, 0)
                elif arr.ndim == 5:  # DHWIO -> OIDHW
                    arr = arr.transpose(4, 3, 0, 1, 2)
                elif arr.ndim == 3:  # WIO -> OIW
                    arr = arr.transpose(2, 1, 0)
            sd[tk] = arr
    return sd


def test_deform_builder_loads_plain_checkpoint(monkeypatch):
    """``weights=`` on the deform builder must not trip the strict
    converter on the checkpoint-absent ``conv2_offset`` predictors: they
    keep their zero init (-> plain-model parity at construction, the
    docstring contract) while every shared leaf loads from the plain
    checkpoint."""
    from vision_tpu.models.detection.mask_rcnn import (
        MaskRCNN_ResNet50_FPN_Weights,
    )

    plain = maskrcnn_resnet50_fpn(num_classes=91)
    sd = _synth_plain_sd(plain.variables)
    monkeypatch.setattr(
        MaskRCNN_ResNet50_FPN_Weights,
        "get_state_dict",
        lambda self, **kw: dict(sd),
    )
    m = maskrcnn_resnet50_fpn_deform(
        weights=MaskRCNN_ResNet50_FPN_Weights.COCO_V1
    )

    fd = flax.traverse_util.flatten_dict(dict(m.variables))
    fp = flax.traverse_util.flatten_dict(dict(plain.variables))
    n_offset = 0
    for kk, v in fd.items():
        if any("conv2_offset" in str(k) for k in kk):
            n_offset += 1
            np.testing.assert_array_equal(np.asarray(v), 0.0)
            continue
        if any("fc6" in str(k) for k in kk):
            continue  # the fc6 CHW->HWC checkpoint hook double-applies on
            # this synthesized (already-flax-ordered) dict; shape-only here
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(fp[kk]), err_msg=str(kk)
        )
    assert n_offset > 0, "no conv2_offset leaves in the deform tree"
