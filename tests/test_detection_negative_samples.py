"""Negative-sample detection tests (reference
``test_models_detection_negative_samples.py``): training losses must be
finite and well-defined when an image has NO ground-truth boxes — in the
static-shape world that is an all-False valid mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _empty_gt(n=1, g=4, canvas=64):
    boxes = jnp.zeros((n, g, 4), jnp.float32)
    labels = jnp.zeros((n, g), jnp.int32)
    valid = jnp.zeros((n, g), bool)
    return boxes, labels, valid


@pytest.mark.slow
def test_faster_rcnn_negative_sample():
    from vision_tpu.models.detection.faster_rcnn import FasterRCNN

    m = FasterRCNN(num_classes=5, backbone_depth=18)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), images)
    boxes, labels, valid = _empty_gt()
    losses = m.apply(
        variables, images, boxes, labels, valid, jax.random.PRNGKey(1),
        method="compute_loss",
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # with no positives, the box regression losses must be exactly 0
    assert float(losses["loss_rpn_box_reg"]) == 0.0
    assert float(losses["loss_box_reg"]) == 0.0


def test_retinanet_negative_sample():
    from vision_tpu.models.detection.retinanet import RetinaNet

    m = RetinaNet(num_classes=5)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), images)
    outputs = m.apply(variables, images, train=False)
    boxes, labels, valid = _empty_gt()
    losses = m.apply(
        variables, *outputs, boxes, labels, valid, method="compute_loss"
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["bbox_regression"]) == 0.0


@pytest.mark.slow
def test_ssd_negative_sample():
    from vision_tpu.models.detection.ssd import SSD

    m = SSD(num_classes=5)
    images = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), images)
    outputs = m.apply(variables, images, train=False)
    boxes, labels, valid = _empty_gt()
    losses = m.apply(
        variables, *outputs, boxes, labels, valid, method="compute_loss"
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.filterwarnings("ignore")
@pytest.mark.slow
def test_fcos_negative_sample():
    from vision_tpu.models.detection.fcos import FCOS

    m = FCOS(num_classes=5)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), images)
    logits, reg, ctr, anchors = m.apply(variables, images, train=False)
    boxes, labels, valid = _empty_gt()
    losses = m.apply(
        variables, logits, reg, ctr, anchors, boxes, labels, valid,
        [a.shape[0] for a in anchors],
        method="compute_loss",
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
