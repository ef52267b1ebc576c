"""Detection/segmentation zoo: exact param-count match against the
reference's weight metadata (architecture-wiring proof), plus forward
smoke for the newly-registered SSD/SSDlite/FCOS/mobilenet-FRCNN builders."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

DETECTION_PARAM_MODELS = [
    "fasterrcnn_resnet50_fpn",
    "fasterrcnn_resnet50_fpn_v2",
    "fasterrcnn_mobilenet_v3_large_fpn",
    "fasterrcnn_mobilenet_v3_large_320_fpn",
    "maskrcnn_resnet50_fpn",
    "maskrcnn_resnet50_fpn_v2",
    "keypointrcnn_resnet50_fpn",
    "retinanet_resnet50_fpn",
    "retinanet_resnet50_fpn_v2",
    "ssd300_vgg16",
    "ssdlite320_mobilenet_v3_large",
    "fcos_resnet50_fpn",
    "fcn_resnet50",
    "fcn_resnet101",
    "deeplabv3_resnet50",
    "deeplabv3_resnet101",
    "deeplabv3_mobilenet_v3_large",
    "lraspp_mobilenet_v3_large",
]


@pytest.mark.parametrize("name", DETECTION_PARAM_MODELS)
def test_detection_param_count_matches_meta(name):
    from vision_tpu.models import get_model, get_model_weights
    from vision_tpu.models._utils import abstract_init

    with abstract_init():  # shape-only init: no compute, fast
        m = get_model(name)
    enum = get_model_weights(name)
    flat, _ = jax.tree_util.tree_flatten(m.variables["params"])
    n = sum(int(np.prod(l.shape)) for l in flat)
    assert n == enum.DEFAULT.meta["num_params"], name


@pytest.mark.slow
def test_fasterrcnn_mobilenet_forward():
    from vision_tpu.models import get_model
    from vision_tpu.models._utils import fast_init

    with fast_init():
        m = get_model("fasterrcnn_mobilenet_v3_large_320_fpn")
    det = m(jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert det.boxes.shape[0] == 1 and det.boxes.shape[-1] == 4
