"""Quantized weights enums (reference ``models/quantization/*.py``):
enum surface, registry resolution, meta content, and builder wiring."""

import pytest

from vision_tpu.models import get_model_weights, get_weight
from vision_tpu.models import quantization as q

ENUMS = {
    "quantized_googlenet": q.GoogLeNet_QuantizedWeights,
    "quantized_inception_v3": q.Inception_V3_QuantizedWeights,
    "quantized_mobilenet_v2": q.MobileNet_V2_QuantizedWeights,
    "quantized_mobilenet_v3_large": q.MobileNet_V3_Large_QuantizedWeights,
    "quantized_resnet18": q.ResNet18_QuantizedWeights,
    "quantized_resnet50": q.ResNet50_QuantizedWeights,
    "quantized_resnext101_32x8d": q.ResNeXt101_32X8D_QuantizedWeights,
    "quantized_resnext101_64x4d": q.ResNeXt101_64X4D_QuantizedWeights,
    "quantized_shufflenet_v2_x0_5": q.ShuffleNet_V2_X0_5_QuantizedWeights,
    "quantized_shufflenet_v2_x1_0": q.ShuffleNet_V2_X1_0_QuantizedWeights,
    "quantized_shufflenet_v2_x1_5": q.ShuffleNet_V2_X1_5_QuantizedWeights,
    "quantized_shufflenet_v2_x2_0": q.ShuffleNet_V2_X2_0_QuantizedWeights,
}


@pytest.mark.parametrize("name", sorted(ENUMS))
def test_get_model_weights_resolves(name):
    assert get_model_weights(name) is ENUMS[name]


def test_get_weight_by_string():
    m = get_weight("ResNet50_QuantizedWeights.IMAGENET1K_FBGEMM_V2")
    assert m is q.ResNet50_QuantizedWeights.IMAGENET1K_FBGEMM_V2


@pytest.mark.parametrize("name", sorted(ENUMS))
def test_meta_content(name):
    for member in ENUMS[name]:
        meta = member.meta
        # _ops/_file_size merged from _meta_extra (reference-published)
        assert meta["_ops"] > 0 and meta["_file_size"] > 0
        assert meta["backend"] in ("fbgemm", "qnnpack")
        # unquantized link points at a float enum member with same params
        unq = meta["unquantized"]
        assert unq.meta["num_params"] == meta["num_params"]
        # int8 checkpoints are smaller than float (mobilenet_v3_large's
        # qnnpack QAT checkpoint carries extra observer state: ~equal)
        assert meta["_file_size"] <= unq.meta["_file_size"] * 1.05
        acc = meta["_metrics"]["ImageNet-1K"]["acc@1"]
        unq_acc = unq.meta["_metrics"]["ImageNet-1K"]["acc@1"]
        # PTQ/QAT costs a few points at most (worst: shufflenet x0_5,
        # 57.972 vs 60.552 = 2.58)
        assert abs(acc - unq_acc) < 3.0, (acc, unq_acc)


def test_builder_accepts_enum_name_string():
    # weights as string resolves through verify(); no URL fetch happens
    # for weights=None, and we don't fetch here either — just check the
    # plumbing raises nothing before the (network-gated) state-dict load.
    import inspect

    builder = __import__(
        "vision_tpu.models", fromlist=["get_model_builder"]
    ).get_model_builder("quantized_resnet18")
    ann = inspect.signature(builder).parameters["weights"].annotation
    assert "ResNet18_QuantizedWeights" in str(ann)


def test_builder_quantizes_by_default():
    from vision_tpu.models import get_model
    from vision_tpu.models.quantization import QuantizedVisionModel

    m = get_model("quantized_shufflenet_v2_x0_5")
    assert isinstance(m, QuantizedVisionModel)
    f = get_model("quantized_shufflenet_v2_x0_5", quantize=False)
    assert not isinstance(f, QuantizedVisionModel)
