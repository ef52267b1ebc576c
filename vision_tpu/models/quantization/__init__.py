"""Quantization (reference ``torchvision/models/quantization/`` —
eager-mode PTQ/QAT via torch.ao for googlenet/inception/mobilenet/resnet/
shufflenet).

TPU plan (SURVEY.md §2.6): the torch int8 eager stack has no TPU analog;
the TPU-idiomatic story is AQT-style symmetric int8:

* :func:`quantize_model` — post-training weight quantization: per-output-
  channel symmetric int8 for conv/dense kernels, stored as (int8, scale).
  4x weight-memory reduction; compute runs in bf16/f32 after on-the-fly
  dequant (XLA fuses the rescale into the consumer matmul).
* :func:`simulate_quantization` — fake-quant (quantize->dequantize in
  fp32) for accuracy-impact evaluation, the PTQ analog of the reference's
  eager ``quantize=True`` eval path.

Quantized builders mirror the reference's list: resnet18/50, googlenet,
inception_v3, mobilenet_v2/v3_large, shufflenet_v2_x1_0.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu.models._utils import VisionModel

__all__ = [
    "calibrate_activations",
    "apply_with_activation_quant",
    "fake_quant_ste",
    "fake_quant_params_ste",
    "qat_apply",
    "quantize_weights",
    "dequantize_weights",
    "quantize_model",
    "simulate_quantization",
    "QuantizedVisionModel",
    "GoogLeNet_QuantizedWeights",
    "Inception_V3_QuantizedWeights",
    "MobileNet_V2_QuantizedWeights",
    "MobileNet_V3_Large_QuantizedWeights",
    "ResNeXt101_32X8D_QuantizedWeights",
    "ResNeXt101_64X4D_QuantizedWeights",
    "ResNet18_QuantizedWeights",
    "ResNet50_QuantizedWeights",
    "ShuffleNet_V2_X0_5_QuantizedWeights",
    "ShuffleNet_V2_X1_0_QuantizedWeights",
    "ShuffleNet_V2_X1_5_QuantizedWeights",
    "ShuffleNet_V2_X2_0_QuantizedWeights",
]

_QUANT_MIN_SIZE = 1024  # leave small params (biases, norms) in float


def _is_kernel(path, leaf) -> bool:
    name = str(getattr(path[-1], "key", path[-1]))
    return name in ("kernel", "embedding") and leaf.size >= _QUANT_MIN_SIZE


def quantize_weights(params: Any) -> Tuple[Any, Any]:
    """Per-output-channel symmetric int8 of conv/dense kernels.

    Returns (qparams, scales): qparams has int8 leaves where quantized and
    the original leaves elsewhere; scales has matching float leaves (or
    None markers as 0-size arrays)."""

    def q(path, leaf):
        if not _is_kernel(path, leaf):
            return leaf, jnp.zeros((0,), jnp.float32)
        # output channels are the last dim for both HWIO conv and IO dense
        absmax = jnp.max(jnp.abs(leaf), axis=tuple(range(leaf.ndim - 1)))
        scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        qv = jnp.clip(jnp.round(leaf / scale), -127, 127).astype(jnp.int8)
        return qv, scale.astype(jnp.float32)

    flat = jax.tree_util.tree_map_with_path(q, params)
    qparams = jax.tree_util.tree_map(
        lambda pair: pair[0], flat, is_leaf=lambda x: isinstance(x, tuple)
    )
    scales = jax.tree_util.tree_map(
        lambda pair: pair[1], flat, is_leaf=lambda x: isinstance(x, tuple)
    )
    return qparams, scales


def dequantize_weights(qparams: Any, scales: Any, dtype=jnp.float32) -> Any:
    def dq(qv, scale):
        if qv.dtype == jnp.int8:
            return (qv.astype(dtype) * scale.astype(dtype)).astype(dtype)
        return qv

    return jax.tree_util.tree_map(dq, qparams, scales)


def simulate_quantization(params: Any) -> Any:
    """Fake-quant round trip for accuracy evaluation."""
    q, s = quantize_weights(params)
    return dequantize_weights(q, s)


class QuantizedVisionModel:
    """int8-weight model: stores quantized kernels, dequantizes on the fly
    inside the jitted forward (the rescale fuses into the consumer op).

    Activation quantization (reference PTQ observer flow,
    ``quantization/utils.py:21``): call :meth:`calibrate` with a few
    batches to record per-layer scales, then set ``quantize_activations``
    (or pass none and get dynamic per-batch scales)."""

    def __init__(
        self,
        model: VisionModel,
        compute_dtype=jnp.float32,
        quantize_activations: bool = False,
    ):
        self.module = model.module
        self.compute_dtype = compute_dtype
        variables = dict(model.variables)
        self.qparams, self.scales = quantize_weights(variables.pop("params"))
        self.other_variables = variables
        self.preprocess = model.preprocess
        self.meta = model.meta
        self.quantize_activations = quantize_activations
        self.activation_scales = None

    def _variables(self):
        params = dequantize_weights(
            self.qparams, self.scales, self.compute_dtype
        )
        return {"params": params, **self.other_variables}

    def calibrate(self, batches, **apply_kwargs):
        """PTQ observer pass over calibration batches (run eagerly)."""
        from vision_tpu.models.quantization.activation import (
            calibrate_activations,
        )

        self.activation_scales = calibrate_activations(
            self.module.apply, self._variables(), batches, **apply_kwargs
        )
        self.quantize_activations = True
        return self.activation_scales

    def __call__(self, *inputs, train: bool = False, **kwargs):
        if self.quantize_activations:
            from vision_tpu.models.quantization.activation import (
                apply_with_activation_quant,
            )

            return apply_with_activation_quant(
                self.module.apply,
                self._variables(),
                *inputs,
                scales=self.activation_scales,
                train=train,
                **kwargs,
            )
        return self.module.apply(
            self._variables(), *inputs, train=train, **kwargs
        )

    def memory_bytes(self) -> int:
        flat = jax.tree_util.tree_leaves(self.qparams)
        return sum(l.size * l.dtype.itemsize for l in flat)


def quantize_model(
    model: VisionModel,
    compute_dtype=jnp.float32,
    quantize_activations: bool = False,
) -> QuantizedVisionModel:
    return QuantizedVisionModel(
        model, compute_dtype, quantize_activations=quantize_activations
    )


# --------------------------------------------------------------------------
# Quantized weights enums (reference ``models/quantization/*.py``).
#
# Entry names, urls, metrics, num_params and the ``unquantized`` link are the
# reference's verbatim. ``get_state_dict`` on these entries is NOT the
# fbgemm/qnnpack int8 checkpoint (those are torch-backend-specific packed
# buffers with no TPU representation); the builders instead load the linked
# ``unquantized`` float checkpoint and apply :func:`quantize_model` — PTQ on
# top of the unquantized weights, which is exactly how the reference produced
# these entries (see their recipe strings). ``_ops``/``_file_size`` meta is
# merged from ``models/_meta_extra.py``.
# --------------------------------------------------------------------------

from vision_tpu.models._api import Weights, WeightsEnum  # noqa: E402
from vision_tpu.models.googlenet import GoogLeNet_Weights  # noqa: E402
from vision_tpu.models.inception import Inception_V3_Weights  # noqa: E402
from vision_tpu.models.mobilenetv2 import MobileNet_V2_Weights  # noqa: E402
from vision_tpu.models.mobilenetv3 import (  # noqa: E402
    MobileNet_V3_Large_Weights,
)
from vision_tpu.models.resnet import (  # noqa: E402
    ResNet18_Weights,
    ResNet50_Weights,
    ResNeXt101_32X8D_Weights,
    ResNeXt101_64X4D_Weights,
)
from vision_tpu.models.shufflenetv2 import (  # noqa: E402
    ShuffleNet_V2_X0_5_Weights,
    ShuffleNet_V2_X1_0_Weights,
    ShuffleNet_V2_X1_5_Weights,
    ShuffleNet_V2_X2_0_Weights,
)

_PTQ_RECIPE = (
    "https://github.com/pytorch/vision/tree/main/references/"
    "classification#post-training-quantized-models"
)
_QAT_RECIPE = (
    "https://github.com/pytorch/vision/tree/main/references/"
    "classification#qat-mobilenetv2"
)


def _q_weights(
    url,
    metrics,
    num_params,
    unquantized,
    crop=224,
    resize=256,
    backend="fbgemm",
    recipe=_PTQ_RECIPE,
):
    from vision_tpu.transforms._presets import ImageClassification

    return Weights(
        url=url,
        transforms=functools.partial(
            ImageClassification, crop_size=crop, resize_size=resize
        ),
        meta={
            "min_size": (1, 1),
            "categories": "imagenet-1k",
            "backend": backend,
            "recipe": recipe,
            "num_params": num_params,
            "unquantized": unquantized,
            "_metrics": {"ImageNet-1K": metrics},
        },
    )


class ResNet18_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/resnet18_fbgemm_16fa66dd.pth",
        {"acc@1": 69.494, "acc@5": 88.882}, 11689512,
        ResNet18_Weights.IMAGENET1K_V1,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


class ResNet50_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/resnet50_fbgemm_bf931d71.pth",
        {"acc@1": 75.920, "acc@5": 92.814}, 25557032,
        ResNet50_Weights.IMAGENET1K_V1,
    )
    IMAGENET1K_FBGEMM_V2 = _q_weights(
        "https://download.pytorch.org/models/quantized/resnet50_fbgemm-23753f79.pth",
        {"acc@1": 80.282, "acc@5": 94.976}, 25557032,
        ResNet50_Weights.IMAGENET1K_V2,
        resize=232,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V2


class ResNeXt101_32X8D_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/resnext101_32x8_fbgemm_09835ccf.pth",
        {"acc@1": 78.986, "acc@5": 94.480}, 88791336,
        ResNeXt101_32X8D_Weights.IMAGENET1K_V1,
    )
    IMAGENET1K_FBGEMM_V2 = _q_weights(
        "https://download.pytorch.org/models/quantized/resnext101_32x8_fbgemm-ee16d00c.pth",
        {"acc@1": 82.574, "acc@5": 96.132}, 88791336,
        ResNeXt101_32X8D_Weights.IMAGENET1K_V2,
        resize=232,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V2


class ResNeXt101_64X4D_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/resnext101_64x4d_fbgemm-605a1cb3.pth",
        {"acc@1": 82.898, "acc@5": 96.326}, 83455272,
        ResNeXt101_64X4D_Weights.IMAGENET1K_V1,
        resize=232,
        recipe="https://github.com/pytorch/vision/pull/5935",
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


class GoogLeNet_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/googlenet_fbgemm-c81f6644.pth",
        {"acc@1": 69.826, "acc@5": 89.404}, 6624904,
        GoogLeNet_Weights.IMAGENET1K_V1,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


class Inception_V3_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/inception_v3_google_fbgemm-a2837893.pth",
        {"acc@1": 77.176, "acc@5": 93.354}, 27161264,
        Inception_V3_Weights.IMAGENET1K_V1,
        crop=299, resize=342,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


class MobileNet_V2_QuantizedWeights(WeightsEnum):
    IMAGENET1K_QNNPACK_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/mobilenet_v2_qnnpack_37f702c5.pth",
        {"acc@1": 71.658, "acc@5": 90.150}, 3504872,
        MobileNet_V2_Weights.IMAGENET1K_V1,
        backend="qnnpack", recipe=_QAT_RECIPE,
    )
    DEFAULT = IMAGENET1K_QNNPACK_V1


class MobileNet_V3_Large_QuantizedWeights(WeightsEnum):
    IMAGENET1K_QNNPACK_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/mobilenet_v3_large_qnnpack-5bcacf28.pth",
        {"acc@1": 73.004, "acc@5": 90.858}, 5483032,
        MobileNet_V3_Large_Weights.IMAGENET1K_V1,
        backend="qnnpack", recipe=_QAT_RECIPE,
    )
    DEFAULT = IMAGENET1K_QNNPACK_V1


class ShuffleNet_V2_X0_5_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/shufflenetv2_x0.5_fbgemm-00845098.pth",
        {"acc@1": 57.972, "acc@5": 79.780}, 1366792,
        ShuffleNet_V2_X0_5_Weights.IMAGENET1K_V1,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


class ShuffleNet_V2_X1_0_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/shufflenetv2_x1_fbgemm-1e62bb32.pth",
        {"acc@1": 68.360, "acc@5": 87.582}, 2278604,
        ShuffleNet_V2_X1_0_Weights.IMAGENET1K_V1,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


class ShuffleNet_V2_X1_5_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/shufflenetv2_x1_5_fbgemm-d7401f05.pth",
        {"acc@1": 72.052, "acc@5": 90.700}, 3503624,
        ShuffleNet_V2_X1_5_Weights.IMAGENET1K_V1,
        resize=232,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


class ShuffleNet_V2_X2_0_QuantizedWeights(WeightsEnum):
    IMAGENET1K_FBGEMM_V1 = _q_weights(
        "https://download.pytorch.org/models/quantized/shufflenetv2_x2_0_fbgemm-5cac526c.pth",
        {"acc@1": 75.354, "acc@5": 92.488}, 7393996,
        ShuffleNet_V2_X2_0_Weights.IMAGENET1K_V1,
        resize=232,
    )
    DEFAULT = IMAGENET1K_FBGEMM_V1


_QUANTIZED_WEIGHTS_ENUMS = {
    "resnet18": ResNet18_QuantizedWeights,
    "resnet50": ResNet50_QuantizedWeights,
    "resnext101_32x8d": ResNeXt101_32X8D_QuantizedWeights,
    "resnext101_64x4d": ResNeXt101_64X4D_QuantizedWeights,
    "googlenet": GoogLeNet_QuantizedWeights,
    "inception_v3": Inception_V3_QuantizedWeights,
    "mobilenet_v2": MobileNet_V2_QuantizedWeights,
    "mobilenet_v3_large": MobileNet_V3_Large_QuantizedWeights,
    "shufflenet_v2_x0_5": ShuffleNet_V2_X0_5_QuantizedWeights,
    "shufflenet_v2_x1_0": ShuffleNet_V2_X1_0_QuantizedWeights,
    "shufflenet_v2_x1_5": ShuffleNet_V2_X1_5_QuantizedWeights,
    "shufflenet_v2_x2_0": ShuffleNet_V2_X2_0_QuantizedWeights,
}


def _make_quantized_builder(name):
    from vision_tpu.models._api import get_model_builder, register_model

    weights_enum = _QUANTIZED_WEIGHTS_ENUMS[name]

    def builder(
        *,
        weights=None,
        quantize: bool = True,
        quantize_activations: bool = False,
        **kwargs,
    ):
        if weights is not None and isinstance(weights, WeightsEnum) and not (
            isinstance(weights, weights_enum)
        ):
            base_weights = weights  # float enum passed through untouched
        elif weights is not None:
            weights = weights_enum.verify(weights)
            base_weights = weights.meta["unquantized"]
        else:
            base_weights = None
        base = get_model_builder(name)(weights=base_weights, **kwargs)
        if not quantize:
            return base
        return quantize_model(
            base, quantize_activations=quantize_activations
        )

    builder.__name__ = f"quantized_{name}"
    builder.__annotations__ = {"weights": weights_enum}
    builder.__doc__ = (
        f"int8 weight-quantized {name} (reference "
        f"``torchvision/models/quantization/``). ``weights`` accepts "
        f"{weights_enum.__name__} (loads the linked unquantized float "
        f"checkpoint, then applies PTQ) or the float enum directly."
    )
    return register_model()(builder)


quantized_resnet18 = _make_quantized_builder("resnet18")
quantized_resnet50 = _make_quantized_builder("resnet50")
quantized_googlenet = _make_quantized_builder("googlenet")
quantized_inception_v3 = _make_quantized_builder("inception_v3")
quantized_mobilenet_v2 = _make_quantized_builder("mobilenet_v2")
quantized_mobilenet_v3_large = _make_quantized_builder("mobilenet_v3_large")
quantized_shufflenet_v2_x0_5 = _make_quantized_builder("shufflenet_v2_x0_5")
quantized_shufflenet_v2_x1_0 = _make_quantized_builder("shufflenet_v2_x1_0")
quantized_shufflenet_v2_x1_5 = _make_quantized_builder("shufflenet_v2_x1_5")
quantized_shufflenet_v2_x2_0 = _make_quantized_builder("shufflenet_v2_x2_0")
quantized_resnext101_32x8d = _make_quantized_builder("resnext101_32x8d")
quantized_resnext101_64x4d = _make_quantized_builder("resnext101_64x4d")


from vision_tpu.models.quantization.activation import (  # noqa: E402
    apply_with_activation_quant,
    calibrate_activations,
    fake_quant_params_ste,
    fake_quant_ste,
    qat_apply,
)
