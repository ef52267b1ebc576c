from vision_tpu.models._api import (
    Weights,
    WeightsEnum,
    get_model,
    get_model_builder,
    get_model_weights,
    get_weight,
    list_models,
    register_model,
)
from vision_tpu.models._utils import VisionModel
from vision_tpu.models.resnet import *  # noqa: F401,F403
