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
from vision_tpu.models.alexnet import *  # noqa: F401,F403
from vision_tpu.models.densenet import *  # noqa: F401,F403
from vision_tpu.models.maxvit import *  # noqa: F401,F403
from vision_tpu.models.googlenet import *  # noqa: F401,F403
from vision_tpu.models.inception import *  # noqa: F401,F403
from vision_tpu.models.mnasnet import *  # noqa: F401,F403
from vision_tpu.models.regnet import *  # noqa: F401,F403
from vision_tpu.models.shufflenetv2 import *  # noqa: F401,F403
from vision_tpu.models.squeezenet import *  # noqa: F401,F403
from vision_tpu.models.swin_transformer import *  # noqa: F401,F403
from vision_tpu.models.convnext import *  # noqa: F401,F403
from vision_tpu.models.efficientnet import *  # noqa: F401,F403
from vision_tpu.models.mobilenetv2 import *  # noqa: F401,F403
from vision_tpu.models.mobilenetv3 import *  # noqa: F401,F403
from vision_tpu.models.resnet import *  # noqa: F401,F403
from vision_tpu.models.vgg import *  # noqa: F401,F403
from vision_tpu.models.vision_transformer import *  # noqa: F401,F403
from vision_tpu.models import detection  # noqa: F401
from vision_tpu.models import optical_flow  # noqa: F401
from vision_tpu.models import segmentation  # noqa: F401
from vision_tpu.models import video  # noqa: F401
from vision_tpu.models import quantization  # noqa: F401
from vision_tpu.models.feature_extraction import (  # noqa: F401
    create_feature_extractor,
    get_graph_node_names,
)
