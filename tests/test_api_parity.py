"""API-surface parity lock-in: every public name the reference exports
from ops / transforms.v2 / transforms.v2.functional / tv_tensors exists
here. Uses a frozen snapshot of the reference's export lists (so the test
doesn't depend on /root/reference at runtime)."""

import numpy as np


REF_OPS = """
Conv2dNormActivation Conv3dNormActivation DeformConv2d DropBlock2d
DropBlock3d FeaturePyramidNetwork FrozenBatchNorm2d MLP MultiScaleRoIAlign
PSRoIAlign PSRoIPool Permute RoIAlign RoIPool SqueezeExcitation
StochasticDepth batched_nms box_area box_convert box_iou
clip_boxes_to_image complete_box_iou complete_box_iou_loss deform_conv2d
distance_box_iou distance_box_iou_loss drop_block2d drop_block3d
generalized_box_iou generalized_box_iou_loss masks_to_boxes nms
ps_roi_align ps_roi_pool remove_small_boxes roi_align roi_pool
sigmoid_focal_loss stochastic_depth
""".split()

REF_TV_TENSORS = """
BoundingBoxes BoundingBoxFormat Image KeyPoints Mask TVTensor Video
is_rotated_bounding_format set_return_type wrap
""".split()

REF_V2_CLASSES = """
AugMix AutoAugment AutoAugmentPolicy CenterCrop ClampBoundingBoxes
ClampKeyPoints ColorJitter Compose ConvertBoundingBoxFormat
ConvertImageDtype CutMix ElasticTransform FiveCrop GaussianBlur
GaussianNoise Grayscale Identity InterpolationMode JPEG Lambda
LinearTransformation MixUp Normalize PILToTensor Pad RGB RandAugment
RandomAdjustSharpness RandomAffine RandomApply RandomAutocontrast
RandomChannelPermutation RandomChoice RandomCrop RandomEqualize
RandomErasing RandomGrayscale RandomHorizontalFlip RandomInvert
RandomIoUCrop RandomOrder RandomPerspective RandomPhotometricDistort
RandomPosterize RandomResize RandomResizedCrop RandomRotation
RandomShortestSize RandomSolarize RandomVerticalFlip RandomZoomOut Resize
SanitizeBoundingBoxes SanitizeKeyPoints ScaleJitter SetClampingMode
TenCrop ToDtype ToImage ToPILImage ToPureTensor ToTensor Transform
TrivialAugmentWide UniformTemporalSubsample check_type get_bounding_boxes
get_keypoints has_all has_any query_chw query_size
""".split()

REF_V2_FUNCTIONAL = """
adjust_brightness adjust_contrast adjust_gamma adjust_hue
adjust_saturation adjust_sharpness affine autocontrast center_crop
clamp_bounding_boxes clamp_keypoints convert_bounding_box_format
convert_image_dtype crop elastic elastic_transform equalize erase
five_crop gaussian_blur gaussian_noise get_dimensions
get_image_num_channels get_image_size get_num_channels get_num_frames
get_size grayscale_to_rgb hflip horizontal_flip invert jpeg normalize pad
perspective pil_to_tensor posterize resize resized_crop rgb_to_grayscale
rotate sanitize_bounding_boxes sanitize_keypoints solarize ten_crop
to_dtype to_grayscale to_image to_pil_image to_tensor
uniform_temporal_subsample vertical_flip vflip is_pure_tensor
register_kernel resize_image resize_video resize_mask
resize_bounding_boxes pad_video rgb_to_grayscale_image
""".split()


REF_IO = """
ImageReadMode decode_avif decode_gif decode_heic decode_image decode_jpeg
decode_png decode_webp encode_jpeg encode_png read_file read_image
write_file write_jpeg write_png read_video write_video
read_video_timestamps VideoReader
""".split()


REF_UTILS = """
make_grid save_image draw_bounding_boxes draw_segmentation_masks
draw_keypoints flow_to_image
""".split()

REF_V1_CLASSES = """
Compose ToTensor PILToTensor ConvertImageDtype ToPILImage Normalize Resize
CenterCrop Pad Lambda RandomApply RandomChoice RandomOrder RandomCrop
RandomHorizontalFlip RandomVerticalFlip RandomResizedCrop FiveCrop TenCrop
LinearTransformation ColorJitter RandomRotation RandomAffine Grayscale
RandomGrayscale RandomPerspective RandomErasing GaussianBlur
InterpolationMode RandomInvert RandomPosterize RandomSolarize
RandomAdjustSharpness RandomAutocontrast RandomEqualize ElasticTransform
""".split()


REF_MODELS_SUBMODULES = {
    "detection": """
FCOS FCOS_ResNet50_FPN_Weights FasterRCNN
FasterRCNN_MobileNet_V3_Large_320_FPN_Weights
FasterRCNN_MobileNet_V3_Large_FPN_Weights FasterRCNN_ResNet50_FPN_V2_Weights
FasterRCNN_ResNet50_FPN_Weights KeypointRCNN
KeypointRCNN_ResNet50_FPN_Weights MaskRCNN MaskRCNN_ResNet50_FPN_V2_Weights
MaskRCNN_ResNet50_FPN_Weights RetinaNet RetinaNet_ResNet50_FPN_V2_Weights
RetinaNet_ResNet50_FPN_Weights SSD300_VGG16_Weights
SSDLite320_MobileNet_V3_Large_Weights fasterrcnn_mobilenet_v3_large_320_fpn
fasterrcnn_mobilenet_v3_large_fpn fasterrcnn_resnet50_fpn
fasterrcnn_resnet50_fpn_v2 fcos_resnet50_fpn keypointrcnn_resnet50_fpn
maskrcnn_resnet50_fpn maskrcnn_resnet50_fpn_v2 retinanet_resnet50_fpn
retinanet_resnet50_fpn_v2 ssd300_vgg16 ssdlite320_mobilenet_v3_large
""",
    "segmentation": """
DeepLabV3 DeepLabV3_MobileNet_V3_Large_Weights DeepLabV3_ResNet101_Weights
DeepLabV3_ResNet50_Weights FCN FCN_ResNet101_Weights FCN_ResNet50_Weights
LRASPP LRASPP_MobileNet_V3_Large_Weights deeplabv3_mobilenet_v3_large
deeplabv3_resnet101 deeplabv3_resnet50 fcn_resnet101 fcn_resnet50
lraspp_mobilenet_v3_large
""",
    "video": """
MC3_18_Weights MViT MViT_V1_B_Weights MViT_V2_S_Weights R2Plus1D_18_Weights
R3D_18_Weights S3D S3D_Weights Swin3D_B_Weights Swin3D_S_Weights
Swin3D_T_Weights SwinTransformer3d VideoResNet mc3_18 mvit_v1_b mvit_v2_s
r2plus1d_18 r3d_18 s3d swin3d_b swin3d_s swin3d_t
""",
    "optical_flow": """
RAFT Raft_Large_Weights Raft_Small_Weights raft_large raft_small
""",
    "quantization": """
GoogLeNet_QuantizedWeights Inception_V3_QuantizedWeights
MobileNet_V2_QuantizedWeights MobileNet_V3_Large_QuantizedWeights
ResNeXt101_32X8D_QuantizedWeights ResNeXt101_64X4D_QuantizedWeights
ResNet18_QuantizedWeights ResNet50_QuantizedWeights
ShuffleNet_V2_X0_5_QuantizedWeights ShuffleNet_V2_X1_0_QuantizedWeights
ShuffleNet_V2_X1_5_QuantizedWeights ShuffleNet_V2_X2_0_QuantizedWeights
quantized_googlenet quantized_inception_v3 quantized_mobilenet_v2
quantized_mobilenet_v3_large quantized_resnet18 quantized_resnet50
quantized_resnext101_32x8d quantized_resnext101_64x4d
quantized_shufflenet_v2_x0_5 quantized_shufflenet_v2_x1_0
quantized_shufflenet_v2_x1_5 quantized_shufflenet_v2_x2_0
""",
}


def test_models_submodule_surfaces():
    import importlib

    missing = []
    for sub, names in REF_MODELS_SUBMODULES.items():
        mod = importlib.import_module(f"vision_tpu.models.{sub}")
        missing += [
            f"{sub}.{n}" for n in names.split() if not hasattr(mod, n)
        ]
    assert not missing, missing


def test_utils_surface():
    import vision_tpu.utils as U

    missing = [n for n in REF_UTILS if not hasattr(U, n)]
    assert not missing, missing


def test_v1_surface():
    import vision_tpu.transforms as T

    missing = [n for n in REF_V1_CLASSES if not hasattr(T, n)]
    assert not missing, missing


def test_io_surface():
    import vision_tpu.io as io

    missing = [n for n in REF_IO if not hasattr(io, n)]
    assert not missing, missing


def test_ops_surface():
    import vision_tpu.ops as O

    missing = [n for n in REF_OPS if not hasattr(O, n)]
    assert not missing, missing


def test_tv_tensors_surface():
    import vision_tpu.tv_tensors as tv

    missing = [n for n in REF_TV_TENSORS if not hasattr(tv, n)]
    assert not missing, missing


def test_v2_surface():
    from vision_tpu.transforms import v2

    missing = [n for n in REF_V2_CLASSES if not hasattr(v2, n)]
    assert not missing, missing


def test_v2_functional_surface():
    from vision_tpu.transforms.v2 import functional as F

    missing = [n for n in REF_V2_FUNCTIONAL if not hasattr(F, n)]
    assert not missing, missing


# Keyword-signature snapshot of the reference's io / ops / v2.functional
# surfaces (generated once from /root/reference via inspect.signature;
# VERDICT r3 item 9 — parameter gaps like a missing apply_exif_orientation
# must fail a test, not slip through a name-only check). The FIRST
# positional name is exempt (data/img/inpt naming is idiomatic per
# framework); every other reference parameter must be accepted here.
REF_SIGNATURES = {
    "io.decode_jpeg": ["input", "mode", "device", "apply_exif_orientation"],
    "io.decode_png": ["input", "mode", "apply_exif_orientation"],
    "io.decode_image": ["input", "mode", "apply_exif_orientation"],
    "io.read_image": ["path", "mode", "apply_exif_orientation"],
    "io.encode_jpeg": ["input", "quality"],
    "io.encode_png": ["input", "compression_level"],
    "io.write_jpeg": ["input", "filename", "quality"],
    "io.write_png": ["input", "filename", "compression_level"],
    "io.decode_gif": ["input"],
    "io.decode_webp": ["input", "mode"],
    "io.decode_avif": ["input", "mode"],
    "io.decode_heic": ["input", "mode"],
    "io.read_file": ["path"],
    "io.write_file": ["filename", "data"],
    "ops.nms": ["boxes", "scores", "iou_threshold"],
    "ops.batched_nms": ["boxes", "scores", "idxs", "iou_threshold"],
    "ops.roi_align": [
        "input", "boxes", "output_size", "spatial_scale", "sampling_ratio",
        "aligned",
    ],
    "ops.roi_pool": ["input", "boxes", "output_size", "spatial_scale"],
    "ops.ps_roi_align": [
        "input", "boxes", "output_size", "spatial_scale", "sampling_ratio",
    ],
    "ops.ps_roi_pool": ["input", "boxes", "output_size", "spatial_scale"],
    "ops.deform_conv2d": [
        "input", "offset", "weight", "bias", "stride", "padding",
        "dilation", "mask",
    ],
    "ops.box_iou": ["boxes1", "boxes2", "fmt"],
    "ops.generalized_box_iou": ["boxes1", "boxes2"],
    "ops.distance_box_iou": ["boxes1", "boxes2", "eps"],
    "ops.complete_box_iou": ["boxes1", "boxes2", "eps"],
    "ops.box_area": ["boxes", "fmt"],
    "ops.box_convert": ["boxes", "in_fmt", "out_fmt"],
    "ops.clip_boxes_to_image": ["boxes", "size"],
    "ops.remove_small_boxes": ["boxes", "min_size"],
    "ops.masks_to_boxes": ["masks"],
    "ops.sigmoid_focal_loss": [
        "inputs", "targets", "alpha", "gamma", "reduction",
    ],
    "ops.generalized_box_iou_loss": ["boxes1", "boxes2", "reduction", "eps"],
    "ops.distance_box_iou_loss": ["boxes1", "boxes2", "reduction", "eps"],
    "ops.complete_box_iou_loss": ["boxes1", "boxes2", "reduction", "eps"],
    "ops.drop_block2d": [
        "input", "p", "block_size", "inplace", "eps", "training",
    ],
    "ops.drop_block3d": [
        "input", "p", "block_size", "inplace", "eps", "training",
    ],
    "ops.stochastic_depth": ["input", "p", "mode", "training"],
    "F.adjust_brightness": ["inpt", "brightness_factor"],
    "F.adjust_contrast": ["inpt", "contrast_factor"],
    "F.adjust_gamma": ["inpt", "gamma", "gain"],
    "F.adjust_hue": ["inpt", "hue_factor"],
    "F.adjust_saturation": ["inpt", "saturation_factor"],
    "F.adjust_sharpness": ["inpt", "sharpness_factor"],
    "F.affine": [
        "inpt", "angle", "translate", "scale", "shear", "interpolation",
        "fill", "center",
    ],
    "F.autocontrast": ["inpt"],
    "F.center_crop": ["inpt", "output_size"],
    "F.clamp_bounding_boxes": [
        "inpt", "format", "canvas_size", "clamping_mode",
    ],
    "F.clamp_keypoints": ["inpt", "canvas_size"],
    "F.convert_bounding_box_format": [
        "inpt", "old_format", "new_format", "inplace",
    ],
    "F.convert_image_dtype": ["image", "dtype"],
    "F.crop": ["inpt", "top", "left", "height", "width"],
    "F.elastic": ["inpt", "displacement", "interpolation", "fill"],
    "F.equalize": ["inpt"],
    "F.erase": ["inpt", "i", "j", "h", "w", "v", "inplace"],
    "F.five_crop": ["inpt", "size"],
    "F.gaussian_blur": ["inpt", "kernel_size", "sigma"],
    "F.gaussian_noise": ["inpt", "mean", "sigma", "clip"],
    "F.grayscale_to_rgb": ["inpt"],
    "F.horizontal_flip": ["inpt"],
    "F.invert": ["inpt"],
    "F.jpeg": ["image", "quality"],
    "F.normalize": ["inpt", "mean", "std", "inplace"],
    "F.pad": ["inpt", "padding", "fill", "padding_mode"],
    "F.perspective": [
        "inpt", "startpoints", "endpoints", "interpolation", "fill",
        "coefficients",
    ],
    "F.posterize": ["inpt", "bits"],
    "F.resize": ["inpt", "size", "interpolation", "max_size", "antialias"],
    "F.resized_crop": [
        "inpt", "top", "left", "height", "width", "size", "interpolation",
        "antialias",
    ],
    "F.rgb_to_grayscale": ["inpt", "num_output_channels"],
    "F.rotate": ["inpt", "angle", "interpolation", "expand", "center", "fill"],
    "F.sanitize_bounding_boxes": [
        "bounding_boxes", "format", "canvas_size", "min_size", "min_area",
    ],
    "F.sanitize_keypoints": ["key_points", "canvas_size"],
    "F.solarize": ["inpt", "threshold"],
    "F.ten_crop": ["inpt", "size", "vertical_flip"],
    "F.to_dtype": ["inpt", "dtype", "scale"],
    "F.uniform_temporal_subsample": ["inpt", "num_samples"],
    "F.vertical_flip": ["inpt"],
}


def test_keyword_signature_parity():
    import inspect

    import vision_tpu.io as vio
    import vision_tpu.ops as vops
    from vision_tpu.transforms.v2 import functional as vF

    mods = {"io": vio, "ops": vops, "F": vF}
    problems = []
    for key, ref_params in REF_SIGNATURES.items():
        mod_key, name = key.split(".")
        fn = getattr(mods[mod_key], name, None)
        if fn is None:
            problems.append(f"{key}: missing")
            continue
        sig = inspect.signature(fn)
        ours = {p.name for p in sig.parameters.values()}
        has_var_kw = any(
            p.kind == p.VAR_KEYWORD for p in sig.parameters.values()
        )
        missing = [p for p in ref_params[1:] if p not in ours]
        if missing and not has_var_kw:
            problems.append(f"{key}: missing kwargs {missing}")
    assert not problems, "\n".join(problems)


def test_alias_behaviors():
    import jax.numpy as jnp

    from vision_tpu.transforms.v2 import functional as F

    v = jnp.arange(10 * 4 * 4 * 3, dtype=jnp.float32).reshape(10, 4, 4, 3)
    sub = F.uniform_temporal_subsample(v, 5)
    assert sub.shape == (5, 4, 4, 3)
    np.testing.assert_array_equal(sub[0], v[0])
    np.testing.assert_array_equal(sub[-1], v[-1])

    img = jnp.zeros((4, 6, 3), jnp.uint8)
    assert F.get_dimensions(img) == [3, 4, 6]
    assert F.get_image_size(img) == [6, 4]
    np.testing.assert_array_equal(F.hflip(img), F.horizontal_flip(img))
    out = F.to_tensor(np.full((2, 2, 3), 255, np.uint8))
    np.testing.assert_allclose(np.asarray(out), 1.0)
