from vision_tpu.transforms.v2.functional._augment import erase, jpeg
from vision_tpu.transforms.v2.functional._color import (
    adjust_brightness,
    adjust_contrast,
    adjust_gamma,
    adjust_hue,
    adjust_saturation,
    adjust_sharpness,
    autocontrast,
    equalize,
    grayscale_to_rgb,
    invert,
    permute_channels,
    posterize,
    rgb_to_grayscale,
    solarize,
)
from vision_tpu.transforms.v2.functional._geometry import (
    affine,
    affine_bounding_boxes,
    affine_image,
    affine_keypoints,
    affine_mask,
    center_crop,
    center_crop_image,
    crop,
    crop_bounding_boxes,
    crop_image,
    crop_keypoints,
    crop_mask,
    elastic,
    elastic_bounding_boxes,
    elastic_image,
    elastic_keypoints,
    five_crop,
    horizontal_flip,
    horizontal_flip_bounding_boxes,
    horizontal_flip_image,
    horizontal_flip_keypoints,
    horizontal_flip_mask,
    pad,
    pad_image,
    perspective,
    perspective_bounding_boxes,
    perspective_image,
    perspective_keypoints,
    perspective_mask,
    resize,
    resize_bounding_boxes,
    resize_image,
    resize_keypoints,
    resize_mask,
    resized_crop,
    resized_crop_dynamic,
    resized_crop_flip_batch,
    resized_crop_image,
    rotate,
    rotate_bounding_boxes,
    rotate_image,
    rotate_mask,
    ten_crop,
    vertical_flip,
    vertical_flip_bounding_boxes,
    vertical_flip_image,
    vertical_flip_keypoints,
    vertical_flip_mask,
)
from vision_tpu.transforms.v2.functional._meta import (
    clamp_bounding_boxes,
    clamp_keypoints,
    convert_bounding_box_format,
    get_num_channels,
    get_num_frames,
    get_size,
)
from vision_tpu.transforms.v2.functional._misc import (
    gaussian_blur,
    gaussian_blur_image,
    gaussian_noise,
    normalize,
    normalize_image,
    sanitize_bounding_boxes,
    to_dtype,
    to_dtype_image,
)
from vision_tpu.transforms.v2.functional._utils import register_kernel
from vision_tpu.transforms.v2.functional._utils import (  # noqa: E402
    is_pure_tensor,
    register_kernel,
)
from vision_tpu.transforms.v2.functional._aliases import *  # noqa: E402,F401,F403
from vision_tpu.transforms.v2.functional import _aliases as _aliases_mod  # noqa: E402

_aliases_mod._alias_per_type(globals())
_aliases_mod._get_size_aliases(globals())
del _aliases_mod
from vision_tpu.transforms._compat import InterpolationMode  # noqa: E402,F401
