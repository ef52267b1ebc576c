"""Detection transform presets (reference
``references/detection/presets.py``): the per-recipe augmentation policies
— hflip (R-CNN family), lsj (large-scale jitter, v2 recipes), multiscale,
ssd (photometric distort + zoom-out + IoU crop), ssdlite.

v2 transforms here are jittable pytree ops over (Image, target) pairs with
explicit PRNG keys; ``FixedSizeCrop`` from the reference maps to
``RandomCrop(pad_if_needed=True)`` (same crop-then-pad-to-static-size
semantics, which is exactly what the TPU wants: one canvas shape per
policy).
"""

from __future__ import annotations

import sys

import jax

from vision_tpu import tv_tensors
from vision_tpu.transforms import v2 as T

# COCO person keypoint order (nose, L/R eye, L/R ear, L/R shoulder, L/R
# elbow, L/R wrist, L/R hip, L/R knee, L/R ankle); mirroring an image swaps
# each left/right pair (reference ``references/detection/transforms.py``
# ``_flip_coco_person_keypoints``).
COCO_PERSON_KEYPOINT_FLIP_INDICES = (
    0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15,
)


class DetectionPresetTrain:
    """reference ``presets.py:18`` (tv_tensor backend, v2 semantics)."""

    def __init__(
        self,
        *,
        data_augmentation: str,
        hflip_prob: float = 0.5,
        mean: tuple = (123.0, 117.0, 104.0),
        keypoint_flip_indices=None,
    ):
        import jax.numpy as jnp

        hflip = T.RandomHorizontalFlip(
            p=hflip_prob, keypoint_flip_indices=keypoint_flip_indices
        )
        transforms = []
        if data_augmentation == "hflip":
            transforms += [hflip]
        elif data_augmentation == "lsj":
            transforms += [
                T.ScaleJitter(target_size=(1024, 1024), antialias=True),
                T.RandomCrop((1024, 1024), pad_if_needed=True, fill=0),
                hflip,
            ]
        elif data_augmentation == "multiscale":
            transforms += [
                T.RandomShortestSize(
                    min_size=(480, 512, 544, 576, 608, 640, 672, 704, 736,
                              768, 800),
                    max_size=1333,
                ),
                hflip,
            ]
        elif data_augmentation == "ssd":
            transforms += [
                T.RandomPhotometricDistort(),
                T.RandomZoomOut(fill=list(mean)),
                T.RandomIoUCrop(),
                hflip,
            ]
        elif data_augmentation == "ssdlite":
            transforms += [
                T.RandomIoUCrop(),
                hflip,
            ]
        else:
            raise ValueError(
                f'Unknown data augmentation policy "{data_augmentation}"'
            )
        transforms += [
            T.ToDtype(jnp.float32, scale=True),
            T.ConvertBoundingBoxFormat("XYXY"),
            T.SanitizeBoundingBoxes(),
        ]
        self.transforms = T.Compose(transforms)

    def __call__(self, sample, key):
        return self.transforms(sample, key=key)


class DetectionPresetEval:
    """reference ``presets.py:91``: to float [0,1], nothing else."""

    def __init__(self):
        import jax.numpy as jnp

        self.transforms = T.Compose([T.ToDtype(jnp.float32, scale=True)])

    def __call__(self, sample, key=None):
        return self.transforms(
            sample, key=key if key is not None else jax.random.PRNGKey(0)
        )
