"""Color class transforms (reference
``torchvision/transforms/v2/_color.py``, 377 LoC)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_tpu import tv_tensors
from vision_tpu.transforms.v2 import functional as F
from vision_tpu.transforms.v2._transform import Transform, _RandomApplyTransform

__all__ = [
    "ColorJitter",
    "Grayscale",
    "RandomGrayscale",
    "RGB",
    "RandomPhotometricDistort",
    "RandomEqualize",
    "RandomPosterize",
    "RandomSolarize",
    "RandomAutocontrast",
    "RandomAdjustSharpness",
    "RandomInvert",
    "RandomChannelPermutation",
    "GaussianBlur",
    "GaussianNoise",
]

_IMG_TYPES = (tv_tensors.Image, tv_tensors.Video, jax.Array, np.ndarray)


class Grayscale(Transform):
    _transformed_types = _IMG_TYPES

    def __init__(self, num_output_channels: int = 1):
        super().__init__()
        self.num_output_channels = num_output_channels

    def transform(self, inpt, params):
        return F.rgb_to_grayscale(inpt, self.num_output_channels)


class RGB(Transform):
    _transformed_types = _IMG_TYPES

    def transform(self, inpt, params):
        return F.grayscale_to_rgb(inpt)


class RandomGrayscale(_RandomApplyTransform):
    _transformed_types = _IMG_TYPES

    def __init__(self, p: float = 0.1):
        super().__init__(p=p)

    def transform(self, inpt, params):
        from vision_tpu.transforms.v2.functional._meta import get_num_channels

        return F.rgb_to_grayscale(inpt, get_num_channels(inpt))


class ColorJitter(Transform):
    """reference v2 ColorJitter: sample 4 factors + a random op order."""

    _transformed_types = _IMG_TYPES

    def __init__(self, brightness=None, contrast=None, saturation=None, hue=None):
        super().__init__()
        self.brightness = self._check(brightness, "brightness")
        self.contrast = self._check(contrast, "contrast")
        self.saturation = self._check(saturation, "saturation")
        self.hue = self._check(hue, "hue", center=0.0, bound=(-0.5, 0.5))

    @staticmethod
    def _check(value, name, center=1.0, bound=(0.0, float("inf"))):
        if value is None:
            return None
        if isinstance(value, (int, float)):
            if value < 0:
                raise ValueError(f"{name} must be non-negative if scalar")
            value = (center - value, center + value)
            value = (max(value[0], bound[0]), min(value[1], bound[1]))
        else:
            value = tuple(float(v) for v in value)
        if value[0] == value[1] == center:
            return None
        return value

    def make_params(self, flat_inputs, key):
        ks = jax.random.split(key, 5)
        traced = isinstance(key, jax.core.Tracer)
        order = jax.random.permutation(ks[0], 4)
        if not traced:
            order = np.asarray(order).tolist()

        def draw(k, rng):
            if rng is None:
                return None
            u = jax.random.uniform(k, minval=rng[0], maxval=rng[1])
            return u if traced else float(u)

        return dict(
            fn_idx=order,
            brightness_factor=draw(ks[1], self.brightness),
            contrast_factor=draw(ks[2], self.contrast),
            saturation_factor=draw(ks[3], self.saturation),
            hue_factor=draw(ks[4], self.hue),
        )

    def transform(self, inpt, params):
        if isinstance(params["fn_idx"], jax.core.Tracer):
            # under jit the op order is a traced permutation: walk the four
            # slots with lax.switch (all color ops preserve shape/dtype)
            import jax.numpy as jnp

            def b0(t):
                f = params["brightness_factor"]
                return t if f is None else F.adjust_brightness(t, f)

            def b1(t):
                f = params["contrast_factor"]
                return t if f is None else F.adjust_contrast(t, f)

            def b2(t):
                f = params["saturation_factor"]
                return t if f is None else F.adjust_saturation(t, f)

            def b3(t):
                f = params["hue_factor"]
                return t if f is None else F.adjust_hue(t, f)

            out = inpt
            for step in range(4):
                out = jax.lax.switch(
                    params["fn_idx"][step], [b0, b1, b2, b3], out
                )
            return out
        out = inpt
        for fn_id in params["fn_idx"]:
            if fn_id == 0 and params["brightness_factor"] is not None:
                out = F.adjust_brightness(out, params["brightness_factor"])
            elif fn_id == 1 and params["contrast_factor"] is not None:
                out = F.adjust_contrast(out, params["contrast_factor"])
            elif fn_id == 2 and params["saturation_factor"] is not None:
                out = F.adjust_saturation(out, params["saturation_factor"])
            elif fn_id == 3 and params["hue_factor"] is not None:
                out = F.adjust_hue(out, params["hue_factor"])
        return out


class RandomPhotometricDistort(Transform):
    """SSD photometric distortion (reference v2 RandomPhotometricDistort)."""

    _transformed_types = _IMG_TYPES

    def __init__(
        self,
        brightness=(0.875, 1.125),
        contrast=(0.5, 1.5),
        saturation=(0.5, 1.5),
        hue=(-0.05, 0.05),
        p: float = 0.5,
    ):
        super().__init__()
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.p = p

    def make_params(self, flat_inputs, key):
        ks = jax.random.split(key, 11)
        u = lambda k: float(jax.random.uniform(k))
        d = lambda k, rng: float(jax.random.uniform(k, minval=rng[0], maxval=rng[1]))
        num_channels = 3
        for x in flat_inputs:
            if isinstance(x, (tv_tensors.Image, tv_tensors.Video)) or (
                isinstance(x, (jax.Array, np.ndarray)) and x.ndim >= 3
            ):
                num_channels = x.shape[-1]
                break
        return dict(
            brightness_factor=d(ks[0], self.brightness) if u(ks[1]) < self.p else None,
            contrast_factor=d(ks[2], self.contrast) if u(ks[3]) < self.p else None,
            contrast_before=u(ks[4]) < 0.5,
            saturation_factor=d(ks[5], self.saturation) if u(ks[6]) < self.p else None,
            hue_factor=d(ks[7], self.hue) if u(ks[8]) < self.p else None,
            channel_permutation=(
                np.asarray(jax.random.permutation(ks[9], num_channels)).tolist()
                if u(ks[10]) < self.p
                else None
            ),
        )

    def transform(self, inpt, params):
        out = inpt
        if params["brightness_factor"] is not None:
            out = F.adjust_brightness(out, params["brightness_factor"])
        if params["contrast_before"] and params["contrast_factor"] is not None:
            out = F.adjust_contrast(out, params["contrast_factor"])
        if params["saturation_factor"] is not None:
            out = F.adjust_saturation(out, params["saturation_factor"])
        if params["hue_factor"] is not None:
            out = F.adjust_hue(out, params["hue_factor"])
        if not params["contrast_before"] and params["contrast_factor"] is not None:
            out = F.adjust_contrast(out, params["contrast_factor"])
        if params["channel_permutation"] is not None:
            out = F.permute_channels(out, params["channel_permutation"])
        return out


class RandomEqualize(_RandomApplyTransform):
    _transformed_types = _IMG_TYPES

    def transform(self, inpt, params):
        return F.equalize(inpt)


class RandomPosterize(_RandomApplyTransform):
    _transformed_types = _IMG_TYPES

    def __init__(self, bits: int, p: float = 0.5):
        super().__init__(p=p)
        self.bits = bits

    def transform(self, inpt, params):
        return F.posterize(inpt, self.bits)


class RandomSolarize(_RandomApplyTransform):
    _transformed_types = _IMG_TYPES

    def __init__(self, threshold: float, p: float = 0.5):
        super().__init__(p=p)
        self.threshold = threshold

    def transform(self, inpt, params):
        return F.solarize(inpt, self.threshold)


class RandomAutocontrast(_RandomApplyTransform):
    _transformed_types = _IMG_TYPES

    def transform(self, inpt, params):
        return F.autocontrast(inpt)


class RandomAdjustSharpness(_RandomApplyTransform):
    _transformed_types = _IMG_TYPES

    def __init__(self, sharpness_factor: float, p: float = 0.5):
        super().__init__(p=p)
        self.sharpness_factor = sharpness_factor

    def transform(self, inpt, params):
        return F.adjust_sharpness(inpt, self.sharpness_factor)


class RandomInvert(_RandomApplyTransform):
    _transformed_types = _IMG_TYPES

    def transform(self, inpt, params):
        return F.invert(inpt)


class RandomChannelPermutation(Transform):
    _transformed_types = _IMG_TYPES

    def make_params(self, flat_inputs, key):
        num_channels = 3
        for x in flat_inputs:
            if isinstance(x, (jax.Array, np.ndarray)) and x.ndim >= 3:
                num_channels = x.shape[-1]
                break
        return dict(
            permutation=np.asarray(jax.random.permutation(key, num_channels)).tolist()
        )

    def transform(self, inpt, params):
        return F.permute_channels(inpt, params["permutation"])


class GaussianBlur(Transform):
    _transformed_types = _IMG_TYPES

    def __init__(self, kernel_size, sigma=(0.1, 2.0)):
        super().__init__()
        self.kernel_size = kernel_size
        if isinstance(sigma, (int, float)):
            sigma = (float(sigma), float(sigma))
        self.sigma = sigma

    def make_params(self, flat_inputs, key):
        sigma = float(
            jax.random.uniform(key, minval=self.sigma[0], maxval=self.sigma[1])
        )
        return dict(sigma=[sigma, sigma])

    def transform(self, inpt, params):
        return F.gaussian_blur(inpt, self.kernel_size, params["sigma"])


class GaussianNoise(Transform):
    _transformed_types = _IMG_TYPES

    def __init__(self, mean: float = 0.0, sigma: float = 0.1, clip: bool = True):
        super().__init__()
        self.mean = mean
        self.sigma = sigma
        self.clip = clip

    def make_params(self, flat_inputs, key):
        return dict(key=key)

    def transform(self, inpt, params):
        return F.gaussian_noise(
            inpt, self.mean, self.sigma, self.clip, key=params["key"]
        )
