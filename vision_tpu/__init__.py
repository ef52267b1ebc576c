"""vision_tpu — a TPU-native computer-vision framework (JAX/XLA/Pallas).

Re-implements the capabilities of torchvision (reference: /root/reference)
with a TPU-first design: NHWC channels-last layout, static shapes, explicit
PRNG keys, pytree containers instead of tensor subclasses, and Pallas kernels
for the hot ops.

Layout convention: images are channels-last ``(..., H, W, C)`` arrays —
the native layout for TPU convolutions — in contrast to the reference's NCHW.
"""

from vision_tpu import tv_tensors  # noqa: F401
from vision_tpu import ops  # noqa: F401
from vision_tpu import transforms  # noqa: F401
from vision_tpu import models  # noqa: F401
from vision_tpu import datasets  # noqa: F401
from vision_tpu import io  # noqa: F401
from vision_tpu import utils  # noqa: F401
from vision_tpu import export  # noqa: F401

__version__ = "0.1.0"

_image_backend = "native"
_video_backend = "pyav"


def set_image_backend(backend: str) -> None:
    """reference ``torchvision/__init__.py:30``; here 'native' (the C codec
    shim) or 'PIL' (fallback decoder)."""
    global _image_backend
    if backend not in ("native", "PIL", "accimage"):
        raise ValueError(f"Invalid backend '{backend}'")
    _image_backend = backend


def get_image_backend() -> str:
    """reference ``torchvision/__init__.py:45``."""
    return _image_backend


def set_video_backend(backend: str) -> None:
    """reference ``torchvision/__init__.py:52``; only the pyav backend
    exists here (gated on the package being installed)."""
    global _video_backend
    if backend not in ("pyav", "video_reader", "cuda"):
        raise ValueError(f"Invalid video backend '{backend}'")
    _video_backend = "pyav"  # others have no TPU-host analog


def get_video_backend() -> str:
    """reference ``torchvision/__init__.py:64``."""
    return _video_backend


def disable_beta_transforms_warning() -> None:
    """reference compat no-op (v2 transforms are the primary API here)."""
