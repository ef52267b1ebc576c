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

__version__ = "0.1.0"
