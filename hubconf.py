"""Hub entry points (reference ``hubconf.py``): every registered builder
is loadable by name."""

import vision_tpu.models  # noqa: F401  (populates the registry)
from vision_tpu.models._api import BUILTIN_MODELS

dependencies = ["jax", "flax"]

globals().update(BUILTIN_MODELS)
