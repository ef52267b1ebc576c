"""Dev helper: force the CPU backend before any jax use (the axon TPU
plugin ignores JAX_PLATFORMS; must go through jax.config). Usage:
``python -c "import cpu; ..."`` — not part of the library."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
