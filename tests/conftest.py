import os

# Force CPU with 8 virtual devices for sharding tests, and 64-bit floats so
# the partition/cost path matches the reference's double precision.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# re-point to CPU before any backend is initialized so tests run locally.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
