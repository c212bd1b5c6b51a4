"""Test config: force CPU (with a virtual 8-device mesh for sharding tests).

The environment pins JAX_PLATFORMS to the TPU plugin via sitecustomize, so
plain env vars are not enough; override the config at import time.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# TPU-realistic default; individual tests may locally enable x64 via context.
jax.config.update("jax_default_matmul_precision", "highest")
