"""Test configuration: CPU backend with 8 virtual devices, f64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh (the TPU-world analog
of testing multi-node without a cluster); f64 is required for reference-parity
tolerances. Must run before jax initializes its backends. The environment's
sitecustomize pins JAX_PLATFORMS to the axon TPU tunnel, so we override via
jax.config (which wins over the env var).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
