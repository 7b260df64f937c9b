"""Test configuration: CPU backend, 8 virtual devices, 64-bit mode.

Verification tests need f64 (the reference is double precision); the
virtual 8-device CPU mesh exercises the multi-chip sharding path without
TPU hardware. Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_ENABLE_X64"] = "true"

import jax  # noqa: E402

# The axon site hook (this machine's TPU tunnel) forces
# jax_platforms="axon,cpu" programmatically; override it back so tests
# run on the local virtual-device CPU backend in f64.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
