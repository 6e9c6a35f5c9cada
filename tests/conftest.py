"""Test harness: force the CPU backend with 8 virtual devices + x64 for f64
parity with the Julia reference.

NB: this image pre-imports jax during interpreter startup (axon
sitecustomize), so JAX_PLATFORMS in the environment is too late - the platform
must be forced through jax.config before any backend initializes."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu"
