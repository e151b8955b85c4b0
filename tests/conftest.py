"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

Parity tests require float64 (the reference is REAL(C_DOUBLE) end to end);
sharding tests need a multi-device mesh without real TPU chips.

The container's sitecustomize pre-imports jax and registers the remote-TPU
(axon) backend before pytest starts, so plain JAX_PLATFORMS env vars are too
late -- we force the CPU platform through jax.config instead, which works
post-registration as long as no backend has been initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
