"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU PJRT plugin and pins
JAX_PLATFORMS=axon in every interpreter; only one process may hold the chip, so
tests force the CPU backend via jax.config (env vars alone are overridden).
XLA_FLAGS must be set before backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
