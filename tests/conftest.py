"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding tests execute without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU: the image globally exports JAX_PLATFORMS=axon (remote-compiled
# TPU), which would send every test compile through the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env setup)

# The image's sitecustomize registers the axon TPU plugin regardless of env;
# selecting cpu through jax.config is what actually sticks.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
