"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding tests execute without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_default_matmul_precision", "highest")
