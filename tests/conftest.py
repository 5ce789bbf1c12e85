"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding tests execute without TPU hardware (SURVEY.md §4).

Set VSNCA_TPU_TESTS=1 to keep the real TPU backend instead — only the
hardware-marked tests (tests/test_tpu_hardware.py) then run meaningfully;
the CPU-oriented suite still passes but compiles through the tunnel.
"""

import os

_on_hardware = os.environ.get("VSNCA_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _on_hardware and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
if not _on_hardware:
    # Force CPU: the image globally exports JAX_PLATFORMS=axon
    # (remote-compiled TPU), which would send every test compile through
    # the tunnel.
    os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env setup)

if not _on_hardware:
    # The image's sitecustomize registers the axon TPU plugin regardless of
    # env; selecting cpu through jax.config is what actually sticks.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# The suite's cost is dominated by XLA compiles of many small distinct
# programs (protocol/trainer tests compile 5-10 jit programs each; the
# heaviest tests are ~95% compile time). The persistent cache makes reruns
# and shared-shape programs across xdist workers near-free; first-ever runs
# are unchanged. Content-hashed, so stale entries are impossible.
try:  # pragma: no cover - cache support depends on the jax build
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/vsnca_jax_tests"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass
