"""Test configuration: force the CPU backend with 8 virtual devices so that
multi-chip sharding paths compile and execute without TPU hardware
(XLA CPU executes the same HLO; see SURVEY.md §4 test-strategy notes)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Per-op eager dispatch is pathologically slow in this environment (~0.5s/op
# compile); tests always jit and reuse a persistent compilation cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax  # noqa: E402  (import after env is set)

# a pytest plugin may import jax before this conftest runs, capturing the
# ambient TPU platform — force the CPU backend at the config level too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# The XLA CPU backend runs convs/matmuls in reduced precision by default in
# this environment (~1e-3 error); force exact f32 for numeric parity tests.
jax.config.update("jax_default_matmul_precision", "highest")
