"""Test harness config: force the CPU backend with a virtual 8-device mesh.

Multi-chip sharding logic is validated on virtual CPU devices
(``xla_force_host_platform_device_count``) as real multi-chip TPU hardware is not
available in CI; the driver separately dry-runs the multi-chip path. Numerical
parity tests also need CPU: TPU MXU f32 matmuls round through bf16-ish precision.

jax may already be imported by a pytest plugin before this conftest runs, so the
env vars alone are not enough — we also update jax.config directly (legal until
the backend is first used).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by recompiles of
# the same jitted programs across test processes.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_sga_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass
