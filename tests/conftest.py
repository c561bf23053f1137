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
#
# The dir is keyed by the HOST CPU feature set: XLA:CPU AOT cache entries
# record the compile machine's features, and jax's cache key does NOT include
# them — after a VM migration to a different physical host, stale entries load
# with mismatched codegen (cpu_aot_loader warns "prefer-no-gather is not
# supported on the host machine") and run 10-20x slow (measured: a 20 s
# registration eval became 427 s, all of it under device sync). A per-feature
# dir makes a migrated host start a fresh cache instead.
import hashlib  # noqa: E402

try:
    _cpu_flags = next(l for l in open("/proc/cpuinfo")
                      if l.startswith("flags"))
except (OSError, StopIteration):
    _cpu_flags = ""
_cpu_tag = hashlib.sha1(_cpu_flags.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_cache_sga_tests_{_cpu_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
try:
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:
    pass


import pytest  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_GEO_CKPT = os.path.join(_REPO, "checkpoints", "geo_reg")


@pytest.fixture(scope="session")
def geo_backend():
    """ONE pretrained LearnedBackend shared by every registration test.

    LearnedBackend wraps its device stages with fresh ``jax.jit`` objects per
    instance (reg/learned.py __init__), so per-test construction re-traces and
    re-lowers the whole pipeline — measured ~10 min/test on the 1-core CI host
    vs ~1-2 min/eval through a shared instance. Tests must treat the backend
    as immutable (default config); anything needing non-default knobs builds
    its own."""
    if not os.path.isdir(_GEO_CKPT):
        pytest.skip("pretrained geo_reg checkpoint not present")
    from sgaligner_tpu.reg.learned import LearnedBackend

    return LearnedBackend(checkpoint=_GEO_CKPT)
