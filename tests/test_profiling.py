"""utils/profiling.py: jax.profiler trace -> per-op device-time profile.

The in-package version of the methodology PERF.md's step profiles were
produced with (parse the xplane protobuf directly; the TensorBoard plugin
converter is broken in this environment)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_profile_step_returns_op_times(tmp_path):
    tf = pytest.importorskip("tensorflow")  # noqa: F841 - parser dependency

    from sgaligner_tpu.utils.profiling import profile_step

    @jax.jit
    def step(x):
        return jnp.tanh(x @ x).sum()

    x = jnp.ones((128, 128))
    prof = profile_step(functools.partial(step, x), steps=2,
                        trace_dir=str(tmp_path))
    assert prof.steps == 2
    # some plane must have been picked up with positive op times
    assert prof.ops_ms and prof.total_ms > 0
    assert all(v >= 0 for v in prof.ops_ms.values())
    table = prof.table(3)
    assert "ms" in table and prof.plane in table


def test_parse_xplane_missing_trace_dir(tmp_path):
    from sgaligner_tpu.utils.profiling import latest_xplane

    assert latest_xplane(str(tmp_path)) is None
