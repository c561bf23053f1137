"""Step profiling: jax.profiler traces parsed to per-op device times.

The perf methodology this framework's optimization log (PERF.md) is built
on: run N steps under ``jax.profiler.trace``, parse the ``*.xplane.pb``
protobuf directly with ``tensorflow.tsl``'s generated bindings, and
aggregate exclusive device time per XLA op. The TensorBoard profile
plugin's converter is version-broken in this environment; the raw protobuf
path is dependency-light and works anywhere tensorflow is importable.

    from sgaligner_tpu.utils.profiling import profile_step
    prof = profile_step(lambda: step(state, batch), steps=3)
    print(prof.table(15))          # top-15 ops by exclusive device time

Timing caveat for tunneled/remote PJRT backends: ``block_until_ready``
returns at dispatch, so ``profile_step`` forces a value readback after the
profiled window (see .claude/skills/verify/SKILL.md gotchas).
"""

from __future__ import annotations

import glob
import os
import os.path as osp
import tempfile
from dataclasses import dataclass, field

# The C++ protobuf fastpath rejects the tsl descriptors in this
# environment; the pure-python implementation parses them fine. Must be set
# before google.protobuf is first imported.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


@dataclass
class StepProfile:
    """Aggregated device-op times for one profiled window."""

    ops_ms: dict[str, float] = field(default_factory=dict)  # per-op, per-step
    steps: int = 1
    plane: str = ""

    @property
    def total_ms(self) -> float:
        return sum(self.ops_ms.values())

    def top(self, n: int = 10) -> list[tuple[str, float]]:
        return sorted(self.ops_ms.items(), key=lambda kv: -kv[1])[:n]

    def table(self, n: int = 10) -> str:
        width = max((len(k) for k, _ in self.top(n)), default=4)
        lines = [f"device plane: {self.plane or '<none>'} | "
                 f"total {self.total_ms:.2f} ms/step over {self.steps} steps"]
        lines += [f"  {k:<{width}}  {v:8.3f} ms" for k, v in self.top(n)]
        return "\n".join(lines)


def parse_xplane(path: str, steps: int = 1) -> StepProfile:
    """Aggregate per-op device durations from one ``.xplane.pb`` file.

    Prefers the device plane ("TPU"/"/device:") "XLA Ops" line — its events
    are leaf op spans, so summing durations per op name gives EXCLUSIVE
    time. Host/CPU traces fall back to the busiest plane's line.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: PLC0415

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    def line_ops(plane, line):
        meta = plane.event_metadata
        out: dict[str, float] = {}
        for ev in line.events:
            name = meta[ev.metadata_id].name
            # XLA Ops lines carry full HLO text ("%fusion.3 = bf16[...] ...")
            # — keep just the op name
            name = name.split(" = ")[0].lstrip("%")
            out[name] = out.get(name, 0.0) + ev.duration_ps / 1e9  # -> ms
        return out

    def pick(planes):
        best: tuple[float, dict, str] = (0.0, {}, "")
        for plane in planes:
            for line in plane.lines:
                ops = line_ops(plane, line)
                score = sum(ops.values())
                if "XLA Ops" in line.name:
                    score *= 1000.0  # leaf op spans: the exclusive-time line
                if score > best[0]:
                    best = (score, ops, f"{plane.name} :: {line.name}")
        return best

    device = [p for p in xs.planes
              if any(t in p.name for t in ("TPU", "tpu", "/device:"))]
    # device planes win ABSOLUTELY over host planes (a host python line can
    # dwarf a fast device step in raw duration)
    _, ops, plane_name = pick(device)
    if not ops:
        _, ops, plane_name = pick(xs.planes)
    return StepProfile({k: v / steps for k, v in ops.items()},
                       steps=steps, plane=plane_name)


def latest_xplane(trace_dir: str) -> str | None:
    files = sorted(glob.glob(osp.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))
    return files[-1] if files else None


def profile_step(fn, steps: int = 3, trace_dir: str | None = None,
                 warmup: int = 1) -> StepProfile:
    """Trace ``steps`` calls of ``fn()`` and return the per-step op profile.

    ``fn`` should perform one full step (jitted; the first ``warmup`` calls
    run outside the trace to exclude compilation). The return value of the
    LAST call is read back to force completion on tunneled backends.
    """
    import jax
    import numpy as np

    for _ in range(warmup):
        out = fn()
    if warmup:
        jax.tree.map(lambda x: np.asarray(jax.device_get(x)), out)

    tdir = trace_dir or tempfile.mkdtemp(prefix="sga_prof_")
    with jax.profiler.trace(tdir):
        for _ in range(steps):
            out = fn()
        jax.tree.map(lambda x: np.asarray(jax.device_get(x)), out)
    path = latest_xplane(tdir)
    if path is None:
        return StepProfile(steps=steps)
    return parse_xplane(path, steps=steps)
