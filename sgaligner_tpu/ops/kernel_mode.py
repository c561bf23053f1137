"""Kernel-mode resolution: fused-vs-XLA path and Mosaic-vs-interpret mode.

The fused Pallas ops exist in two lowering modes — real Mosaic kernels (TPU)
and interpret mode (CPU test suites). Models resolve the mode at TRACE time;
the default keys off ``jax.default_backend()``. That default is wrong in
exactly one situation: cross-platform export (``sgaligner_tpu/serving.py``),
where a CPU-only build box lowers the serving program for the TPU platform —
there the trace must emit real Mosaic custom calls (interpret mode is
host-callback-based and not serializable). ``force_platform`` installs an
explicit override for such traces.
"""

from __future__ import annotations

import contextlib

import jax

_PLATFORM_OVERRIDE: str | None = None


def lowering_platform() -> str:
    """Platform the current trace is lowering for."""
    return _PLATFORM_OVERRIDE or jax.default_backend()


def use_fused(flag: str) -> bool:
    """Resolve a model's fused policy ("auto" | "never" | "always")."""
    return (flag == "always"
            or (flag == "auto" and lowering_platform() != "cpu"))


def interpret() -> bool:
    """Pallas interpret mode: on for CPU lowering, off for TPU (Mosaic)."""
    return lowering_platform() == "cpu"


@contextlib.contextmanager
def force_platform(platform: str | None):
    """Override the lowering platform for the enclosed traces."""
    global _PLATFORM_OVERRIDE
    prev = _PLATFORM_OVERRIDE
    _PLATFORM_OVERRIDE = platform
    try:
        yield
    finally:
        _PLATFORM_OVERRIDE = prev
