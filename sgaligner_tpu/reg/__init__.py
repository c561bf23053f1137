"""Registration subsystem: pluggable correspondence backends + evaluator.

Lazy exports (importing jax-heavy modules only on first use):

* ``MutualNNBackend`` / ``LearnedBackend`` / ``GeoTransformerBackend`` /
  ``build_backend`` — the correspondence engines (reg/backend.py,
  reg/learned.py),
* ``RegistrationEvaluator`` — the reference-parity evaluator
  (reg/evaluator.py),
* ``find_rigid_transform`` — batched Kabsch-RANSAC (reg/ransac.py).
"""

from __future__ import annotations

_EXPORTS = {
    "MutualNNBackend": ("sgaligner_tpu.reg.backend", "MutualNNBackend"),
    "GeoTransformerBackend": ("sgaligner_tpu.reg.backend",
                              "GeoTransformerBackend"),
    "build_backend": ("sgaligner_tpu.reg.backend", "build_backend"),
    "LearnedBackend": ("sgaligner_tpu.reg.learned", "LearnedBackend"),
    "RegistrationEvaluator": ("sgaligner_tpu.reg.evaluator",
                              "RegistrationEvaluator"),
    "find_rigid_transform": ("sgaligner_tpu.reg.ransac",
                             "find_rigid_transform"),
}

__all__ = sorted(_EXPORTS)


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module, attr = _EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
