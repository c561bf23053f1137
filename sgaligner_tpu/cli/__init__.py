"""CLI entry points (reference script-per-task surface, README.md:122-168).

Importing this package re-applies the ``JAX_PLATFORMS`` env var (see
core/platform.py): site hooks that pre-register PJRT plugins can override the
config and hang backend init on an unreachable transport.
"""

from sgaligner_tpu.core.platform import honor_jax_platforms_env

honor_jax_platforms_env()
