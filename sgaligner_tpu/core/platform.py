"""Make the ``JAX_PLATFORMS`` env var authoritative.

jax reads ``JAX_PLATFORMS`` into ``jax.config.jax_platforms`` at import time,
but site hooks that pre-import jax can overwrite the config afterwards (this
box's PJRT-plugin sitecustomize sets ``'axon,cpu'``), silently discarding the
user's choice — and initializing the plugin backend then blocks indefinitely
when its transport is unreachable. Re-applying the env var after import
restores the documented contract: ``JAX_PLATFORMS=cpu python -m
sgaligner_tpu.cli.<entry>`` always runs on CPU.

Called from every CLI entry point (harmless no-op when the env var is unset
or already in effect).
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    if jax.config.jax_platforms != want:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass  # backends already initialized — too late to change
