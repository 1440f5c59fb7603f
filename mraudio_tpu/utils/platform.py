"""Backend selection for CLI entry points.

Some TPU frontends (e.g. remote-attached plugins) register themselves
regardless of ``JAX_PLATFORMS``, so the standard env var cannot force a
CPU run.  ``MRAUDIO_PLATFORM=cpu|tpu`` works everywhere because it goes
through ``jax.config`` *before* the first backend query — every CLI in
``mraudio_tpu.cli`` calls :func:`apply_platform_env` first thing.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor ``MRAUDIO_PLATFORM`` (must run before any jax computation)."""
    plat = os.environ.get("MRAUDIO_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
