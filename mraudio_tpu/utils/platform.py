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
    """Honor ``MRAUDIO_PLATFORM`` (must run before any jax computation)
    and enable the persistent XLA compilation cache — full-size graphs
    take minutes to compile (through a remote-compile tunnel, tens of
    minutes), and every CLI benefits from reusing them across runs."""
    plat = os.environ.get("MRAUDIO_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    enable_compile_cache()


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point jax at a persistent on-disk compilation cache (repo-local
    ``.jax_cache/`` by default; override with ``MRAUDIO_COMPILE_CACHE``,
    disable with ``MRAUDIO_COMPILE_CACHE=0``).  No-op if the backend
    doesn't support client-side caching."""
    cache_dir = cache_dir or os.environ.get("MRAUDIO_COMPILE_CACHE")
    if cache_dir == "0":
        return
    if not cache_dir:
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        cache_dir = os.path.join(repo_root, ".jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # pragma: no cover - older jax without the option
        pass
