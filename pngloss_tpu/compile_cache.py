"""Persistent XLA compilation cache.

First-touch compiles through this box's TPU tunnel cost 1-6 minutes per
(shape-bucket, bpp) program; the reference C tool has no such cost (it is
an interpreter, pngloss.c:226-304).  Enabling JAX's persistent compilation
cache makes that latency per-MACHINE instead of per-process: every jitted
program (including the Pallas kernels) is serialized to disk keyed by its
HLO fingerprint, and later processes deserialize instead of recompiling.

Cache location: $PNGLOSS_COMPILE_CACHE if set (the values ``0``, ``off``
or ``none`` disable the cache), else ``~/.cache/pngloss_tpu/xla-cache``.

CPU-only processes never persist: XLA's CPU backend stores AOT-compiled
executables whose embedded machine-feature lists (e.g. +prefer-no-scatter)
are checked against the loading host by cpu_aot_loader — mismatches spam
load errors and can SIGILL. CPU compiles finish in seconds (only the
remote TPU tunnel is minutes-slow), so persistence buys nothing there.
Every CPU consumer in this repo (tests/conftest.py, tools/*.py, the
dryrun) sets ``jax.config.jax_platforms = "cpu"`` *before* importing
pngloss_tpu.ops, which is what :func:`enable` inspects.
"""

from __future__ import annotations

import os

_enabled = False


def _cpu_only() -> bool:
    """True when this process has explicitly pinned JAX to the CPU backend
    (jax.config or JAX_PLATFORMS). Never initializes the backend."""
    try:
        import jax

        plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    except Exception:
        return False
    names = [p.strip().lower() for p in str(plats).split(",") if p.strip()]
    return bool(names) and all(n == "cpu" for n in names)


def cache_dir() -> str | None:
    """Resolved cache directory, or None if disabled by env."""
    env = os.environ.get("PNGLOSS_COMPILE_CACHE")
    if env is not None:
        if env.strip().lower() in ("", "0", "off", "none", "false"):
            return None
        return os.path.expanduser(env)
    return os.path.join(
        os.path.expanduser("~"), ".cache", "pngloss_tpu", "xla-cache")


def enable() -> None:
    """Idempotently point JAX's persistent compilation cache at cache_dir().

    Safe to call any time before (or after) backend init — the cache
    config is consulted at each compile, not at client creation.  Failures
    (read-only filesystem, old jax) degrade to no caching, never to an
    error: the cache is an optimization, not a correctness dependency.
    """
    global _enabled
    if _enabled:
        return
    _enabled = True
    path = cache_dir()
    if path is None or _cpu_only():
        return
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # default thresholds skip small/fast programs; we want everything —
        # even a 0.5 s compile costs more than a disk read on later runs
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
