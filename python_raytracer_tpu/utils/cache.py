"""Persistent XLA compilation cache, repo-local.

The blockwise march kernel compiles in ~2.5 min cold and the fwd+bwd
renderer in ~4 min (TPU v5e, measured) — far over the bench watchdog's
deadline. Round-2 lesson: caching under /tmp does NOT survive machine
restarts (BENCH almost shipped a zero because /tmp/jax_cache vanished), so
the cache lives in the repo checkout, which persists across rounds. Warm it
by running ``python3 bench.py`` after touching the compute path.
"""

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str = None):
    """Point JAX's compilation cache at a directory that survives reboots.

    Honors ``JAX_CACHE_DIR`` env; falls back to /tmp/jax_cache only if the
    repo checkout is not writable. Safe to call multiple times.
    """
    path = path or os.environ.get("JAX_CACHE_DIR") or _DEFAULT
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".probe")
        with open(probe, "w"):
            pass
        os.unlink(probe)
    except OSError:
        path = "/tmp/jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    return path
