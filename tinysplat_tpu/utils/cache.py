"""Persistent XLA compilation cache setup.

Compiles over the tunneled TPU cost ~1-3 minutes per executable, and a
quality run triggers several (budget retunes, coarse-to-fine stages, the
eval render shape). The cache makes every re-seen executable a disk hit —
across invocations too, so a warm-started run spends its wall clock on
steps, not compiles (VERDICT r4 weak #1/#3).

Must go through the config API: the sandbox's sitecustomize imports jax at
interpreter startup, so the JAX_COMPILATION_CACHE_DIR env var is consumed
(empty) before any user code runs (NOTES.md Gotchas).
"""
import os


#: Repo-local default so the cache survives sandbox restarts (/tmp is wiped
#: on reboot — a round-5 restart cost a full re-warm of every executable).
DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_compile_cache(path: str = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    $JAX_COMPILATION_CACHE_DIR or <repo>/.jax_cache) with no size/time
    floors. Call before the first jit dispatch; safe to call repeatedly."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  DEFAULT_CACHE_DIR)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
