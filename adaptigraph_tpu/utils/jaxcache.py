"""Persistent XLA compilation-cache setup.

The flagship 20k-sample MPPI program compiles for tens of minutes through the
remote-TPU tunnel (observed >25 min; it tripped the round-3 campaign's stall
watchdog twice). A disk-persisted compilation cache turns that into a
one-time cost that survives client restarts, watchdog kills, and tunnel
wedges.

This must be applied via ``jax.config.update`` (not env vars): the ambient
environment pre-imports jax through ``sitecustomize.py`` before any package
code runs, so the env-var defaults are already frozen by then.
``jax.config.update`` works any time before the first compilation.
"""

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.exists(os.path.join(_REPO_ROOT, "pyproject.toml")):
    # editable checkout: keep the cache beside the repo (shared by bench/CLI)
    _DEFAULT_DIR = os.path.join(_REPO_ROOT, ".jax_cache")
else:
    # installed copy: never write into site-packages' parent (ADVICE r4)
    _DEFAULT_DIR = os.path.join(
        os.path.expanduser("~"), ".cache", "adaptigraph_tpu", "jax_cache")


def enable_persistent_cache(cache_dir=None):
    """Point jax at a disk compilation cache. Safe to call repeatedly.

    Returns the cache dir, or None if disabled (JAX_COMPILATION_CACHE_DIR
    set to the empty string) or jax is unavailable.
    """
    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env == "":
        return None
    path = cache_dir or env or _DEFAULT_DIR
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything non-trivial: remote compiles are the cost center
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return path
