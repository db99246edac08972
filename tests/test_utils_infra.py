"""Infra utilities: the persistent-compilation-cache setup and the
finalizer registry for the hard-exit TPU path."""

import os

import jax
import jax.numpy as jnp

from adaptigraph_tpu.utils.finalize import register, run_finalizers
from adaptigraph_tpu.utils.jaxcache import enable_persistent_cache


def test_persistent_cache_writes_entries(tmp_path, monkeypatch):
    """enable_persistent_cache points jax at a disk cache; a fresh compile
    must land an entry there (this is the mechanism that makes the 20k-sample
    plan program's >25-min remote compile a one-time cost)."""
    # the cache binds its directory on FIRST use in a process; an earlier
    # test (e.g. a CLI invocation) may have initialized it at the default
    # location, so rebind explicitly for this test
    try:
        from jax._src.compilation_cache import reset_cache

        reset_cache()
    except Exception:
        pass
    cache = tmp_path / "jc"
    path = enable_persistent_cache(str(cache))
    assert path == str(cache) and os.path.isdir(path)
    # min_compile_time is 2 s; force-cache everything for the test
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        @jax.jit
        def f(x):
            return jnp.sin(x) @ jnp.cos(x).T

        f(jnp.ones((17, 17))).block_until_ready()
        assert len(os.listdir(path)) >= 1
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        # tmp_path is deleted after the test: detach the cache so later
        # slow-compiling tests don't warn into a dead directory
        jax.config.update("jax_compilation_cache_dir", None)


def test_persistent_cache_disabled_by_empty_env(tmp_path, monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
    assert enable_persistent_cache() is None


def test_finalizers_run_lifo_and_swallow_errors(capsys):
    order = []
    register(lambda: order.append("a"))

    @register
    def boom():
        raise RuntimeError("finalizer bug")

    register(lambda: order.append("b"))
    run_finalizers()  # must not raise
    assert order == ["b", "a"]  # LIFO, error in the middle swallowed
    assert "finalizer bug" in capsys.readouterr().err
    run_finalizers()  # registry drained; second call is a no-op
    assert order == ["b", "a"]
