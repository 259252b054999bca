"""Persistent XLA compilation cache (utils/compile_cache.py): entries
land on disk and the disable knob works.  The reference has no compile
step to cache; this is TPU-build infrastructure (SURVEY §5 checkpoint/
resume — a preemption-restarted process recompiles for free)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from transcar_tpu.utils.compile_cache import enable_persistent_cache


def test_cache_writes_entries_and_disable_knob(tmp_path):
    cache = str(tmp_path / "xla_cache")
    try:
        got = enable_persistent_cache(cache, min_compile_secs=0.0)
        assert got == cache and os.path.isdir(cache)

        @jax.jit
        def f(x):
            # unique-enough program so this test controls its own entry
            return jnp.tanh(x @ x.T) * 1.00042

        x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)),
                        jnp.float32)
        float(jnp.sum(f(x)))
        entries = os.listdir(cache)
        assert entries, "no cache entry written"
    finally:
        # detach the test process from the tmp dir (reset the latched
        # handle too so later tests/compiles don't write into tmp_path)
        jax.config.update("jax_compilation_cache_dir", None)
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()

    assert enable_persistent_cache("off") is None
    # env-var disable wins over the default dir
    os.environ["TRANSCAR_XLA_CACHE"] = "0"
    try:
        assert enable_persistent_cache() is None
    finally:
        del os.environ["TRANSCAR_XLA_CACHE"]
