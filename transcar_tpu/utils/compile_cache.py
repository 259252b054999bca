"""Persistent XLA compilation cache.

The reference pays no compile cost (eager torch); the TPU build pays a
multi-minute XLA compile of the full model on every cold process (the
flagship is ~6-8 min through a remote-compile service).  Persisting
compiled executables on disk removes that cost for every later process
that traces the same program: repeated benchmarks, eval restarts,
preemption-resumed training (SURVEY §5 failure recovery).

jax keys cache entries on the HLO, compile options, and jaxlib/runtime
versions, so entries self-invalidate across upgrades; stale entries are
simply never hit again and the directory can be deleted at any time.
"""
from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "transcar_tpu", "xla")
_ENV = "TRANSCAR_XLA_CACHE"


def enable_persistent_cache(path: Optional[str] = None,
                            min_compile_secs: float = 2.0) -> Optional[str]:
    """Point jax's persistent compilation cache at ``path``.

    Resolution order: explicit ``path`` argument, the ``TRANSCAR_XLA_CACHE``
    environment variable, then ``~/.cache/transcar_tpu/xla``.  Setting the
    env var to ``0``/``off`` disables the cache entirely (returns None).
    Idempotent and safe to call before or after backend init; failures
    (read-only filesystem, old jax) degrade to no caching rather than
    erroring the caller.
    """
    import jax

    path = path or os.environ.get(_ENV) or _DEFAULT_DIR
    if str(path).lower() in ("0", "off", "none", ""):
        return None
    try:
        os.makedirs(path, exist_ok=True)
        prev = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", str(path))
        # don't bother persisting trivial programs (host transfers etc.)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        if prev is not None and prev != str(path):
            # jax latches the cache handle on first use; a dir set after
            # that is silently ignored without a reset (on-disk entries
            # are untouched — only the in-process handle is re-pointed)
            from jax._src import compilation_cache as _cc
            _cc.reset_cache()
    except Exception:
        return None
    return str(path)
