"""Persistent XLA compilation cache for production entry points.

The STC-007 trial-grid kernel takes minutes to compile at NORMAL limits;
the CLI / bench / batch driver are fresh processes, so without a
persistent cache every run pays full compile.  Tests set their own cache
(tests/conftest.py).  Opt out with SDV_NO_JAX_CACHE=1.
"""
from __future__ import annotations

import os

_DONE = False


def enable():
    global _DONE
    if _DONE or os.environ.get("SDV_NO_JAX_CACHE"):
        return
    _DONE = True
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("SDV_JAX_CACHE_DIR",
                       os.path.expanduser("~/.cache/sdvpcm_jax_cache")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
