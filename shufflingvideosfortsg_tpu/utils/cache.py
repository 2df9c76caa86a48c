"""Persistent XLA compilation cache.

Compiles through the remote-TPU relay cost minutes per graph; the on-disk
cache cuts warm starts to seconds (measured 173s -> 52s even for a trivial
jit — most of it is per-process compile service startup). Enabled by every
entry point; override the location with $SVTSG_JAX_CACHE_DIR, disable with
SVTSG_JAX_CACHE_DIR=off.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser('~/.cache/svtsg_jax')


def enable_compilation_cache() -> None:
    target = os.environ.get('SVTSG_JAX_CACHE_DIR', DEFAULT_DIR)
    if target.lower() in ('off', 'none', ''):
        return
    try:
        import jax
        os.makedirs(target, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', target)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass  # older jax or read-only fs: run uncached
