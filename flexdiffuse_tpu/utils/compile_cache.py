"""Persistent XLA compilation cache — product cold-start amortization.

The first run of a sampling scan pays a multi-minute XLA compile (SD-1.4
512² CFG scan ~60 s, SDXL 1024² ~3 min, LCM ~70 s on the v5e host). The
reference pays the equivalent cost as model-download + CUDA-kernel warmup
once per process too, but torch's eager path hides most of it; under jit
the compile is the whole cold-start. JAX's persistent compilation cache
writes every compiled executable to disk keyed by (HLO, compile options,
topology); a later process with the same program deserializes instead of
recompiling — measured on the v5e (25-step SD-1.4 CFG scan, deepcache
build): first scan dispatch 295 s → 21 s, model build 147 s → 51 s,
process-start-to-first-image 442 s → 72 s (docs/PERFORMANCE.md round 4).

Every product entry point (CLI generate/compose/train, the web UI, the
serving API — all routed through ``cli.main``) enables this by default;
``--no-compile-cache`` or ``FLEXDIFFUSE_NO_COMPILE_CACHE=1`` opts out,
``--compile-cache DIR`` / ``FLEXDIFFUSE_COMPILE_CACHE=DIR`` relocates it.
Library users call :func:`enable_compilation_cache` themselves.

No reference equivalent (the reference has no compile step); this is the
TPU-native answer to its lazy-load-once Runner global (``ui.py:9,17-21``).
"""
from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join('~', '.cache', 'flexdiffuse_tpu', 'xla')


def default_cache_dir() -> str:
    return os.path.expanduser(
        os.environ.get('FLEXDIFFUSE_COMPILE_CACHE', _DEFAULT_DIR))


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing). Returns the directory used, or None when disabled via
    ``FLEXDIFFUSE_NO_COMPILE_CACHE``. Safe to call repeatedly."""
    if os.environ.get('FLEXDIFFUSE_NO_COMPILE_CACHE', '') not in ('', '0'):
        return None
    import jax

    path = os.path.expanduser(path) if path else default_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', path)
    # Cache every executable that took >=2s to build: the product programs
    # are all multi-second scans; tiny test programs stay out of the cache.
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    log.info('persistent compilation cache at %s', path)
    return path
