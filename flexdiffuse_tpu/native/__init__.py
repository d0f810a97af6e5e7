"""Runtime-native components (C++ behind ctypes).

The TPU compute path is jax/XLA/Pallas; the host runtime around it uses
native code where the work is CPU-bound and super-linear — currently the
CLIP BPE merge loop (:mod:`.bpe`), the one hot host-side loop in prompt
encoding (the reference gets this from transformers' compiled tokenizers;
``/root/reference/encode/clip.py:57-63``).

Libraries build on demand with ``g++`` into ``_lib/`` next to the sources
(no pip/pybind11 dependency — plain C ABI + ctypes) and rebuild whenever
the source is newer than the shared object. Every consumer must treat the
native path as an optimization with a pure-Python fallback: builds can fail
(no compiler) and must never take product functionality down with them.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

log = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'csrc')
_LIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), '_lib')
_lock = threading.Lock()
_cache: dict = {}


def disabled() -> bool:
    """Global kill switch: ``FLEXDIFFUSE_NATIVE=0`` forces pure Python."""
    return os.environ.get('FLEXDIFFUSE_NATIVE', '1') == '0'


def load(name: str) -> ctypes.CDLL:
    """Compile (if stale) and dlopen ``csrc/<name>.cpp``.

    Raises on any failure — callers catch and fall back to Python.
    """
    with _lock:
        if name in _cache:
            return _cache[name]
        src = os.path.join(_CSRC, name + '.cpp')
        so = os.path.join(_LIB, name + '.so')
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            os.makedirs(_LIB, exist_ok=True)
            tmp = so + f'.tmp{os.getpid()}'
            cmd = ['g++', '-O2', '-std=c++17', '-shared', '-fPIC',
                   '-o', tmp, src]
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=120)
            if proc.returncode != 0:
                raise RuntimeError(
                    f'native build failed: {" ".join(cmd)}\n{proc.stderr}')
            os.replace(tmp, so)  # atomic vs concurrent builders
            log.info('built native library %s', so)
        lib = ctypes.CDLL(so)
        _cache[name] = lib
        return lib
