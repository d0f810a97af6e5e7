"""Sweep TPU compiler options on the SD-1.4 CFG denoise scan.

XLA_FLAGS can't carry TPU flags through the axon relay (the local parser
rejects them fatally), but per-compile ``compiler_options`` reach the remote
compiler and unknown keys fail the compile loudly — so an accepted option
really applied. This sweeps candidate options over the exact program
bench.py times and prints steps/s per variant.

Run: ``python tools/xla_opts_exp.py [variant ...]`` (default: all).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

VARIANTS = {
    'baseline': {},
    'vmem32m': {'xla_tpu_scoped_vmem_limit_kib': '32768'},
    'vmem64m': {'xla_tpu_scoped_vmem_limit_kib': '65536'},
    'vmem96m': {'xla_tpu_scoped_vmem_limit_kib': '98304'},
    'layoutopt': {'xla_tpu_enable_aggressive_loop_fusion_layout_opt': 'true'},
    'nestedfusion': {'xla_tpu_enable_multi_level_nested_loop_fusion': 'true'},
    'nolhs': {'xla_tpu_enable_latency_hiding_scheduler': 'false'},
    'norwb': {'xla_tpu_rwb_fusion': 'false'},
    'combo': {
        'xla_tpu_scoped_vmem_limit_kib': '32768',
        'xla_tpu_enable_aggressive_loop_fusion_layout_opt': 'true',
    },
}


def main(names):
    from bench import _build
    from flexdiffuse_tpu.ops import attention

    with attention.backend('flash'):
        sample, args, length = _build()
        for name in names:
            opts = VARIANTS[name]
            t0 = time.perf_counter()
            try:
                compiled = sample.lower(*args).compile(compiler_options=opts)
            except Exception as e:
                print(f'{name:14s}: COMPILE FAILED {str(e)[:120]}', flush=True)
                continue
            ct = time.perf_counter() - t0
            out = np.asarray(compiled(*args))
            # Degenerate constant params can drive the 26-step PLMS scan
            # non-finite — irrelevant for timing (TPU ops are fixed-cycle),
            # but note it so variants can be compared for consistency.
            finite = bool(np.isfinite(out).all())
            best = float('inf')
            for _ in range(4):
                t0 = time.perf_counter()
                _ = np.asarray(compiled(*args))
                best = min(best, time.perf_counter() - t0)
            print(f'{name:14s}: {length / best:6.2f} steps/s '
                  f'({best / length * 1e3:6.2f} ms/step, compile {ct:.0f}s, '
                  f'finite={finite}) {opts}', flush=True)


if __name__ == '__main__':
    names = sys.argv[1:] or list(VARIANTS)
    bad = [n for n in names if n not in VARIANTS]
    assert not bad, bad
    main(names)
