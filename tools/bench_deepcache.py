"""DeepCache bench: SD-1.4 512² CFG scan with the cached-deep-feature
accelerator (pipeline/flex.py deepcache) vs the exact scan.

Emits one JSON line with --json (consumed by bench.py's extras).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np


def main():
    emit_json = '--json' in sys.argv
    from tools.deepcache_exp import STEPS, build

    out = {'metric': ('sd1.4 512x512 CFG denoise steps/sec/chip '
                      f'(bf16, PLMS {STEPS}-step scan, DeepCache)')}
    results = {}
    for dc in (0, 3):
        run, length = build(dc)
        t0 = time.perf_counter()
        lat = run()
        compile_s = time.perf_counter() - t0
        best = float('inf')
        for _ in range(4):
            t0 = time.perf_counter()
            lat = run()
            best = min(best, time.perf_counter() - t0)
        results[dc] = (length / best, lat, compile_s)
    (base_sps, base_lat, _), (dc_sps, dc_lat, dc_comp) = (results[0],
                                                          results[3])
    drift = float(np.mean((dc_lat - base_lat) ** 2))
    out.update({
        'interval': 3,
        'value': round(dc_sps, 3),
        'unit': 'steps/sec',
        'exact_steps_per_sec': round(base_sps, 3),
        'speedup_vs_exact': round(dc_sps / base_sps, 3),
        'latent_mse_vs_exact': drift,
        'finite': bool(np.isfinite(dc_lat).all()),
    })
    if emit_json:
        print(json.dumps(out))
    else:
        print(out)


if __name__ == '__main__':
    main()
