"""DeepCache bench: SD-1.4 512² CFG scan with the cached-deep-feature
accelerator (pipeline/flex.py deepcache) vs the exact scan.

Emits one JSON line with --json (consumed by bench.py's extras).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, '/root/repo')

from flexdiffuse_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.jax_cache')  # shared bench-tool cache

import numpy as np


def serving_batch(interval: int = 3, batch: int = 4, rounds: int = 3) -> dict:
    """Batch-N serving throughput with DeepCache: overlapped scan + device-u8
    VAE decode rounds (the bench.py _serving_batch4 discipline), deepcached.
    The exact scan bounds batch-4 at ~150 img/min scan-only; the cached
    shallow steps break past that device ceiling."""
    import time

    from tools.deepcache_exp import STEPS, build_parts

    parts = build_parts(interval, batch=batch)
    pipe, sample = parts['pipe'], parts['sample']

    def round_out():
        return pipe.decode_u8_device(sample())

    _ = np.asarray(round_out())  # compile scan + decode

    t0 = time.perf_counter()
    pending = [round_out() for _ in range(rounds)]  # all rounds queued
    for p in pending:
        _ = np.asarray(p)
    overlapped = time.perf_counter() - t0

    per_image_factor = (STEPS + 1) / STEPS  # 25-step gen ≈ 26 scan steps
    imgs = batch * rounds
    return {
        'interval': interval,
        'batch': batch,
        'images_per_min': round(
            60.0 * imgs / (overlapped * per_image_factor), 1),
    }


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
    try:
        out['serving_batch4'] = serving_batch()
    except Exception as e:  # never jeopardize the primary numbers
        out['serving_batch4'] = {'error': str(e)[:200]}
    if emit_json:
        print(json.dumps(out))
    else:
        print(out)


if __name__ == '__main__':
    main()
