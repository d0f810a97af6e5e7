"""Serving-API load test: concurrent requests against the batched JSON API.

Boots the GenerationService in-process over random SD-1.4 weights (values
don't affect timing), fires N concurrent clients at it, and reports
images/min, latency percentiles, and the batcher's fusion stats — the
end-to-end number for the dynamic-batching serving path
(serving/api.py + serving/batcher.py).

Run: ``python tools/bench_serving.py [--json]``.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))),
                          '.jax_cache'))

CLIENTS = 8
REQUESTS_PER_CLIENT = 4
STEPS = 25


def _runner():
    import jax
    import jax.numpy as jnp

    from flexdiffuse_tpu.models import (CLIP_VIT_L14_TEXT, CLIP_VIT_L14_VISION,
                                        SD14_UNET, SD14_VAE, AutoencoderKL,
                                        CLIPTextModel, CLIPVisionModel,
                                        UNet2DCondition)
    from flexdiffuse_tpu.runner import Runner
    from flexdiffuse_tpu.text.tokenizer import FakeTokenizer

    def params_like(module, *args, **kwargs):
        shapes = jax.eval_shape(
            lambda k: module.init(k, *args, **kwargs), jax.random.PRNGKey(0))
        return jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    text = CLIPTextModel(CLIP_VIT_L14_TEXT, dtype=jnp.bfloat16)
    vision = CLIPVisionModel(CLIP_VIT_L14_VISION, dtype=jnp.bfloat16)
    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    k = jax.random.PRNGKey(0)
    tp = params_like(text, jnp.zeros((1, 77), jnp.int32))
    vip = params_like(vision, jnp.zeros((1, 224, 224, 3)))
    up = params_like(unet, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
                     jnp.zeros((1, 77, 768)))
    vp = params_like(vae, jnp.zeros((1, 512, 512, 3)), k)
    return Runner.from_models(text, tp, vision, vip, unet, up, vae, vp,
                              FakeTokenizer(CLIP_VIT_L14_TEXT.vocab_size))


def measure() -> dict:
    from flexdiffuse_tpu.serving.api import GenerationService
    svc = GenerationService(_runner(), max_batch_rows=8, max_wait_ms=40)

    # Warm the compiled programs (batch shapes 1 and 8) outside the clock.
    svc.generate({'prompt': 'warm', 'steps': STEPS, 'seed': 0})
    warm = [threading.Thread(target=svc.generate, args=(
        {'prompt': f'warm {i}', 'steps': STEPS, 'seed': i},))
        for i in range(8)]
    for t in warm:
        t.start()
    for t in warm:
        t.join()

    lat = []
    lock = threading.Lock()
    t0 = time.perf_counter()

    def client(cid: int):
        for r in range(REQUESTS_PER_CLIENT):
            t1 = time.perf_counter()
            svc.generate({'prompt': f'client {cid} request {r}',
                          'steps': STEPS, 'seed': cid * 100 + r})
            with lock:
                lat.append(time.perf_counter() - t1)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(CLIENTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n = CLIENTS * REQUESTS_PER_CLIENT
    lat.sort()
    stats = svc.stats()
    svc.batcher.shutdown()
    return {
        'metric': (f'serving API, {CLIENTS} concurrent clients, SD-1.4 '
                   f'512^2 {STEPS}-step CFG'),
        'images_per_min': round(60.0 * n / wall, 1),
        'latency_s_p50': round(lat[n // 2], 3),
        'latency_s_p95': round(lat[int(n * 0.95)], 3),
        'mean_rows_per_batch': round(stats['mean_rows_per_batch'], 2),
        'batches': stats['batches'] - 9,  # minus warmup
        'requests': n,
    }


if __name__ == '__main__':
    print(json.dumps(measure()))
