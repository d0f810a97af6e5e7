"""Training throughput at REAL SD-1.4 geometry on one chip.

Measures the full jitted train step (forward + backward + AdamW) at 512²
latents (64×64×4) with the true 860M-param UNet in bf16-compute/fp32-param
mixed precision, for both modes:

* **LoRA** (rank 8, attention + GEGLU targets): optimizer state is tiny —
  the whole thing fits comfortably; remat='none'.
* **full fine-tune**: fp32 params (3.44 GB) + grads + Adam m/v ≈ 13.8 GB —
  needs remat to fit activations next to that on a 16 GB chip; measured
  with remat='full' and the largest batch that fits.

Timing: scan-chained steps (data-dependent: each step consumes the
previous params), fetch-forced — the same methodology as bench.py.
Run: ``python tools/bench_train.py [--json]``.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flexdiffuse_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache('/root/repo/.jax_cache')  # shared bench-tool cache
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__))),
                          '.jax_cache'))

import jax
import jax.numpy as jnp
import numpy as np


def _measure(step, tree, opt_state, lat, ctx, steps=8):
    key = jax.random.PRNGKey(0)
    # Warm (compile) + one timed chain of data-dependent steps.
    tree1, opt1, loss = step(tree, opt_state, lat, ctx, key)
    jax.block_until_ready(tree1)
    t0 = time.perf_counter()
    t, o = tree1, opt1
    for i in range(steps):
        t, o, loss = step(t, o, lat, ctx, jax.random.fold_in(key, i))
    _ = float(loss)  # fetch forces the chain
    dt = (time.perf_counter() - t0) / steps
    return dt, float(loss)


def measure(batch_lora: int = 4, batch_full: int = 4) -> dict:
    from flexdiffuse_tpu import training
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    def batch(b):
        lat = jnp.asarray(rng.normal(size=(b, 64, 64, 4)).astype(np.float32))
        ctx = jnp.asarray(rng.normal(size=(b, 77, 768)).astype(np.float32))
        return lat, ctx

    # REAL flax init (jitted: eager init dispatches hundreds of relay
    # round-trips) — constant-fill params drive the loss to NaN within a
    # few optimizer steps, which would invalidate the timing. The train
    # step donates its param/opt-state arguments, so each mode re-inits.
    fresh_params = jax.jit(lambda k: unet.init(
        k, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 77, 768))))
    params = fresh_params(jax.random.PRNGKey(0))

    out = {'metric': 'sd1.4 512x512 train step (bf16 compute, fp32 Adam)'}

    # LoRA
    lat, ctx = batch(batch_lora)
    cfg = training.TrainConfig(learning_rate=1e-4, remat='dots')
    factors = training.init_lora(params, rank=8)
    step, tx = training.make_lora_train_step(unet, params, cfg)
    try:
        dt, loss = _measure(step, factors, tx.init(factors), lat, ctx)
        out['lora_rank8'] = {
            'batch': batch_lora, 'step_ms': round(dt * 1e3, 1),
            'images_per_sec': round(batch_lora / dt, 2),
            'modules': len(factors), 'remat': cfg.remat,
            'finite': bool(np.isfinite(loss)),
        }
    except Exception as e:
        out['lora_rank8'] = {'error': str(e)[:200]}
    del step, factors

    # Full fine-tune (remat to fit; fall back through batch sizes on OOM).
    for b in (batch_full, 2, 1):
        lat, ctx = batch(b)
        cfg = training.TrainConfig(learning_rate=1e-5, remat='full')
        step, tx = training.make_train_step(unet, cfg)
        try:
            # prior attempt's tree was donated
            params = fresh_params(jax.random.PRNGKey(0))
            dt, loss = _measure(step, params, tx.init(params), lat, ctx,
                                steps=4)
            out['full_finetune'] = {
                'batch': b, 'step_ms': round(dt * 1e3, 1),
                'images_per_sec': round(b / dt, 2), 'remat': cfg.remat,
                'finite': bool(np.isfinite(loss)),
            }
            break
        except Exception as e:
            msg = str(e)
            if 'RESOURCE_EXHAUSTED' not in msg and 'memory' not in msg.lower():
                out['full_finetune'] = {'error': msg[:200]}
                break
            out['full_finetune'] = {'error': f'OOM at batch {b}'}
    return out


if __name__ == '__main__':
    print(json.dumps(measure()))
