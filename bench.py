"""Benchmark: the full SD-1.x north-star metric set on one chip.

Prints the metric JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}``
as soon as the primary measurements finish, then RE-prints the complete
record after each extra lands (same schema, growing) — the LAST line on
stdout is always the most complete parseable record, and a driver timeout
can no longer erase the primary metric (the round-4 failure mode).

Primary value — denoise-loop steps/sec — measures the real product
workload: the compiled ``lax.scan`` sampling loop (CFG-doubled UNet + PLMS
scheduler update per step, the exact program ``FlexPipeline`` runs) at
512×512 with the true SD-1.4 UNet geometry in bf16, random weights. Steps
are data-dependent (each consumes the previous latents), so the timing
cannot be inflated by async dispatch overlap.

Extras carry the rest of BASELINE.json's metric set: end-to-end p50 image
latency (CLIP ViT-L/14 text encode + 25-step denoise + VAE 512² decode +
host fetch) and the per-phase on-wall breakdown.

The reference publishes no perf numbers (BASELINE.md); ``vs_baseline``
compares the Pallas flash-attention path against the same framework's
fused-XLA attention path — the strongest non-kernel TPU baseline.
"""
from __future__ import annotations

import json
import os
import sys
import time

STEPS = 25
IMAGE = 512

# Persistent compilation cache: the repo-local dir survives across rounds,
# so driver re-runs skip the multi-minute SD/SDXL scan compiles.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   '.jax_cache'))


def _params_like(shapes):
    """Random-filled params with the PRODUCT dtype policy: matmul/conv
    kernels pre-cast bf16, 1-D norm params fp32 (utils/params.py — what
    FlexPipeline holds after construction; bit-identical to fp32 storage)."""
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01,
                           jnp.bfloat16 if len(s.shape) >= 2 else s.dtype),
        shapes)


def _jit(fn):
    """Product-parity jit: same TPU compiler options as FlexPipeline."""
    import functools
    import jax

    from flexdiffuse_tpu.utils.params import product_compiler_options
    return functools.partial(jax.jit,
                             compiler_options=product_compiler_options())(fn)


def _build(scheduler_steps: int = STEPS, batch: int = 1):
    import jax
    import jax.numpy as jnp

    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    hw = IMAGE // 8
    latents = jnp.zeros((batch, hw, hw, 4), jnp.float32)
    ctx = jnp.zeros((2 * batch, 77, 768), jnp.float32)  # uncond + cond
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2 * batch, hw, hw, 4)),
                            jnp.zeros((2 * batch,)), ctx),
        jax.random.PRNGKey(0))
    params = _params_like(shapes)

    schedule = schedulers.make('pndm', scheduler_steps)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    @_jit
    def sample(params, latents, state, ctx, gs):
        def body(carry, i):
            lat, state = carry
            lat2 = jnp.concatenate([lat, lat])
            t = jnp.broadcast_to(schedule.timesteps[i], (2 * batch,))
            eps = unet.apply(params, lat2, t, ctx)
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + gs * (eps_c - eps_u)
            state, lat = schedulers.step(schedule, state, eps, i, i, lat,
                                         None, 0.0)
            return (lat, state), None

        (lat, _), _ = jax.lax.scan(body, (latents, state),
                                   jnp.arange(schedule.length))
        return lat

    args = (params, latents, state0, ctx, jnp.float32(8.0))
    return sample, args, schedule.length


def _time(sample, args, length: int, iters: int = 3):
    import numpy as np
    out = np.asarray(sample(*args))  # compile + warmup, fetch-forced
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = np.asarray(sample(*args))
        best = min(best, time.perf_counter() - t0)
    return length / best, best


def _build_e2e(sample, sample_args):
    """CLIP text encode + denoise scan + VAE decode, timed per phase."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexdiffuse_tpu.models import (CLIP_VIT_L14_TEXT, SD14_VAE,
                                        AutoencoderKL, CLIPTextModel)

    clip = CLIPTextModel(CLIP_VIT_L14_TEXT, dtype=jnp.bfloat16)
    tokens = jnp.zeros((2, 77), jnp.int32)  # uncond + cond prompts
    clip_shapes = jax.eval_shape(lambda k: clip.init(k, tokens),
                                 jax.random.PRNGKey(0))
    clip_params = _params_like(clip_shapes)

    @_jit
    def encode(params, tokens):
        return clip.apply(params, tokens)

    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    vae_shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, IMAGE, IMAGE, 3)), k),
        jax.random.PRNGKey(0))
    vae_params = _params_like(vae_shapes)

    @_jit
    def decode(params, latents):
        img = vae.apply(params, latents / 0.18215,
                        method=AutoencoderKL.decode)
        img = jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)
        # uint8 on-device: 4x less host-fetch traffic (the PIL product path).
        return jnp.round(img * 255.0).astype(jnp.uint8)

    def one_image():
        """Pipelined: encode→scan→decode dispatched back to back, ONE host
        fetch at the end — the product path (runner dispatches everything
        and fetches device-quantized u8); no device→host→device context
        roundtrip."""
        params, latents, state, _, gs = sample_args
        t0 = time.perf_counter()
        ctx = encode(clip_params, tokens).astype(jnp.float32)
        lat = sample(params, latents, state, ctx, gs)
        img = np.asarray(decode(vae_params, lat))
        t1 = time.perf_counter()
        assert img.shape == (1, IMAGE, IMAGE, 3)
        return t1 - t0

    def one_image_phased():
        """Per-phase-synced variant for the breakdown (each phase forces a
        fetch, so the sum exceeds the pipelined latency by relay RTTs)."""
        t0 = time.perf_counter()
        ctx = np.asarray(encode(clip_params, tokens))
        t1 = time.perf_counter()
        params, latents, state, _, gs = sample_args
        lat = sample(params, latents, state,
                     jnp.asarray(ctx, jnp.float32), gs)
        lat.block_until_ready()
        t2 = time.perf_counter()
        img = np.asarray(decode(vae_params, lat))
        t3 = time.perf_counter()
        return (t1 - t0, t2 - t1, t3 - t2)

    one_image()  # compile everything
    one_image_phased()
    return one_image, one_image_phased


def _serving_batch4(rounds: int = 3):
    """Batch-4 serving throughput: overlapped dispatch (every round's scan +
    device u8 decode queued before any fetch) vs the serial fetch-per-round
    loop the reference uses (utils.py:85-112)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexdiffuse_tpu.models import SD14_VAE, AutoencoderKL

    sample, args, length = _build(STEPS, batch=4)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    vae_shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, IMAGE, IMAGE, 3)), k),
        jax.random.PRNGKey(0))
    vae_params = _params_like(vae_shapes)

    @_jit
    def decode(params, latents):
        img = vae.apply(params, latents / 0.18215,
                        method=AutoencoderKL.decode)
        img = jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)
        return jnp.round(img * 255.0).astype(jnp.uint8)

    def round_out():
        lat = sample(*args)
        return decode(vae_params, lat)

    _ = np.asarray(round_out())  # compile

    t0 = time.perf_counter()
    for _ in range(rounds):
        _ = np.asarray(round_out())        # serial: fetch before next round
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    pending = [round_out() for _ in range(rounds)]  # all rounds queued
    for p in pending:
        _ = np.asarray(p)
    overlapped = time.perf_counter() - t0

    per_image_factor = (STEPS + 1) / STEPS  # 25-step gen ≈ 26 scan steps
    imgs = 4 * rounds
    return {
        'images_per_min': round(60.0 * imgs / (overlapped * per_image_factor),
                                1),
        'serial_images_per_min': round(
            60.0 * imgs / (serial * per_image_factor), 1),
    }


def main() -> None:
    """Timeout-proof protocol (round-4 postmortem: BENCH_r04 rc=124 lost
    every number because the JSON printed only after ~5 chained subprocess
    benches). Now:

    1. Measure the PRIMARY metric set in-process (~3 min warm via the
       persistent compile cache) and print the full JSON line immediately.
    2. Run extras one at a time under ONE global wall-clock budget
       (BENCH_BUDGET_S, default 20 min) and RE-PRINT the complete record
       after each — so whatever line is last on stdout when a driver
       timeout hits is always a full, parseable record containing the
       primary metric plus every extra finished so far. Extras that don't
       fit the remaining budget are marked ``{"skipped": "budget"}``.
    """
    import numpy as np

    from flexdiffuse_tpu.ops import attention

    t_start = time.monotonic()
    # 45 min default: fits the full warm extra set (~35-40 min measured,
    # incl. relay-latency swings) and still exits inside the driver's
    # observed kill window (round-3's ~55-min cold bench survived;
    # round-4's >110-min one did not). The budget bounds total wall time:
    # extras launch only while it has >60 s left and each is capped by the
    # time remaining.
    budget = float(os.environ.get('BENCH_BUDGET_S', '2700'))

    with attention.backend('flash'):
        sample, args, length = _build()
        flash_sps, flash_t = _time(sample, args, length)

        one_image, one_image_phased = _build_e2e(sample, args)
        runs = [one_image() for _ in range(7)]
        p50 = float(np.median(runs))
        phase = np.median(np.array([one_image_phased() for _ in range(5)]),
                          axis=0)

    with attention.backend('xla'):
        sample_xla, args_xla, _ = _build()
        xla_sps, _ = _time(sample_xla, args_xla, length)

    record = {
        'metric': ('sd1.4 512x512 CFG denoise-loop steps/sec/chip '
                   f'(bf16, PLMS, {STEPS}-step scan)'),
        'value': round(flash_sps, 3),
        # vs_baseline compares THIS FRAMEWORK's Pallas flash-attention path
        # against its own fused-XLA attention path on the same chip — the
        # reference publishes no performance numbers at all (BASELINE.md),
        # so there is no cross-framework baseline to quote.
        'vs_baseline': round(flash_sps / xla_sps, 3),
        'vs_baseline_is': 'flash vs fused-XLA attention, same framework',
        'unit': 'steps/sec',
        'e2e_p50_latency_s': round(p50, 4),
        'images_per_min_e2e': round(60.0 / p50, 2),
        # Phase numbers are measured with per-phase host syncs; clip/decode
        # phases are dominated by the axon relay RTT (~25-80 ms/dispatch) in
        # this environment, so their sum exceeds the pipelined p50.
        'phase_ms': {
            'clip_encode': round(float(phase[0]) * 1e3, 2),
            'denoise_scan': round(float(phase[1]) * 1e3, 2),
            'vae_decode_fetch': round(float(phase[2]) * 1e3, 2),
        },
    }
    print(json.dumps(record), flush=True)   # primary metric is now safe

    def remaining() -> float:
        return budget - (time.monotonic() - t_start)

    # Serving throughput in-process (shares the already-live SD-1.4 UNet;
    # batch-4 scan compile is cached across rounds).
    if remaining() > 120:
        with attention.backend('flash'):
            record['serving_batch4'] = _serving_batch4()
    else:
        record['serving_batch4'] = {'skipped': 'budget'}
    print(json.dumps(record), flush=True)

    # Subprocess extras, highest-value first. Each owns multi-GB buffers
    # that don't fit next to this process's live SD-1.4 state (SDXL alone
    # is 2.5B params — in-process it hits RESOURCE_EXHAUSTED on the 16 GB
    # chip). Per-tool cap AND the global budget bound every run; the full
    # record re-prints after each so a driver timeout can only lose the
    # not-yet-finished extras.
    import subprocess

    def _sub(tool, cap):
        t = min(cap, remaining())
        if t < 60:
            return {'skipped': 'budget'}
        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              'tools', tool), '--json'],
                capture_output=True, text=True, timeout=t)
            return json.loads(proc.stdout.strip().splitlines()[-1])
        except Exception as e:
            return {'error': str(e)[:200]}

    # Caps absorb the axon relay's observed latency swings (a subprocess's
    # platform init + executable loads vary 2-3x across hours); the global
    # budget, not the caps, bounds the total.
    for key, tool, cap in (
            ('deepcache', 'bench_deepcache.py', 900),
            ('cfg_interval', 'cfg_interval_exp.py', 720),
            ('sdxl', 'bench_sdxl.py', 720),
            ('lcm_4step', 'bench_lcm.py', 480),
            ('training', 'bench_train.py', 900),
    ):
        record[key] = _sub(tool, cap)
        print(json.dumps(record), flush=True)


if __name__ == '__main__':
    sys.exit(main())
