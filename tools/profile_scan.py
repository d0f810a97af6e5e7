"""Capture + parse a TPU profile of the SD-1.4 sampling scan.

Produces an op-kind time breakdown from the xplane trace (the tensorboard
plugin's own converter is broken in this environment, so the xplane proto is
parsed directly). Run: ``PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
python tools/profile_scan.py``.
"""
from __future__ import annotations

import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np


def capture(trace_dir: str) -> None:
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import SD14_UNET, UNet2DCondition
    from flexdiffuse_tpu.models.configs import SDXL_UNET

    # CM=1 → channel-major, CM=0 → standard, unset → auto (models/unet.py).
    cm_env = os.environ.get('CM')
    sdxl = bool(os.environ.get('SDXL'))  # SDXL=1 → SDXL-base at 1024²
    cfg = SDXL_UNET if sdxl else SD14_UNET
    unet = UNet2DCondition(
        cfg, dtype=jnp.bfloat16,
        channel_major=None if cm_env is None else cm_env == '1')
    hw = 128 if sdxl else 64
    latents = jnp.zeros((1, hw, hw, 4), jnp.float32)
    ctx = jnp.zeros((2, 77, cfg.cross_attention_dim), jnp.float32)
    added = None
    if sdxl:
        added = {
            'text_embeds': jnp.zeros((2, 1280), jnp.float32),
            'time_ids': jnp.tile(
                jnp.asarray([[1024, 1024, 0, 0, 1024, 1024]], jnp.float32),
                (2, 1)),
        }
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, hw, hw, 4)), jnp.zeros((2,)),
                            ctx, added), jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 1e-3,
                           jnp.bfloat16 if sdxl and len(s.shape) >= 2
                           else s.dtype), shapes)
    if os.environ.get('BF16_MM'):  # pre-cast matmul/conv params (bit-ident.)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.ndim >= 2 else a, params)
    schedule = schedulers.make('dpmpp' if sdxl else 'pndm',
                               8 if sdxl else 12)
    state0 = schedulers.init_state(schedule, latents.shape, latents.dtype)

    @jax.jit
    def sample(params, latents, state, ctx, added, gs):
        def body(carry, i):
            lat, state = carry
            lat2 = jnp.concatenate([lat, lat])
            t = jnp.broadcast_to(schedule.timesteps[i], (2,))
            eps = unet.apply(params, lat2, t, ctx, added)
            eu, ec = jnp.split(eps, 2)
            state, lat = schedulers.step(schedule, state, eu + gs * (ec - eu),
                                         i, i, lat, None, 0.0)
            return (lat, state), None

        (lat, _), _ = jax.lax.scan(body, (latents, state),
                                   jnp.arange(schedule.length))
        return lat

    args = (params, latents, state0, ctx, added, jnp.float32(8.0))
    _ = np.asarray(sample(*args))
    jax.profiler.start_trace(trace_dir)
    _ = np.asarray(sample(*args))
    jax.profiler.stop_trace()


def analyze(trace_dir: str, steps: int = 13) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = glob.glob(f'{trace_dir}/**/*.xplane.pb', recursive=True)[0]
    xs = xplane_pb2.XSpace()
    with open(path, 'rb') as f:
        xs.ParseFromString(f.read())
    plane = [p for p in xs.planes if 'TPU' in p.name][0]
    meta = {k: v.name for k, v in plane.event_metadata.items()}
    for line in plane.lines:
        if 'XLA Ops' != line.name:
            continue
        agg = collections.Counter()
        for ev in line.events:
            name = meta.get(ev.metadata_id, '?')
            kind = re.sub(r'%?([a-zA-Z_\-]+)[\.\d]*\s*=?.*', r'\1', name)
            if kind == 'while':
                continue  # scan container, not exclusive time
            agg[kind] += ev.duration_ps
        total = sum(agg.values())
        print(f'XLA op time {total/1e9:.1f} ms over ~{steps} steps '
              f'({total/1e9/steps:.2f} ms/step):')
        for k, ps in agg.most_common(15):
            print(f'  {ps/1e9:8.2f} ms {100*ps/total:5.1f}% '
                  f'{ps/1e9/steps:6.2f} ms/step  {k}')
    # Per-op-name breakdown: which individual ops carry each bucket.
    for line in plane.lines:
        if 'XLA Ops' != line.name:
            continue
        by_name = collections.Counter()
        counts = collections.Counter()
        for ev in line.events:
            name = meta.get(ev.metadata_id, '?')
            if name.startswith('%while') or name.startswith('while'):
                continue
            by_name[name] += ev.duration_ps
            counts[name] += 1
        print('\ntop individual ops (exclusive, per ~%d steps):' % steps)
        top_n = int(os.environ.get('TOP_N', '40'))
        for k, ps in by_name.most_common(top_n):
            print(f'  {ps/1e9:8.2f} ms  n={counts[k]:4d}  '
                  f'{ps/1e9/steps:6.3f} ms/step  {k[:110]}')


if __name__ == '__main__':
    d = (sys.argv[1] if len(sys.argv) > 1
         else tempfile.mkdtemp(prefix='fxprof_'))
    capture(d)
    analyze(d, steps=8 if os.environ.get('SDXL') else 13)
