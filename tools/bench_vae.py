"""VAE decode cost at 512² + the mid-block attention path choice.

The decoder's mid-block attention is a 4096-token single-head d=512
attention (models/vae.py:48-70). Round 1 excluded it from the flash kernel
(dispatcher cap d<=128, with the *full-KV-resident* kernel hanging the
compiler); the round-2 KV-streaming kernel handles d=512. This measures the
whole decode and the attention op under both paths.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.models import SD14_VAE, AutoencoderKL
from flexdiffuse_tpu.ops import attention as attn_mod
from flexdiffuse_tpu.ops.flash_attention import flash_attention


def timed(fn, *args, iters=5):
    out = np.asarray(fn(*args))
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    print('devices:', jax.devices())
    rng = np.random.default_rng(0)

    # Raw attention op at the VAE mid-block shape.
    q, k, v = (jnp.asarray(
        rng.normal(size=(1, 1, 4096, 512)).astype(np.float32)).astype(
            jnp.bfloat16) for _ in range(3))
    sc = 512**-0.5
    N = 20

    @jax.jit
    def chain_xla(q):
        def body(qc, _):
            return attn_mod.xla_attention(qc, k, v, sc), None
        return jax.lax.scan(body, q, None, length=N)[0]

    @jax.jit
    def chain_flash(q):
        def body(qc, _):
            return flash_attention(qc, k, v, sc), None
        return jax.lax.scan(body, q, None, length=N)[0]

    ref = np.asarray(
        attn_mod.xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32), sc))
    try:
        got = np.asarray(flash_attention(q, k, v, sc).astype(jnp.float32))
        print(f'flash d=512 maxerr vs fp32: {np.abs(ref - got).max():.2e}')
        t, _ = timed(chain_flash, q, iters=3)
        print(f'mid-attn flash-stream: {t / N * 1e3:7.3f} ms/call')
    except Exception as e:
        print('flash d=512 FAILED:', str(e).splitlines()[0][:120])
    t, _ = timed(chain_xla, q, iters=3)
    print(f'mid-attn XLA:          {t / N * 1e3:7.3f} ms/call')

    # Whole 512² decode under each backend.
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    lat = jnp.asarray(rng.normal(size=(1, 64, 64, 4)).astype(np.float32))
    shapes = jax.eval_shape(
        lambda kk: vae.init(kk, jnp.zeros((1, 512, 512, 3)), kk),
        jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes)

    for backend in ('xla', 'flash'):
        @jax.jit
        def dec(params, lat, _b=backend):
            return vae.apply(params, lat, method=AutoencoderKL.decode,
                             backend=_b)
        try:
            t, out = timed(dec, params, lat)
            print(f'512² decode [{backend:5s}]: {t * 1e3:7.2f} ms  '
                  f'finite={np.isfinite(out.astype(np.float32)).all()}')
        except TypeError:
            # decode has no backend plumb yet — dispatcher context instead
            with attn_mod.backend(backend):
                @jax.jit
                def dec2(params, lat):
                    return vae.apply(params, lat,
                                     method=AutoencoderKL.decode)
                t, out = timed(dec2, params, lat)
                print(f'512² decode [{backend:5s}]: {t * 1e3:7.2f} ms  '
                      f'finite={np.isfinite(np.asarray(out, np.float32)).all()}')


if __name__ == '__main__':
    main()
