"""Accuracy budget for the approximation stack (VERDICT r4 #3).

The reference's only quality mechanism is seeded visual comparison of its
23 experiment images (README.md:252-267). Our accelerators — DeepCache,
CFG-interval, ToMe, PAG — change outputs *by design*; this harness pins
how much, so a refactor that silently degrades an approximation fails CI.

Protocol: run the PRODUCT sampling path (``FlexPipeline.__call__`` →
``output_type='latent'``) exact vs each approximation (and the shipped
combos) at fixed seeds/random weights, and record

* ``rel_mse``  — mean((approx − exact)²) / mean(exact²)
* ``max_rel``  — max|approx − exact| / max|exact|

into ``tests/goldens/accuracy_budget.json``. ``tests/test_accuracy_budget
.py`` re-measures the tiny geometry on CPU and asserts every config stays
within ``bound = recorded × BOUND_SLACK`` — a change that doubles drift
amplitude (≈4× rel_mse) trips the test with a wide margin.

Notes:
* PAG is not an approximation of the exact output (it intentionally
  steers the prediction); its entry is a sanity corridor — finite, and
  the change magnitude stays in the recorded band (both bounded above
  and required nonzero so a silently-disabled PAG also fails).
* ToMe at tiny geometry needs a ≥256-token grid (ops/tome.py resolve_r
  keeps the reduced length a multiple of 128), so the tiny runs use
  128×128 images (16×16 latents) and ratio 0.5 — the published sweet
  spot and what bench.py ships.

Usage:
  python tools/accuracy_budget.py --golden   # (re)write the goldens, CPU
  python tools/accuracy_budget.py            # print tiny-geometry drift
  python tools/accuracy_budget.py --full     # full SD-1.4 geometry (TPU),
                                             # recorded as informational
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, '/root/repo')

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tests', 'goldens', 'accuracy_budget.json')
BOUND_SLACK = 2.0
STEPS = 25


def _tiny_parts():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexdiffuse_tpu.models import (TINY_UNET, TINY_VAE, AutoencoderKL,
                                        UNet2DCondition)

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, TINY_UNET.cross_attention_dim)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(
        rng.normal(size=(1, 77, TINY_UNET.cross_attention_dim)).astype(np.float32))
    unc = jnp.asarray(
        rng.normal(size=(1, 77, TINY_UNET.cross_attention_dim)).astype(np.float32))
    return dict(unet=unet, up=up, vae=vae, vp=vp, emb=emb, unc=unc,
                size=(128, 128), tome_min_seq=256)


def _full_parts():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexdiffuse_tpu.models import (SD14_UNET, SD14_VAE, AutoencoderKL,
                                        UNet2DCondition)

    unet = UNet2DCondition(SD14_UNET, dtype=jnp.bfloat16)
    vae = AutoencoderKL(SD14_VAE, dtype=jnp.bfloat16)
    u_shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((2, 64, 64, 4)), jnp.zeros((2,)),
                            jnp.zeros((2, 77, 768))), jax.random.PRNGKey(0))
    v_shapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3)), k),
        jax.random.PRNGKey(0))

    def _mk_tree(shapes):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)

        @jax.jit
        def build():
            k = jax.random.PRNGKey(0)
            return [jax.random.normal(jax.random.fold_in(k, i), s.shape,
                                      jnp.float32) * 0.02
                    for i, s in enumerate(leaves)]

        return jax.tree_util.tree_unflatten(treedef, build())

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 768)).astype(np.float32) * .3)
    unc = jnp.asarray(rng.normal(size=(1, 77, 768)).astype(np.float32) * .3)
    return dict(unet=unet, up=_mk_tree(u_shapes), vae=vae,
                vp=_mk_tree(v_shapes), emb=emb, unc=unc, size=(512, 512),
                tome_min_seq=4096)


# Config name -> (pipeline kwargs, unet clone kwargs, guide replace kwargs).
# `tome_min_seq`/`pag_layers` placeholders resolve per geometry.
def configs(parts):
    import jax.numpy as jnp
    ms = parts['tome_min_seq']
    return {
        'deepcache2': (dict(deepcache=2), {}, {}),
        'deepcache3': (dict(deepcache=3), {}, {}),
        'cfg_interval_0_06': ({}, {}, dict(cfg_interval=True,
                                           cfg_from=jnp.float32(0.0),
                                           cfg_to=jnp.float32(0.6))),
        'tome_05': ({}, dict(tome=(0.5, ms)), {}),
        'pag_mid_3': ({}, dict(pag_layers=('mid',)),
                      dict(pag=True, pag_scale=jnp.float32(3.0))),
        'deepcache3_interval': (dict(deepcache=3), {},
                                dict(cfg_interval=True,
                                     cfg_from=jnp.float32(0.0),
                                     cfg_to=jnp.float32(0.6))),
        'tome05_deepcache3': (dict(deepcache=3), dict(tome=(0.5, ms)), {}),
    }


def _run(parts, pipe_kw, unet_kw, guide_kw):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from flexdiffuse_tpu.pipeline import FlexPipeline
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance

    unet = parts['unet'].clone(**unet_kw) if unet_kw else parts['unet']
    pipe = FlexPipeline(unet, parts['up'], parts['vae'], parts['vp'],
                        scheduler='pndm', **pipe_kw)
    g = SimpleGuidance(embeddings=parts['emb'], uncond=parts['unc'],
                       guidance_scale=jnp.float32(8.0), cfg=True)
    if guide_kw:
        g = g.replace(**guide_kw)
    out = pipe(g, steps=STEPS, init_size=parts['size'],
               key=jax.random.PRNGKey(7), output_type='latent')
    return np.asarray(out.images, np.float64)


def measure(parts) -> dict:
    import numpy as np
    exact = _run(parts, {}, {}, {})
    e_ms = float(np.mean(exact**2))
    e_max = float(np.abs(exact).max())
    out = {}
    for name, (pk, uk, gk) in configs(parts).items():
        lat = _run(parts, pk, uk, gk)
        assert np.isfinite(lat).all(), name
        out[name] = {
            'rel_mse': float(np.mean((lat - exact)**2) / e_ms),
            'max_rel': float(np.abs(lat - exact).max() / e_max),
        }
    return out


def main() -> int:
    if '--full' not in sys.argv:
        # Goldens come from the CPU platform — the same one the regression
        # test runs on (tests/conftest.py forces CPU; platform numerics
        # must match for tight bounds). Share the test suite's persistent
        # compile cache so tool/test runs warm each other.
        import jax
        jax.config.update('jax_platforms', 'cpu')
        jax.config.update('jax_compilation_cache_dir', os.path.join(
            os.path.dirname(GOLDEN), '..', '.jax_cache_cpu'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

    if '--full' in sys.argv:
        from flexdiffuse_tpu.utils.compile_cache import \
            enable_compilation_cache
        enable_compilation_cache('/root/repo/.jax_cache')
        drift = measure(_full_parts())
        print(json.dumps({'full_geometry': drift}, indent=1))
        if '--golden' in sys.argv and os.path.exists(GOLDEN):
            with open(GOLDEN) as f:
                data = json.load(f)
            data['full_geometry_informational'] = {
                'steps': STEPS, 'size': 512, 'drift': drift}
            with open(GOLDEN, 'w') as f:
                json.dump(data, f, indent=1, sort_keys=True)
                f.write('\n')
        return 0

    drift = measure(_tiny_parts())
    print(json.dumps(drift, indent=1))
    if '--golden' in sys.argv:
        data = {
            'protocol': {
                'steps': STEPS, 'size': 128, 'scheduler': 'pndm',
                'guidance_scale': 8.0, 'platform': 'cpu',
                'bound_slack': BOUND_SLACK,
            },
            'tiny_geometry': {
                name: {
                    'recorded': m,
                    'bound': {k: v * BOUND_SLACK for k, v in m.items()},
                } for name, m in drift.items()
            },
        }
        if os.path.exists(GOLDEN):
            with open(GOLDEN) as f:
                old = json.load(f)
            if 'full_geometry_informational' in old:
                data['full_geometry_informational'] = \
                    old['full_geometry_informational']
        with open(GOLDEN, 'w') as f:
            json.dump(data, f, indent=1, sort_keys=True)
            f.write('\n')
        print(f'wrote {GOLDEN}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
