"""One-command real-weight parity harness (VERDICT r2 task 7).

THE first command to run when network egress / real checkpoints arrive:

    python tools/validate_reference.py --models /path/to/snapshots

runs every BASELINE.json config plus the reference's seeded experiment
protocol (seed 1337, strength 0.6, steps 30, batches 4, guidance 8, 512²,
threshold 0.25 / floor 0.75, clustered 0.25, linear 0.0–0.5, max guidance
0.35, header 0.0, optimal-fit mapping with reuse —
``/root/reference/README.md:252-267``) and writes, per config:

* images named after the reference's checked-in goldens
  (``experiments/deer_base.png`` etc., ``/root/reference/experiments/``),
* a ``parity_report.json`` with phase timings and — for the numerics
  config — the TPU-bf16 vs CPU-fp32 final-latent MSE against the
  BASELINE.json gate (``latents within 1e-2 MSE``).

Guide/init images default to the reference's own ``experiments/`` assets
(``deer_mod.webp``, ``zeus_mod.webp``, ``turtle_mod.webp``,
``deer_img2img_base.png``) so the runs reproduce the documented protocol
exactly. Pixel-identical goldens are NOT expected — torch ``Generator`` and
``jax.random`` draw different noise (SURVEY.md §7 hard part (e)) — parity is
the latent-MSE gate plus visual/semantic review of the emitted grids.

``--tiny`` dry-runs the whole harness with tiny random models (no disk
weights, 64², 2 steps) — CI coverage that every config's plumbing works;
exercised by tests/test_validate_reference.py.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_EXPERIMENTS = '/root/reference/experiments'

DEER_PROMPT = ('Deer colorful, fantasy, intricate, highly detailed, digital '
               'painting, hq, trending on artstation, illustration, '
               'lovecraftian dark ominous eldritch')
TURTLE_PROMPT = 'a photo of a turtle, hd 8k, dlsr photo'
CITY_PROMPT = 'an urban landscape, city, dslr photo'
FOREST_GUIDE = 'a painting of the deep woods, forest'

# Reference protocol defaults (README.md:252-267).
PROTOCOL = dict(strength=0.6, steps=30, samples=4, guidance_scale=8.0,
                init_size=(512, 512), guide_threshold_mult=0.25,
                guide_threshold_floor=0.75, guide_clustered=0.25,
                guide_linear=(0.0, 0.5), guide_max_guidance=0.35,
                guide_header_max=0.0, guide_mode=1, guide_reuse=True,
                seed=1337)


def _configs(exp_dir: str):
    """The five BASELINE.json configs mapped to concrete runs; each entry:
    (name, reference golden filename, gen kwargs, needs)."""
    from PIL import Image

    def img(name):
        path = os.path.join(exp_dir, name)
        return Image.open(path) if os.path.exists(path) else None

    return [
        # 1. txt2img, no guidance — the fp32-CPU numerics config.
        ('t2i_base', 'deer_base.png',
         dict(prompt=DEER_PROMPT, guide=None), 'numerics'),
        # 2. linear trailing-embed style guidance (turtle experiment).
        ('linear_style', 'turtle_modded_defaults.png',
         dict(prompt=TURTLE_PROMPT, guide=img('turtle_mod.webp'),
              guide_threshold_mult=0.0, guide_clustered=0.0), 'guide'),
        # 3. clustered + threshold with full similarity mapping (protocol
        #    defaults; deer modifier).
        ('clustered_threshold', 'deer_modded_defaults.png',
         dict(prompt=DEER_PROMPT, guide=img('deer_mod.webp'),
              guide_threshold_floor=0.2), 'guide'),
        # 4. img2img latent init + image guidance (deer img2img path).
        ('img2img_guided', 'deer_img2img_defaults.png',
         dict(prompt=DEER_PROMPT, guide=img('deer_mod.webp'),
              init_image=img('deer_img2img_base.png'),
              guide_threshold_floor=0.2), 'img2img'),
        # text2text tween (city/forest — README "Text2Text tweening").
        ('text2text', 'city_photo_forest_blend.png',
         dict(prompt=CITY_PROMPT, guide=FOREST_GUIDE), None),
    ]


def _build_runner(args):
    from flexdiffuse_tpu.config import RunConfig
    if args.tiny:
        import jax
        import jax.numpy as jnp
        from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                            CLIPVisionModel, TINY_TEXT,
                                            TINY_UNET, TINY_VAE, TINY_VISION,
                                            UNet2DCondition)
        from flexdiffuse_tpu.runner import Runner
        from flexdiffuse_tpu.text.tokenizer import FakeTokenizer
        k = jax.random.PRNGKey(0)
        text = CLIPTextModel(TINY_TEXT)
        tp = jax.jit(lambda kk: text.init(
            kk, jnp.zeros((1, 77), jnp.int32)))(k)
        vision = CLIPVisionModel(TINY_VISION)
        vp = jax.jit(lambda kk: vision.init(
            kk, jnp.zeros((1, 32, 32, 3))))(k)
        unet = UNet2DCondition(TINY_UNET)
        up = jax.jit(lambda kk: unet.init(
            kk, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
            jnp.zeros((1, 77, TINY_TEXT.hidden_size))))(k)
        vae = AutoencoderKL(TINY_VAE)
        vp2 = jax.jit(lambda kk: vae.init(
            kk, jnp.zeros((1, 16, 16, 3)), kk))(k)
        return Runner.from_models(text, tp, vision, vp, unet, up, vae, vp2,
                                  FakeTokenizer(),
                                  config=RunConfig(output_dir=args.out))
    from flexdiffuse_tpu.runner import Runner
    return _ensure_exact(Runner(model_root=args.models,
                                config=RunConfig(output_dir=args.out),
                                scheduler=args.scheduler))


def _ensure_exact(runner):
    """Parity runs must use the EXACT path (VERDICT r4 #8): the protocol
    images are seeded visual goldens, so every approximation accelerator
    (DeepCache / ToMe / PAG layers / FreeU) is forced off regardless of
    ambient config — their drift would be misread as parity failure."""
    if getattr(runner.pipe, 'deepcache', 0):
        runner.disable_deepcache()
    if getattr(runner.pipe.unet, 'tome', None) is not None:
        runner.disable_tome()
    if getattr(runner.pipe.unet, 'pag_layers', None) is not None:
        runner.disable_pag()
    if getattr(runner.pipe.unet, 'freeu', None) is not None:
        runner.disable_freeu()
    return runner


def _final_latents(runner, kwargs):
    """Run one seeded config and capture the final (pre-decode) latents."""
    import numpy as np
    captured = {}
    orig = runner.pipe.decode_u8_device

    def spy(latents):
        captured['lat'] = np.asarray(latents, np.float32)
        return orig(latents)

    runner.pipe.decode_u8_device = spy
    try:
        runner.gen(**kwargs, save=False)
    finally:
        runner.pipe.decode_u8_device = orig
    return captured['lat']


def _latent_mse_vs_cpu_fp32(runner, args, kwargs, report):
    """BASELINE.json numerics gate: the same seeded config's final latents
    on the default backend (TPU, bf16 compute) vs a CPU fp32 run of the
    same weights."""
    import jax
    import numpy as np

    lat_default = _final_latents(runner, kwargs)
    cpu_args = argparse.Namespace(**vars(args))
    with jax.default_device(jax.devices('cpu')[0]):
        if args.tiny:
            cpu_runner = _build_runner(cpu_args)  # deterministic tiny init
        else:
            from flexdiffuse_tpu.config import RunConfig
            from flexdiffuse_tpu.runner import Runner
            import jax.numpy as jnp
            cpu_runner = Runner(model_root=args.models,
                                config=RunConfig(output_dir=args.out),
                                scheduler=args.scheduler, dtype=jnp.float32)
        lat_cpu = _final_latents(cpu_runner, kwargs)
    mse = float(np.mean((lat_default - lat_cpu)**2))
    report['latent_mse_vs_cpu_fp32'] = mse
    report['latent_mse_gate_1e-2'] = bool(mse <= 1e-2)
    return mse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--models', default='./models',
                    help='dir with SD-1.4 + CLIP ViT-L/14 HF snapshots')
    ap.add_argument('--out', default='./validate_out')
    ap.add_argument('--experiments', default=REFERENCE_EXPERIMENTS,
                    help='reference experiments/ dir (guide + init assets)')
    ap.add_argument('--scheduler', default='pndm')
    ap.add_argument('--configs', default='',
                    help='comma-separated subset of config names')
    ap.add_argument('--tiny', action='store_true',
                    help='dry-run with tiny random models (CI plumbing '
                         'check; no real weights needed)')
    ap.add_argument('--steps', type=int, default=0,
                    help='override protocol steps (tiny mode defaults to 2)')
    ap.add_argument('--samples', type=int, default=0)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    runner = _build_runner(args)

    protocol = dict(PROTOCOL)
    if args.tiny:
        protocol.update(steps=2, samples=1, init_size=(64, 64))
    if args.steps:
        protocol['steps'] = args.steps
    if args.samples:
        protocol['samples'] = args.samples

    only = {c for c in args.configs.split(',') if c}
    report = {'protocol': {k: str(v) for k, v in protocol.items()},
              'tiny': args.tiny, 'configs': {}}
    for name, golden, kw, needs in _configs(args.experiments):
        if only and name not in only:
            continue
        cfg_report = {'reference_golden': golden}
        run_kw = dict(protocol)
        run_kw.update(kw)
        if needs in ('guide', 'img2img') and run_kw.get('guide') is None \
                and not args.tiny:
            cfg_report['skipped'] = f'missing asset under {args.experiments}'
            report['configs'][name] = cfg_report
            continue
        if args.tiny:
            # Tiny vision tower wants its own input size; swap real assets
            # for synthetic ones (a pre-processed NHWC array for the guide —
            # CLIPEncoder.image accepts those directly).
            if needs in ('guide', 'img2img'):
                import numpy as np
                rng = np.random.default_rng(0)
                if needs == 'img2img':
                    # Pre-processed NHWC in [-1,1]: a PIL image would be
                    # snapped to 512 by preprocess (reference C1 semantics),
                    # which at tiny geometry means a 256² latent and an
                    # S²=65536² XLA attention — keep it the tiny size.
                    run_kw['init_image'] = rng.uniform(
                        -1, 1, (1, 64, 64, 3)).astype(np.float32)
                if not isinstance(run_kw.get('guide'), str):
                    from flexdiffuse_tpu.models import TINY_VISION
                    s = TINY_VISION.image_size
                    run_kw['guide'] = rng.normal(
                        size=(1, s, s, 3)).astype(np.float32)
        t0 = time.time()
        imgs, grid = runner.gen(**run_kw, save=False)
        cfg_report['wall_s'] = round(time.time() - t0, 2)
        cfg_report['images'] = len(imgs)
        grid.save(os.path.join(args.out, golden))
        if name == 't2i_base':
            single = {**run_kw, 'samples': 1}
            mse = _latent_mse_vs_cpu_fp32(runner, args, single, cfg_report)
            print(f'[{name}] latent MSE (default backend vs CPU fp32): '
                  f'{mse:.3e} (gate 1e-2)')
        report['configs'][name] = cfg_report
        print(f'[{name}] -> {golden} ({cfg_report["wall_s"]}s, '
              f'{len(imgs)} images)')

    timer = getattr(runner, 'timer', None)
    if timer is not None:
        try:
            report['phase_summary'] = timer.summary()
        except Exception:
            pass
    with open(os.path.join(args.out, 'parity_report.json'), 'w') as f:
        json.dump(report, f, indent=2)
    print(f'report: {os.path.join(args.out, "parity_report.json")}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
