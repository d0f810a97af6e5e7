"""CLI surface tests + data-parallel sweep test on the virtual mesh."""
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cli(*args):
    return subprocess.run([sys.executable, '-m', 'flexdiffuse_tpu.cli',
                           *args], capture_output=True, text=True,
                          cwd='/root/repo')


def test_cli_help_lists_subcommands():
    r = _cli('--help')
    assert r.returncode == 0
    for cmd in ('convert', 'generate', 'compose', 'serve'):
        assert cmd in r.stdout


def test_cli_generate_help_has_reference_params():
    r = _cli('generate', '--help')
    assert r.returncode == 0
    for flag in ('--threshold-mult', '--clustered', '--linear-start',
                 '--max-guidance', '--strength', '--seed'):
        assert flag in r.stdout


def test_cli_serve_has_pipe_option_flags():
    """--freeu/--vae-tile are shared by generate/serve/serve-api (ADVICE
    r3: they used to be registered on generate only)."""
    for cmd in ('serve', 'serve-api'):
        r = _cli(cmd, '--help')
        assert r.returncode == 0
        assert '--freeu' in r.stdout and '--vae-tile' in r.stdout


def test_cli_convert_missing_models_fails_cleanly():
    r = _cli('convert', '--models', '/nonexistent')
    assert r.returncode != 0


def test_dp_sweep_one_image_per_seed():
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.parallel import make_mesh, seed_sweep_keys
    from flexdiffuse_tpu.parallel.sweep import sweep
    from flexdiffuse_tpu.pipeline import FlexPipeline

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    unet_params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                            jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(unet, unet_params, vae, vae_params,
                        scheduler='pndm')

    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    keys = seed_sweep_keys(1337, 8)
    mesh = make_mesh(model_parallel=1)
    images = sweep(pipe, emb, unc, keys, steps=2, init_size=(32, 32),
                   mesh=mesh)
    assert images.shape == (8, 32, 32, 3)
    assert np.isfinite(images).all()
    # Different seeds must give different images; identical seeds identical.
    assert np.abs(images[0] - images[1]).max() > 1e-6
    images2 = sweep(pipe, emb, unc, keys, steps=2, init_size=(32, 32),
                    mesh=mesh)
    np.testing.assert_array_equal(images, images2)


def test_guidance_param_sweep_one_image_per_setting():
    """N guidance-parameter settings -> N distinct conditionings -> N images
    through one DP executable."""
    import dataclasses
    from flexdiffuse_tpu.config import GuidanceParams
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.parallel import make_mesh, seed_sweep_keys
    from flexdiffuse_tpu.parallel.sweep import guidance_param_sweep, sweep
    from flexdiffuse_tpu.pipeline import FlexPipeline

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(unet, up, vae, vp, scheduler='pndm')

    rng = np.random.default_rng(3)
    base = jnp.asarray(rng.normal(size=(77, 32)).astype(np.float32))
    alt = jnp.asarray(rng.normal(size=(40, 32)).astype(np.float32))
    params = [
        dataclasses.replace(GuidanceParams.ui_defaults(),
                            linear=(0.0, float(e)))
        for e in np.linspace(0.0, 0.9, 8)
    ]
    emb = guidance_param_sweep(base, alt, params)
    assert emb.shape == (8, 77, 32)
    # Distinct settings give distinct conditionings.
    assert float(jnp.abs(emb[0] - emb[7]).max()) > 1e-4

    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    # Same seed for every row: image differences come from guidance params.
    keys = jnp.tile(seed_sweep_keys(7, 1), (8, 1))
    images = sweep(pipe, emb, unc, keys, steps=2, init_size=(32, 32),
                   mesh=make_mesh(model_parallel=1))
    assert images.shape == (8, 32, 32, 3)
    assert np.abs(images[0] - images[7]).max() > 1e-6


def test_img2img_sweep():
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.parallel import make_mesh, seed_sweep_keys
    from flexdiffuse_tpu.parallel.sweep import sweep
    from flexdiffuse_tpu.pipeline import FlexPipeline

    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(unet, up, vae, vp, scheduler='pndm')
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    keys = seed_sweep_keys(11, 8)
    mesh = make_mesh(model_parallel=1)
    imgs = sweep(pipe, emb, unc, keys, steps=4, init_size=(32, 32),
                 mesh=mesh, init_image=init, strength=0.5)
    assert imgs.shape == (8, 32, 32, 3)
    assert np.isfinite(imgs).all()
    # Seeds differ (noise differs) but all share the init image anchor.
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-6
    # strength changes the noising level → different outputs.
    imgs_hi = sweep(pipe, emb, unc, keys, steps=4, init_size=(32, 32),
                    mesh=mesh, init_image=init, strength=1.0)
    assert np.abs(imgs - imgs_hi).max() > 1e-6


def test_img2img_sweep_heun_row_scales_t_start(monkeypatch):
    """Heun interleaves predictor+corrector rows (rows_per_step=2): the
    sweep's img2img t_start must index scan ROWS, matching
    pipeline/flex.py's scaling — otherwise add_noise noises to the sigma of
    row 2·t_start while the scan activates at row t_start."""
    import importlib

    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.parallel import make_mesh, seed_sweep_keys
    # The package re-exports the sweep FUNCTION under the same name; fetch
    # the module itself to monkeypatch its internals.
    sweep_mod = importlib.import_module('flexdiffuse_tpu.parallel.sweep')

    pipe = _tiny_pipe('heun')
    schedule = pipe.schedule(4)
    assert schedule.rows_per_step == 2

    captured = {}
    orig = sweep_mod._run_sharded

    def spy(pipe, mesh, guidance, latents, t_start, *a, **kw):
        captured['t_start'] = int(t_start)
        return orig(pipe, mesh, guidance, latents, t_start, *a, **kw)

    monkeypatch.setattr(sweep_mod, '_run_sharded', spy)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    keys = seed_sweep_keys(3, 8)
    mesh = make_mesh(model_parallel=1)
    imgs = sweep_mod.sweep(pipe, emb, unc, keys, steps=4,
                           init_size=(32, 32), mesh=mesh, init_image=init,
                           strength=0.5)
    assert imgs.shape == (8, 32, 32, 3)
    assert np.isfinite(imgs).all()
    _, t_start = schedulers.init_timestep_info(schedule, 0.5, 4)
    assert captured['t_start'] == t_start * schedule.rows_per_step


def _tiny_pipe(scheduler='pndm'):
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return FlexPipeline(unet, up, vae, vp, scheduler=scheduler)


def test_guidance_param_sweep_matches_serial_tween():
    """The vmapped on-device param sweep must equal per-setting Tweener
    calls, including across mixed static configs (mode/reuse groups)."""
    import dataclasses
    from flexdiffuse_tpu.config import GuidanceParams
    from flexdiffuse_tpu.guidance.tween import Tweener
    from flexdiffuse_tpu.parallel.sweep import guidance_param_sweep

    rng = np.random.default_rng(5)
    base = jnp.asarray(rng.normal(size=(77, 32)).astype(np.float32))
    alt = jnp.asarray(rng.normal(size=(40, 32)).astype(np.float32))
    d = GuidanceParams.ui_defaults()
    params = [
        dataclasses.replace(d, linear=(0.0, 0.3)),
        dataclasses.replace(d, linear=(0.1, 0.5), clustered=0.25),
        dataclasses.replace(d, mode=1, max_guidance=0.5),   # new static group
        dataclasses.replace(d, threshold_mult=0.25, threshold_floor=0.75),
        dataclasses.replace(d, mode=1, reuse=True, linear=(0.0, 0.2)),
    ]
    got = guidance_param_sweep(base, alt, params)
    for i, p in enumerate(params):
        ref = Tweener(p).tween(base, alt)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(ref),
                                   atol=1e-6, err_msg=f'setting {i}')


def test_compose_sweep_matches_per_seed_pipeline():
    from flexdiffuse_tpu.parallel import (compose_sweep, make_mesh,
                                          seed_sweep_keys)
    from flexdiffuse_tpu.pipeline.guides import (CompositeGuidance,
                                                 entity_masks)

    pipe = _tiny_pipe()
    rng = np.random.default_rng(9)
    bg = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    ents = jnp.asarray(rng.normal(size=(2, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    hw = 32 // pipe.vae_scale
    masks = entity_masks([((0, 0), (hw // 2, hw // 2)),
                          ((hw // 2, hw // 2), (hw // 2, hw // 2))],
                         (hw, hw))
    g = CompositeGuidance(background=bg, entities=ents, masks=masks,
                          blends=jnp.asarray([0.8, 0.6]), uncond=unc,
                          guidance_scale=jnp.float32(7.5))
    keys = seed_sweep_keys(1337, 8)
    imgs = compose_sweep(pipe, g, keys, steps=3, init_size=(32, 32),
                         mesh=make_mesh(model_parallel=1))
    assert imgs.shape == (8, 32, 32, 3)
    assert np.isfinite(imgs).all()
    assert np.abs(imgs[0] - imgs[1]).max() > 1e-6

    # Exactness vs the single-image path: seed i swept == seed i alone.
    import flexdiffuse_tpu.schedulers as schedulers
    schedule = pipe.schedule(3)
    lat = jax.vmap(
        lambda k: jax.random.normal(k, (hw, hw, 4), jnp.float32))(keys)[0:1]
    state0 = schedulers.init_state(schedule, lat.shape, lat.dtype)
    single, _ = pipe._sample(pipe.unet_params, schedule, state0, g, lat,
                             jnp.int32(0), jnp.float32(0.0),
                             jax.random.fold_in(keys[0], 0x5eed))
    img0 = np.asarray(pipe._decode(pipe.vae_params, single))[0]
    np.testing.assert_allclose(imgs[0], img0, atol=2e-5)


def test_inpaint_sweep_keeps_masked_region():
    from flexdiffuse_tpu.parallel import make_mesh, seed_sweep_keys
    from flexdiffuse_tpu.parallel.sweep import sweep

    pipe = _tiny_pipe()
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    unc = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    init = rng.uniform(-1, 1, size=(1, 32, 32, 3)).astype(np.float32)
    mask = np.zeros((32, 32), np.float32)
    mask[:, 16:] = 1.0   # regenerate right half only
    keys = seed_sweep_keys(21, 8)
    mesh = make_mesh(model_parallel=1)
    imgs = sweep(pipe, emb, unc, keys, steps=4, init_size=(32, 32),
                 mesh=mesh, init_image=init, strength=1.0, mask=mask)
    assert imgs.shape == (8, 32, 32, 3)
    assert np.isfinite(imgs).all()
    # Kept (left) region is anchored to the shared init trajectory across
    # seeds; regenerated (right) halves differ. The VAE decoder's receptive
    # field bleeds across the seam, so compare far-from-seam columns and
    # require the kept side to be an order quieter than the regenerated one.
    left = np.abs(imgs[0][:, :4] - imgs[1][:, :4]).max()
    right = np.abs(imgs[0][:, 16:] - imgs[1][:, 16:]).max()
    assert right > 1e-3
    assert left < 0.2 * right, (left, right)

    def test_requires_init():
        sweep(pipe, emb, unc, keys, steps=2, init_size=(32, 32), mesh=mesh,
              mask=mask)
    with np.testing.assert_raises(ValueError):
        test_requires_init()


def test_cli_edit_rejects_pag_layers():
    """ADVICE r4: --pag-layers on edit was a silent no-op (IP2P guidance
    never passes pag_mask) that only forced a recompile — now it fails
    fast, before any model loading."""
    r = _cli('edit', '--prompt', 'x', '--image', '/nonexistent.png',
             '--pag-layers', 'mid', '--models', '/nonexistent')
    assert r.returncode != 0
    assert 'does not apply to edit' in r.stderr
