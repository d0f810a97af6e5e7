"""Command-line interface: convert weights, generate, compose, serve.

The reference's only CLI is ``python ui.py [--dl] [--lan]``; the rebuild adds
the model-conversion and headless-generation entry points SURVEY.md §7.7
calls for. Usage::

    python -m flexdiffuse_tpu.cli convert --models ./models
    python -m flexdiffuse_tpu.cli generate --models ./models \
        --prompt "a deer" --guide guide.png --steps 30 --seed 1337
    python -m flexdiffuse_tpu.cli compose --models ./models --schema s.json
    python -m flexdiffuse_tpu.cli serve --models ./models [--lan]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def _add_model_args(p: argparse.ArgumentParser) -> None:
    p.add_argument('--models', default='./models',
                   help='dir with HF snapshots of SD-1.4 and CLIP ViT-L/14')
    p.add_argument('--sd-model', default=None, metavar='REPO',
                   help='SD checkpoint repo id (default '
                        'CompVis/stable-diffusion-v1-4); its basename picks '
                        'the snapshot dir under --models — e.g. '
                        'timbrooks/instruct-pix2pix for the edit command, '
                        'runwayml/stable-diffusion-inpainting for native '
                        'inpainting (UNet input channels auto-adopt from '
                        "the snapshot's unet/config.json)")
    p.add_argument('--scheduler', default='pndm',
                   choices=('ddim', 'pndm', 'lms', 'euler', 'euler_a',
                            'dpmpp', 'lcm', 'ddpm', 'unipc', 'heun'))
    p.add_argument('--clip-skip', type=int, default=0, choices=(0, 1),
                   help='1 = condition on the penultimate CLIP layer')
    p.add_argument('--karras', action='store_true',
                   help='Karras sigma spacing (euler/euler_a/dpmpp/unipc/heun)')
    p.add_argument('--v-prediction', action='store_true',
                   help='v-parameterized model (use with --model-family sd2 '
                        'for SD2.1 768-v checkpoints)')
    p.add_argument('--zero-snr', action='store_true',
                   help='zero-terminal-SNR beta rescale (Lin et al. 2023) '
                        'for checkpoints trained with it; pair with '
                        '--v-prediction and consider --guidance-rescale 0.7')
    p.add_argument('--timestep-spacing', default=None,
                   choices=('leading', 'trailing'),
                   help="'trailing' starts inference at the last train "
                        'step (needed with --zero-snr to actually see pure '
                        'noise); default leading (SD historical spacing). '
                        'ddim/ddpm only')
    p.add_argument('--model-family', default='sd1',
                   choices=('sd1', 'sd2', 'sdxl'),
                   help='checkpoint geometry: sd1 = SD1.x + CLIP ViT-L/14, '
                        'sd2 = SD2.x + OpenCLIP ViT-H, sdxl = SDXL-base '
                        '(dual text encoders, 1024²; expects a '
                        'stable-diffusion-xl-base-1.0 snapshot under '
                        '--models)')
    p.add_argument('--lora', action='append', default=[], metavar='PATH[:S]',
                   help='merge a kohya-format LoRA (optional :scale, '
                        'repeatable)')
    p.add_argument('--embedding', action='append', default=[],
                   metavar='PATH[:TOKEN]',
                   help='load a textual-inversion embedding (optional '
                        ':token name, repeatable)')
    p.add_argument('--controlnet', default=None, metavar='PATH',
                   help='diffusers ControlNet snapshot; use with '
                        '--control-image on generate')
    p.add_argument('--ip-adapter', default=None, metavar='PATH',
                   help='IP-Adapter checkpoint; use with --ip-image on '
                        'generate')
    p.add_argument('--ip-encoder', default=None, metavar='DIR',
                   help='the IP-Adapter image-encoder snapshot '
                        '(OpenCLIP ViT-H for the SD1.5 adapter)')
    p.add_argument('--ip-encoder-arch', default='vit-h',
                   choices=('vit-h', 'bigg'),
                   help='image-encoder tower for --ip-encoder with '
                        '--model-family sdxl (the original '
                        'ip-adapter_sdxl.bin uses the bigG tower; _vit-h '
                        'checkpoints use ViT-H)')
    p.add_argument('--refiner', default=None, metavar='DIR',
                   help='SDXL refiner snapshot '
                        '(stable-diffusion-xl-refiner-1.0); enables the '
                        'two-stage base->refiner flow for --model-family '
                        'sdxl')
    p.add_argument('--refine-strength', type=float, default=0.3,
                   help='refiner img2img strength (fraction of the noise '
                        'schedule the refiner re-denoises; 0 disables)')


def _sdxl_runner(args):
    from flexdiffuse_tpu.sdxl_runner import SDXLRunner
    from flexdiffuse_tpu.weights.lora import parse_spec
    for flag in ('controlnet', 'embedding'):
        if getattr(args, flag, None):
            raise SystemExit(f'--{flag.replace("_", "-")} is not supported '
                             'with --model-family sdxl (SD1.x only)')
    root = os.path.join(args.models, 'stable-diffusion-xl-base-1.0')
    if not os.path.isdir(root):
        root = args.models  # --models may point straight at the snapshot
    clip = os.path.join(args.models, 'clip-vit-large-patch14')
    runner = SDXLRunner(root,
                        clip_root=clip if os.path.isdir(clip) else None,
                        scheduler=args.scheduler,
                        output_dir=getattr(args, 'out', './outputs'),
                        refiner_root=getattr(args, 'refiner', None))
    for spec in getattr(args, 'lora', []):
        runner.apply_lora(*parse_spec(spec))
    if getattr(args, 'ip_adapter', None):
        runner.load_ip_adapter(args.ip_adapter,
                               getattr(args, 'ip_encoder', None),
                               encoder=getattr(args, 'ip_encoder_arch',
                                               'vit-h'))
    return runner


def _runner(args):
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.runner import Runner
    if getattr(args, 'model_family', 'sd1') == 'sdxl':
        return _sdxl_runner(args)
    scheduler_config = None
    if (getattr(args, 'karras', False) or getattr(args, 'v_prediction', False)
            or getattr(args, 'zero_snr', False)
            or getattr(args, 'timestep_spacing', None)):
        from flexdiffuse_tpu.schedulers import SchedulerConfig
        scheduler_config = SchedulerConfig(
            kind=args.scheduler,
            use_karras_sigmas=getattr(args, 'karras', False),
            rescale_betas_zero_snr=getattr(args, 'zero_snr', False),
            timestep_spacing=(getattr(args, 'timestep_spacing', None)
                              or 'leading'),
            prediction_type=('v_prediction'
                             if getattr(args, 'v_prediction', False) else
                             'epsilon'))
    model_kw = {}
    if getattr(args, 'model_family', 'sd1') == 'sd2':
        from flexdiffuse_tpu.models import (OPENCLIP_H_TEXT, SD21_UNET,
                                            SD21_VAE)
        model_kw = dict(text_config=OPENCLIP_H_TEXT, unet_config=SD21_UNET,
                        vae_config=SD21_VAE)
    run_cfg_kw = dict(output_dir=getattr(args, 'out', './outputs'))
    if getattr(args, 'sd_model', None):
        run_cfg_kw['sd_model'] = args.sd_model
    runner = Runner(model_root=args.models,
                    config=RunConfig(**run_cfg_kw),
                    scheduler=args.scheduler,
                    clip_skip=getattr(args, 'clip_skip', 0),
                    scheduler_config=scheduler_config, **model_kw)
    from flexdiffuse_tpu.weights.lora import parse_spec
    for spec in getattr(args, 'lora', []):
        runner.apply_lora(*parse_spec(spec))
    if getattr(args, 'controlnet', None):
        runner.load_controlnet(args.controlnet)
    if getattr(args, 'ip_adapter', None):
        runner.load_ip_adapter(args.ip_adapter,
                               image_encoder_dir=getattr(args, 'ip_encoder',
                                                         None))
    for spec in getattr(args, 'embedding', []):
        # 'path:token' unless the whole spec is itself an existing file.
        path, _, tok = spec.rpartition(':')
        if path and not os.path.exists(spec):
            runner.load_textual_inversion(path, token=tok)
        else:
            runner.load_textual_inversion(spec)
    return runner


def cmd_download(args) -> int:
    """Download HF snapshots (the reference's --dl flag, utils.py:59-66).

    Requires network egress + huggingface_hub; prints a clear error when
    offline (zero-egress environments convert pre-downloaded snapshots
    instead)."""
    from flexdiffuse_tpu.config import RunConfig
    cfg = RunConfig()
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print('huggingface_hub is not installed; download the snapshots '
              'manually and run `convert`.', file=sys.stderr)
        return 1
    for repo in (cfg.sd_model, cfg.clip_model):
        dest = os.path.join(args.models, repo.split('/')[-1])
        print(f'downloading {repo} -> {dest}')
        try:
            snapshot_download(repo, local_dir=dest)
        except Exception as ex:
            print(f'download failed ({type(ex).__name__}): no network '
                  'egress? Place the snapshots manually and run `convert`.',
                  file=sys.stderr)
            return 1
    return cmd_convert(args)


def cmd_convert(args) -> int:
    """One-time weight conversion; caches msgpack beside the snapshots."""
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.weights import load
    cfg = RunConfig()
    sd_dir = os.path.join(args.models, cfg.sd_model.split('/')[-1])
    clip_dir = os.path.join(args.models, cfg.clip_model.split('/')[-1])
    load.load_clip(clip_dir)
    print(f'converted CLIP -> {clip_dir}/flexdiffuse_tpu_clip_*.msgpack')
    load.load_sd(sd_dir)
    print(f'converted SD   -> {sd_dir}/flexdiffuse_tpu_sd_*.msgpack')
    return 0


def _apply_pipe_options(runner, args) -> None:
    """Post-construction pipeline knobs shared by generate/serve/serve-api:
    FreeU and tiled VAE (SD1.x runner; the SDXL runner rejects them)."""
    freeu = getattr(args, 'freeu', '')
    if freeu:
        if not hasattr(runner, 'enable_freeu'):
            raise SystemExit('--freeu is not supported for this model '
                             'family yet')
        if freeu.strip().lower() == 'on':
            runner.enable_freeu()
        else:
            vals = [float(v) for v in freeu.split(',')]
            if len(vals) != 4:
                raise SystemExit("--freeu expects 'b1,b2,s1,s2' or 'on'")
            runner.enable_freeu(*vals)
    tile = getattr(args, 'vae_tile', 0)
    if tile:
        if not hasattr(runner, 'enable_vae_tiling'):
            raise SystemExit('--vae-tile is not supported for this model '
                             'family yet')
        runner.enable_vae_tiling(tile)
    dc = getattr(args, 'deepcache', 0)
    if dc:
        if not hasattr(runner, 'enable_deepcache'):
            raise SystemExit('--deepcache is not supported for this model '
                             'family yet')
        runner.enable_deepcache(dc)
    tome = getattr(args, 'tome', '')
    if tome:
        if not hasattr(runner, 'enable_tome'):
            raise SystemExit('--tome is not supported for this model '
                             'family yet')
        vals = tome.split(',')
        if len(vals) not in (1, 2):
            raise SystemExit("--tome expects 'RATIO' or 'RATIO,MIN_SEQ'")
        runner.enable_tome(float(vals[0]),
                           *([int(vals[1])] if len(vals) == 2 else []))
    pag_layers = getattr(args, 'pag_layers', '')
    if pag_layers:
        if not hasattr(runner, 'enable_pag'):
            raise SystemExit('--pag-layers is not supported for this model '
                             'family yet')
        runner.enable_pag(tuple(s.strip() for s in pag_layers.split(',')
                                if s.strip()))


def cmd_generate(args) -> int:
    from PIL import Image
    runner = _runner(args)
    _apply_pipe_options(runner, args)
    guide = None
    if args.guide:
        guide = Image.open(args.guide) if os.path.exists(args.guide) \
            else args.guide  # a path → image guide; otherwise text guide
    init = Image.open(args.init_image) if args.init_image else None
    mask = Image.open(args.mask) if args.mask else None
    control = Image.open(args.control_image) if getattr(
        args, 'control_image', None) else None
    ip_img = Image.open(args.ip_image) if getattr(
        args, 'ip_image', None) else None
    imgs, grid = runner.gen(
        prompt=args.prompt, init_image=init, guide=guide,
        init_size=(args.height, args.width),
        mapping_concepts=args.concepts,
        guide_threshold_mult=args.threshold_mult,
        guide_threshold_floor=args.threshold_floor,
        guide_clustered=args.clustered,
        guide_linear=(args.linear_start, args.linear_end),
        guide_max_guidance=args.max_guidance,
        guide_header_max=args.header_max, guide_mode=args.mode,
        guide_reuse=not args.no_reuse, strength=args.strength,
        steps=args.steps, guidance_scale=args.guidance_scale,
        samples=args.samples, seed=args.seed, debug=args.debug,
        negative_prompt=args.negative_prompt, mask=mask,
        control_image=control,
        controlnet_scale=getattr(args, 'controlnet_scale', 1.0),
        ip_image=ip_img, ip_scale=getattr(args, 'ip_scale', 1.0),
        long_prompt=getattr(args, 'long_prompt', False),
        weighted=getattr(args, 'weighted', False),
        cfg_interval=(tuple(args.cfg_interval)
                      if getattr(args, 'cfg_interval', None) else None),
        guidance_rescale=getattr(args, 'guidance_rescale', 0.0),
        pag_scale=getattr(args, 'pag', 0.0),
        **({'refine_strength': getattr(args, 'refine_strength', 0.3)}
           if getattr(args, 'model_family', 'sd1') == 'sdxl' else
           {'hires_scale': getattr(args, 'hires_scale', 0.0),
            'hires_strength': getattr(args, 'hires_strength', 0.55),
            'hires_steps': getattr(args, 'hires_steps', None)}))
    print(f'{len(imgs)} image(s) written to {runner.output_dir}')
    return 0


def cmd_compose(args) -> int:
    from flexdiffuse_tpu.composition import Schema
    with open(args.schema) as f:
        schema = Schema.from_json(f.read())
    runner = _runner(args)
    imgs, grid = runner.compose(
        bg_prompt=schema.background_prompt,
        entities_df=[[e.prompt, e.offset[0], e.offset[1], e.size[0],
                      e.size[1], e.blend] for e in schema.entities],
        start_style=schema.style_start_prompt,
        end_style=schema.style_end_prompt,
        style_blend=schema.style_blend, batches=args.samples,
        strength=args.strength, steps=args.steps,
        guidance_scale=args.guidance_scale,
        init_size=(args.height, args.width), seed=args.seed,
        debug=args.debug)
    print(f'{len(imgs)} image(s) written to {runner.output_dir}')
    return 0


def cmd_edit(args) -> int:
    """Instruction-based image editing (InstructPix2Pix; needs an
    8-channel edit checkpoint, e.g. timbrooks/instruct-pix2pix — the UNet
    input width is auto-detected from the snapshot's unet/config.json)."""
    from PIL import Image
    if getattr(args, 'pag_layers', ''):
        # The IP2P guidance path never feeds a pag_mask to the UNet, so
        # perturbed layers would only force a pointless rebuild/recompile.
        # Checked before model loading — fail fast.
        raise SystemExit('--pag-layers does not apply to edit (the '
                         'InstructPix2Pix guidance path has no PAG); '
                         'remove the flag')
    runner = _runner(args)
    if not hasattr(runner, 'edit'):
        raise SystemExit('edit needs an SD1.x-family InstructPix2Pix '
                         'checkpoint (--model-family sd1)')
    _apply_pipe_options(runner, args)
    imgs, grid = runner.edit(
        prompt=args.prompt, image=Image.open(args.image), steps=args.steps,
        guidance_scale=args.guidance_scale,
        image_guidance_scale=args.image_guidance_scale,
        negative_prompt=args.negative_prompt, samples=args.samples,
        seed=args.seed, debug=args.debug,
        guidance_rescale=getattr(args, 'guidance_rescale', 0.0))
    print(f'{len(imgs)} image(s) written to {runner.output_dir}')
    return 0


def cmd_train(args) -> int:
    """Fine-tune on a folder of images (LoRA by default, ``--full`` for the
    whole UNet). Loads fp32 master params straight off the converted
    checkpoints — the inference path's pre-cast bf16 trees are not suitable
    optimizer state; compute still runs bf16 inside the step."""
    import jax
    import jax.numpy as jnp

    from flexdiffuse_tpu import training
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.encode import CLIPEncoder
    from flexdiffuse_tpu.models import (CLIPTextModel, CLIPVisionModel,
                                        SD14_UNET, SD14_VAE, AutoencoderKL,
                                        UNet2DCondition, configs)
    from flexdiffuse_tpu.text.tokenizer import CLIPTokenizer
    from flexdiffuse_tpu.weights import load

    if getattr(args, 'model_family', 'sd1') == 'sdxl':
        raise SystemExit('train: SDXL fine-tuning is not wired into the CLI '
                         'yet — use the training library API directly')
    cfgrun = RunConfig()
    text_config, unet_config, vae_config = (configs.CLIP_VIT_L14_TEXT,
                                            SD14_UNET, SD14_VAE)
    prediction = 'epsilon'
    if getattr(args, 'model_family', 'sd1') == 'sd2':
        from flexdiffuse_tpu.models import (OPENCLIP_H_TEXT, SD21_UNET,
                                            SD21_VAE)
        text_config, unet_config, vae_config = (OPENCLIP_H_TEXT, SD21_UNET,
                                                SD21_VAE)
        prediction = 'v_prediction'
    if getattr(args, 'v_prediction', False):
        prediction = 'v_prediction'
    sd_dir = os.path.join(args.models, cfgrun.sd_model.split('/')[-1])
    clip_dir = os.path.join(args.models, cfgrun.clip_model.split('/')[-1])
    text_params, vision_params = load.load_clip(
        clip_dir, text_config=text_config,
        vision_config=configs.CLIP_VIT_L14_VISION)
    unet_params, vae_params = load.load_sd(
        sd_dir, unet_config=unet_config, vae_config=vae_config)
    tokenizer = CLIPTokenizer.from_dir(clip_dir)
    encoder = CLIPEncoder(
        CLIPTextModel(text_config, dtype=jnp.bfloat16), text_params,
        CLIPVisionModel(configs.CLIP_VIT_L14_VISION, dtype=jnp.bfloat16),
        vision_params, tokenizer, clip_skip=getattr(args, 'clip_skip', 0))
    unet = UNet2DCondition(unet_config, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vae_config, dtype=jnp.bfloat16)

    tcfg = training.TrainConfig(learning_rate=args.lr,
                                prediction_type=prediction,
                                snr_gamma=args.snr_gamma,
                                remat=args.remat,
                                grad_accum=args.grad_accum,
                                ema_decay=args.ema_decay)
    if args.textual_inversion:
        out = args.out or 'embedding.safetensors'
        paths = [p for p, _ in training.find_items(
            args.data, default_caption='x')]
        templates = (training.STYLE_TEMPLATES if args.style_templates
                     else training.OBJECT_TEMPLATES)
        training.train_textual_inversion(
            CLIPTextModel(text_config, dtype=jnp.bfloat16), text_params,
            tokenizer, unet, unet_params, vae, vae_params, paths,
            args.textual_inversion, initializer_token=args.init_token,
            num_vectors=args.num_vectors, templates=templates, cfg=tcfg,
            steps=args.steps, batch_size=args.batch_size,
            resolution=args.resolution,
            key=jax.random.PRNGKey(args.seed or 0), save_path=out)
        print(f'trained weights written to {out}')
        return 0

    items = training.find_items(args.data, default_caption=args.caption)
    ds = training.encode_dataset(items, vae, vae_params, encoder,
                                 resolution=args.resolution)
    mesh = None
    if args.data_parallel > 1:
        from flexdiffuse_tpu.parallel import make_mesh
        mesh = make_mesh(jax.devices()[:args.data_parallel],
                         model_parallel=1)
    key = jax.random.PRNGKey(args.seed if args.seed is not None else 0)
    if args.class_data:
        # DreamBooth prior preservation: class images must exist already
        # (pre-generate with `generate --prompt "<class prompt>"` or
        # training.generate_class_images).
        cds = training.encode_dataset(
            training.find_items(args.class_data,
                                default_caption=args.class_caption),
            vae, vae_params, encoder, resolution=args.resolution)
        mode = 'full' if args.full else 'lora'
        out = args.out or ('finetuned_unet.msgpack' if args.full
                           else 'lora.safetensors')
        training.train_dreambooth(
            unet, unet_params, ds, cds, cfg=tcfg,
            prior_weight=args.prior_weight, mode=mode, rank=args.rank,
            steps=args.steps, batch_size=args.batch_size, key=key,
            mesh=mesh, save_path=out)
        print(f'trained weights written to {out}')
        return 0
    ckpt_kw = dict(checkpoint_dir=args.checkpoint_dir,
                   checkpoint_every=args.checkpoint_every)
    if args.full:
        out = args.out or 'finetuned_unet.msgpack'
        training.train_full(unet, unet_params, ds, tcfg, steps=args.steps,
                            batch_size=args.batch_size, key=key, mesh=mesh,
                            save_path=out, **ckpt_kw)
    else:
        out = args.out or 'lora.safetensors'
        training.train_lora(unet, unet_params, ds, tcfg, rank=args.rank,
                            steps=args.steps, batch_size=args.batch_size,
                            key=key, mesh=mesh, save_path=out, **ckpt_kw)
    print(f'trained weights written to {out}')
    return 0


def _add_pipe_option_args(p) -> None:
    """Register the post-construction pipeline knobs (generate/serve/
    serve-api all consume them via ``_apply_pipe_options``)."""
    p.add_argument('--freeu', default='',
                   help="FreeU 'b1,b2,s1,s2' (empty = off; 'on' = the "
                        "SD1.x defaults 1.5,1.6,0.9,0.2)")
    p.add_argument('--vae-tile', type=int, default=0,
                   help='tiled VAE decode/encode in N-latent-unit tiles '
                        '(64 = 512 px); bounds VAE memory for very large '
                        'images. 0 = off')
    p.add_argument('--deepcache', type=int, default=0,
                   help='DeepCache interval N: full UNet every Nth step, '
                        'shallow-levels-only + cached deep feature in '
                        'between (2-3 = published quality/speed sweet '
                        'spot). 0 = off')
    p.add_argument('--tome', default='',
                   help="ToMe token merging 'RATIO' or 'RATIO,MIN_SEQ': "
                        'merge RATIO of the spatial tokens before every '
                        'self-attention on grids of >= MIN_SEQ tokens '
                        '(default 4096 = only the attention-bound big '
                        'levels). 0.5 is the published sweet spot; '
                        'empty = off')
    p.add_argument('--pag-layers', default='',
                   help="PAG perturbed layers, comma-separated name "
                        "prefixes ('mid', 'down_1', 'up_2_attn_1'); "
                        "set automatically to 'mid' when --pag is used "
                        'without it (generate) or a serve request asks '
                        'for PAG')


def _runner_with_options(args):
    runner = _runner(args)
    _apply_pipe_options(runner, args)
    return runner


def cmd_serve(args) -> int:
    from flexdiffuse_tpu.interface.server import launch
    launch(lambda: _runner_with_options(args), lan=args.lan,
           port=args.port).serve_forever()
    return 0


def cmd_serve_api(args) -> int:
    from flexdiffuse_tpu.serving import launch
    launch(lambda: _runner_with_options(args), port=args.port, lan=args.lan,
           max_batch_rows=args.max_batch, max_wait_ms=args.max_wait_ms,
           fixed_rows=args.deterministic).serve_forever()
    return 0


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(name)s %(message)s')
    parser = argparse.ArgumentParser(prog='flexdiffuse_tpu')
    parser.add_argument('--compile-cache', default=None, metavar='DIR',
                        help='persistent XLA compilation-cache directory '
                             '(default ~/.cache/flexdiffuse_tpu/xla or '
                             '$FLEXDIFFUSE_COMPILE_CACHE); a warm cache '
                             'turns the multi-minute first-run compile '
                             'into a few seconds of deserialization')
    parser.add_argument('--no-compile-cache', action='store_true',
                        help='disable the persistent XLA compilation cache')
    sub = parser.add_subparsers(dest='cmd', required=True)

    p = sub.add_parser('convert', help='convert HF checkpoints to pytrees')
    p.add_argument('--models', default='./models')
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser('download',
                       help='download HF snapshots then convert (needs '
                            'network egress)')
    p.add_argument('--models', default='./models')
    p.set_defaults(fn=cmd_download)

    p = sub.add_parser('generate', help='guided generation')
    _add_model_args(p)
    p.add_argument('--prompt', default='')
    p.add_argument('--negative-prompt', default='')
    p.add_argument('--guide', default='',
                   help='guide image path or guide text')
    p.add_argument('--init-image', default='')
    p.add_argument('--mask', default='',
                   help='inpainting mask image (white = regenerate)')
    p.add_argument('--control-image', default='',
                   help='ControlNet conditioning image (requires '
                        '--controlnet)')
    p.add_argument('--controlnet-scale', type=float, default=1.0)
    p.add_argument('--ip-image', default='',
                   help='IP-Adapter image prompt (requires --ip-adapter '
                        'with --ip-encoder)')
    p.add_argument('--ip-scale', type=float, default=1.0)
    p.add_argument('--long-prompt', action='store_true',
                   help='chunked encoding for >75-token prompts (A1111 '
                        'convention; with --guide, the tween applies to the '
                        'first 77-token window)')
    _add_pipe_option_args(p)
    p.add_argument('--hires-scale', type=float, default=0.0,
                   help='two-pass highres fix: latent-upscale the first '
                        'pass by this factor and refine with img2img '
                        '(A1111 Latent mode; 0 = off, try 2.0)')
    p.add_argument('--hires-strength', type=float, default=0.55,
                   help='refinement strength of the highres pass')
    p.add_argument('--hires-steps', type=int, default=None,
                   help='steps for the highres pass (default: same as '
                        '--steps)')
    p.add_argument('--weighted', action='store_true',
                   help='parse A1111 emphasis syntax — (word:1.3), [word], '
                        'BREAK — in prompt and negative prompt; subsumes '
                        '--long-prompt')
    p.add_argument('--cfg-interval', type=float, nargs=2, default=None,
                   metavar=('LO', 'HI'),
                   help='apply classifier-free guidance only for denoise '
                        'progress in [LO, HI] (Kynkäänniemi et al. 2024); '
                        'steps outside run cond-only at ~half cost — '
                        'try 0.0 0.6')
    p.add_argument('--guidance-rescale', type=float, default=0.0,
                   help='CFG rescale phi (Lin et al. 2023): pull the CFG '
                        'noise prediction back toward the cond '
                        "prediction's std — fixes washed-out images, "
                        'especially zero-SNR v-pred checkpoints (0.7 '
                        'recommended there). 0 = off')
    p.add_argument('--pag', type=float, default=0.0, metavar='SCALE',
                   help='perturbed-attention guidance scale (Ahn et al. '
                        '2024): adds SCALE*(eps_cond - eps_perturbed) '
                        'where the perturbed row runs identity '
                        'self-attention in --pag-layers (default mid). '
                        'Improves structure; works with CFG on or off. '
                        '~3.0 is the published sweet spot; 0 = off')
    p.add_argument('--concepts', default='')
    p.add_argument('--out', default='./outputs')
    p.add_argument('--height', type=int, default=512)
    p.add_argument('--width', type=int, default=512)
    p.add_argument('--threshold-mult', type=float, default=0.25)
    p.add_argument('--threshold-floor', type=float, default=0.75)
    p.add_argument('--clustered', type=float, default=0.15)
    p.add_argument('--linear-start', type=float, default=0.1)
    p.add_argument('--linear-end', type=float, default=0.5)
    p.add_argument('--max-guidance', type=float, default=0.35)
    p.add_argument('--header-max', type=float, default=0.0)
    p.add_argument('--mode', type=int, default=1,
                   help='0=text order, 1=best fit, 2=direct')
    p.add_argument('--no-reuse', action='store_true')
    p.add_argument('--strength', type=float, default=0.6)
    p.add_argument('--steps', type=int, default=30)
    p.add_argument('--guidance-scale', type=float, default=8.0)
    p.add_argument('--samples', type=int, default=4)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--debug', action='store_true')
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser('edit',
                       help='instruction-based image editing '
                            '(InstructPix2Pix 8-channel checkpoints)')
    _add_model_args(p)
    p.add_argument('--prompt', required=True, help='edit instruction, '
                   'e.g. "make it winter"')
    p.add_argument('--image', required=True, help='image to edit')
    p.add_argument('--negative-prompt', default='')
    p.add_argument('--steps', type=int, default=30)
    p.add_argument('--guidance-scale', type=float, default=7.5,
                   help='text CFG scale (published IP2P default 7.5)')
    p.add_argument('--image-guidance-scale', type=float, default=1.5,
                   help='image CFG scale — higher stays closer to the '
                        'input (published default 1.5)')
    p.add_argument('--guidance-rescale', type=float, default=0.0)
    p.add_argument('--samples', type=int, default=1)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--out', default='./outputs')
    p.add_argument('--debug', action='store_true')
    _add_pipe_option_args(p)
    p.set_defaults(fn=cmd_edit)

    p = sub.add_parser('compose', help='regional composition from a schema')
    _add_model_args(p)
    p.add_argument('--schema', required=True, help='Schema json file')
    p.add_argument('--out', default='./outputs')
    p.add_argument('--height', type=int, default=512)
    p.add_argument('--width', type=int, default=512)
    p.add_argument('--strength', type=float, default=0.7)
    p.add_argument('--steps', type=int, default=30)
    p.add_argument('--guidance-scale', type=float, default=8.0)
    p.add_argument('--samples', type=int, default=4)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--debug', action='store_true')
    p.set_defaults(fn=cmd_compose)

    p = sub.add_parser('train', help='fine-tune on a folder of images '
                                     '(LoRA by default)')
    p.add_argument('--models', default='./models',
                   help='dir with converted HF snapshots (see download/'
                        'convert)')
    p.add_argument('--model-family', default='sd1', choices=('sd1', 'sd2'))
    p.add_argument('--clip-skip', type=int, default=0, choices=(0, 1))
    p.add_argument('--v-prediction', action='store_true',
                   help='train against the v-prediction objective '
                        '(default for --model-family sd2)')
    p.add_argument('--data', required=True,
                   help='dataset dir: images + same-stem .txt captions or '
                        'metadata.jsonl; captionless folders use --caption')
    p.add_argument('--caption', default='',
                   help='caption for images without one (DreamBooth-style '
                        'single-concept training)')
    p.add_argument('--resolution', type=int, default=512)
    p.add_argument('--full', action='store_true',
                   help='fine-tune the whole UNet instead of LoRA factors')
    p.add_argument('--textual-inversion', default='', metavar='PLACEHOLDER',
                   help='train a textual-inversion embedding for this '
                        'placeholder token (e.g. "<my-concept>") instead '
                        'of LoRA/full')
    p.add_argument('--init-token', default='',
                   help='textual inversion: single token whose embedding '
                        'seeds the new vectors')
    p.add_argument('--num-vectors', type=int, default=1,
                   help='textual inversion: vectors per concept')
    p.add_argument('--style-templates', action='store_true',
                   help='textual inversion: use the style (painting) '
                        'template set instead of the object one')
    p.add_argument('--remat', default='none',
                   choices=('none', 'dots', 'full'),
                   help='activation rematerialization (memory for compute; '
                        '"full" fits whole-UNet training on one chip)')
    p.add_argument('--grad-accum', type=int, default=1,
                   help='micro-batches per optimizer step')
    p.add_argument('--ema-decay', type=float, default=0.0,
                   help='EMA of trained params (e.g. 0.9999; 0 = off)')
    p.add_argument('--class-data', default='',
                   help='DreamBooth prior preservation: folder of class '
                        'images (pre-generate with the generate command)')
    p.add_argument('--class-caption', default='',
                   help='caption for class images without sidecars (e.g. '
                        '"a photo of a dog")')
    p.add_argument('--prior-weight', type=float, default=1.0,
                   help='DreamBooth prior-preservation loss weight')
    p.add_argument('--rank', type=int, default=8, help='LoRA rank')
    p.add_argument('--steps', type=int, default=500)
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--lr', type=float, default=1e-4)
    p.add_argument('--snr-gamma', type=float, default=0.0,
                   help='min-SNR loss weighting (5.0 is the published '
                        'sweet spot; 0 = uniform)')
    p.add_argument('--data-parallel', type=int, default=1,
                   help='shard batches over this many chips')
    p.add_argument('--checkpoint-dir', default='',
                   help='orbax checkpoint directory; if it already holds '
                        'a checkpoint, training resumes from it')
    p.add_argument('--checkpoint-every', type=int, default=100,
                   help='optimizer steps between checkpoints')
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--out', default='',
                   help='output path (default lora.safetensors / '
                        'finetuned_unet.msgpack)')
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser('serve', help='launch the web UI')
    _add_model_args(p)
    _add_pipe_option_args(p)
    p.add_argument('--lan', action='store_true')
    p.add_argument('--port', type=int, default=7860)
    p.add_argument('--out', default='./outputs')
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser('serve-api',
                       help='launch the batched JSON serving API')
    _add_model_args(p)
    _add_pipe_option_args(p)
    p.add_argument('--lan', action='store_true')
    p.add_argument('--port', type=int, default=8000)
    p.add_argument('--max-batch', type=int, default=8,
                   help='max fused rows per device dispatch')
    p.add_argument('--max-wait-ms', type=float, default=30.0,
                   help='batching window before a partial batch dispatches')
    p.add_argument('--deterministic', action='store_true',
                   help='pad every dispatch to --max-batch rows: one '
                        'compiled batch shape, bitwise-reproducible '
                        'results regardless of batch composition')
    p.add_argument('--out', default='./outputs')
    p.set_defaults(fn=cmd_serve_api)

    args = parser.parse_args(argv)
    if not args.no_compile_cache:
        from flexdiffuse_tpu.utils.compile_cache import \
            enable_compilation_cache
        enable_compilation_cache(args.compile_cache)
    return args.fn(args)


if __name__ == '__main__':
    sys.exit(main())
