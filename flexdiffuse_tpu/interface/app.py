"""FlexDiffuse TPU web UI app entry (reference ui.py).

Usage: ``python ui.py [--models DIR] [--lan] [--port N] [--scheduler S]``.
The reference's substring-matching ``--dl``/``--lan`` flags (ui.py:10-21)
become real argparse flags; ``--dl`` maps to allowing HF downloads when the
environment has egress (model files must otherwise already be on disk under
``--models``).
"""
from __future__ import annotations

import argparse
import logging


def main() -> None:
    parser = argparse.ArgumentParser(description='FlexDiffuse TPU UI')
    parser.add_argument('--models', default='./models',
                        help='dir containing HF snapshots of SD-1.4 + CLIP')
    parser.add_argument('--dl', '--download', action='store_true',
                        dest='download',
                        help='allow downloading models from HF hub')
    parser.add_argument('--lan', action='store_true',
                        help='bind 0.0.0.0 instead of localhost')
    parser.add_argument('--port', type=int, default=7860)
    parser.add_argument('--scheduler', default='pndm',
                        choices=('ddim', 'pndm', 'lms', 'euler', 'euler_a',
                                 'dpmpp', 'ddpm', 'unipc'))
    parser.add_argument('--karras', action='store_true',
                        help='Karras sigma spacing (euler/euler_a/dpmpp/unipc)')
    parser.add_argument('--v-prediction', action='store_true',
                        help='v-parameterized model (with --model-family sd2 for SD2.1 768-v)')
    parser.add_argument('--model-family', default='sd1',
                        choices=('sd1', 'sd2'),
                        help='checkpoint geometry: sd1 = SD1.x + ViT-L/14, '
                             'sd2 = SD2.x + OpenCLIP ViT-H')
    parser.add_argument('--lora', action='append', default=[],
                        metavar='PATH[:S]',
                        help='merge a kohya LoRA (optional :scale, '
                             'repeatable)')
    parser.add_argument('--compile-cache', default=None, metavar='DIR',
                        help='persistent XLA compilation-cache directory')
    parser.add_argument('--no-compile-cache', action='store_true',
                        help='disable the persistent XLA compilation cache')
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(name)s %(message)s')
    if not args.no_compile_cache:
        from flexdiffuse_tpu.utils.compile_cache import \
            enable_compilation_cache
        enable_compilation_cache(args.compile_cache)

    def make_runner():
        from flexdiffuse_tpu.config import RunConfig
        from flexdiffuse_tpu.runner import Runner
        scheduler_config = None
        if args.karras or args.v_prediction:
            from flexdiffuse_tpu.schedulers import SchedulerConfig
            scheduler_config = SchedulerConfig(
                kind=args.scheduler, use_karras_sigmas=args.karras,
                prediction_type=('v_prediction' if args.v_prediction
                                 else 'epsilon'))
        model_kw = {}
        if args.model_family == 'sd2':
            from flexdiffuse_tpu.models import (OPENCLIP_H_TEXT, SD21_UNET,
                                                SD21_VAE)
            model_kw = dict(text_config=OPENCLIP_H_TEXT,
                            unet_config=SD21_UNET, vae_config=SD21_VAE)
        runner = Runner(model_root=args.models,
                        config=RunConfig(local_only=not args.download),
                        scheduler=args.scheduler,
                        scheduler_config=scheduler_config, **model_kw)
        from flexdiffuse_tpu.weights.lora import parse_spec
        for spec in args.lora:
            runner.apply_lora(*parse_spec(spec))
        return runner

    from flexdiffuse_tpu.interface.server import launch
    launch(make_runner, lan=args.lan, port=args.port).serve_forever()


if __name__ == '__main__':
    main()
