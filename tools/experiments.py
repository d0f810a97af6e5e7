"""Reproduce the reference README's seeded experiment protocol.

The reference validates visually with a fixed protocol (README.md:252-267):
seed 1337, strength 0.6, steps 30, batches 4, guidance scale 8, 512²,
threshold 0.25/0.75, clustered 0.25, linear 0.0–0.5, max guidance 0.35,
header 0.0, best-fit mapping with reuse. This tool runs that exact protocol
against real weights so outputs can be compared side-by-side with the
reference's ``experiments/`` images (distributional comparison — RNG streams
differ by construction, see BASELINE.md).

Usage::

    python tools/experiments.py --models ./models \
        --prompt "Deer colorful, fantasy, intricate, highly detailed, ..." \
        [--guide guide.png] [--init init.png] [--out ./outputs/experiments]
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, '/root/repo')

PROTOCOL = dict(
    guide_threshold_mult=0.25,
    guide_threshold_floor=0.75,
    guide_clustered=0.25,
    guide_linear=(0.0, 0.5),
    guide_max_guidance=0.35,
    guide_header_max=0.0,
    guide_mode=1,          # best fit
    guide_reuse=True,
    strength=0.6,
    steps=30,
    guidance_scale=8,
    samples=4,
    seed=1337,
    init_size=(512, 512),
)


def main() -> int:
    from PIL import Image

    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.runner import Runner

    ap = argparse.ArgumentParser()
    ap.add_argument('--models', default='./models')
    ap.add_argument('--prompt', required=True)
    ap.add_argument('--guide', default='')
    ap.add_argument('--init', default='')
    ap.add_argument('--out', default='./outputs/experiments')
    args = ap.parse_args()

    runner = Runner(model_root=args.models,
                    config=RunConfig(output_dir=args.out))
    imgs, grid = runner.gen(
        prompt=args.prompt,
        guide=Image.open(args.guide) if args.guide else None,
        init_image=Image.open(args.init) if args.init else None,
        **PROTOCOL)
    print(f'{len(imgs)} images + grid written to {args.out}')
    print('phase timing:', runner.timer.summary())
    return 0


if __name__ == '__main__':
    sys.exit(main())
