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
                        choices=('ddim', 'pndm', 'lms', 'euler', 'euler_a', 'dpmpp'))
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format='%(asctime)s %(name)s %(message)s')

    def make_runner():
        from flexdiffuse_tpu.config import RunConfig
        from flexdiffuse_tpu.runner import Runner
        return Runner(model_root=args.models,
                      config=RunConfig(local_only=not args.download),
                      scheduler=args.scheduler)

    from flexdiffuse_tpu.interface.server import launch
    launch(make_runner, lan=args.lan, port=args.port).serve_forever()


if __name__ == '__main__':
    main()
