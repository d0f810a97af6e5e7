"""Production serving: JSON API + dynamic micro-batching.

``flexdiffuse_tpu serve-api`` (cli.py) or::

    from flexdiffuse_tpu.serving import launch
    launch(lambda: Runner(model_root='./models'), port=8000).serve_forever()

See serving/api.py for the endpoint contract and serving/batcher.py for
the batching discipline.
"""
from flexdiffuse_tpu.serving.api import GenerationService, launch
from flexdiffuse_tpu.serving.batcher import MicroBatcher, pad_rows

__all__ = ['GenerationService', 'launch', 'MicroBatcher', 'pad_rows']
