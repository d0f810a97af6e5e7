"""Parallelism: mesh construction, DP/TP shardings, multi-seed sweeps."""
from flexdiffuse_tpu.parallel.mesh import (DATA_AXIS, MODEL_AXIS,
                                           batch_sharding, make_mesh,
                                           replicated, seed_sweep_keys,
                                           shard_batch, shard_params)
from flexdiffuse_tpu.parallel.sweep import guidance_param_sweep, sweep

__all__ = [
    'DATA_AXIS', 'MODEL_AXIS', 'make_mesh', 'shard_params', 'shard_batch',
    'batch_sharding', 'replicated', 'seed_sweep_keys', 'sweep',
    'guidance_param_sweep'
]
