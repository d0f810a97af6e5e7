"""Device-mesh parallelism: data-parallel sweeps + tensor-parallel UNet.

The reference is strictly single-GPU (SURVEY.md §2 parallelism inventory:
none of DP/TP/PP/SP/EP exist; its only scaling knobs are the in-device batch
dim and a serial Python batch loop, utils.py:90). The TPU-native scale story
(BASELINE.md stretch: "batched multi-seed guidance sweep across a v5e-8
mesh"):

* **data axis** — batch/seed parallelism: latents, PRNG keys and conditioning
  shard on the leading batch dim; every chip denoises its own images, no
  cross-chip traffic inside the loop (ICI only at gather time).
* **model axis** — tensor parallelism for the UNet: attention/MLP/conv
  channel dims get :class:`~jax.sharding.NamedSharding` annotations and
  XLA's SPMD partitioner inserts the all-reduces (the scaling-book recipe:
  pick a mesh, annotate shardings, let XLA place collectives on ICI).

PP/EP are intentionally absent: a 0.86B-param UNet fits one chip many times
over, so pipeline/expert splits only add bubbles — DP×TP is the whole story
for this model family.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a ``(data, model)`` mesh over the given devices.

    ``model_parallel`` chips are grouped on the (fast, adjacent-ICI) minor
    axis; the rest go to data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f'{n} devices not divisible by '
                         f'model_parallel={model_parallel}')
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _param_spec(path: Tuple, leaf: Array, tp: int) -> P:
    """Tensor-parallel PartitionSpec for one UNet/CLIP param leaf.

    Strategy: shard the *output-feature* (last) dim of matmul/conv kernels
    when divisible by the model-axis size; shard biases/scales likewise;
    replicate anything indivisible. Simple, uniform, and XLA/GSPMD infers the
    matching activation shardings + all-reduces.
    """
    if tp == 1:
        return P()
    shape = leaf.shape
    if not shape or shape[-1] % tp:
        return P()
    none = (None,) * (len(shape) - 1)
    return P(*none, MODEL_AXIS)


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh with tensor-parallel layout."""
    tp = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = _param_spec(path, leaf, tp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place arrays with a leading batch dim on the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def seed_sweep_keys(seed: int, num: int) -> Array:
    """``num`` independent PRNG keys for a multi-seed sweep ``[num, 2]``."""
    return jax.random.split(jax.random.PRNGKey(seed), num)
