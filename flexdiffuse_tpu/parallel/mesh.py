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

**DP vs TP, measured (round 3).** The uniform shard-last-dim TP rule pays a
boundary collective per sharded contraction; at the real SD-1.4 geometry
(bf16, CFG batch 2, 512²) the GSPMD plan for ``model=2`` contains 216
all-gathers + 32 collective-permutes totaling **≈1.84 GB of ICI traffic per
UNet forward** (pinned in tests/test_tp_collectives.py). At v5e ICI rates
that traffic costs more than the entire single-chip step compute (~20 ms),
so TP=2 *slows* SD1.x inference down. Recommendation: **scale with the data
axis** (multi-seed/batch sweeps — zero in-loop traffic); reserve
``model_parallel>1`` for models that do not fit one chip (it is correct and
tested, just not profitable at this size), and use SP/ring attention (not
TP) when a single ≥2048² image must span chips.
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


def param_shardings(params, mesh: Mesh):
    """Tensor-parallel ``NamedSharding`` tree for a param pytree (leaves may
    be arrays or ``ShapeDtypeStruct``s — used for data-free compile
    checks)."""
    tp = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf, tp)),
        params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh with tensor-parallel layout."""
    return jax.tree_util.tree_map(jax.device_put, params,
                                  param_shardings(params, mesh))


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
