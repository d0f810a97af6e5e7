"""HLO-level bound on tensor-parallel collective count (VERDICT r1 weak #8).

The uniform shard-last-dim TP rule (parallel/mesh.py:51-65) leaves GSPMD
free to insert collectives; correctness is covered by
tests/test_parallel.py::test_tp_unet_matches_replicated, but communication
*cost* regressions would be silent. This pins the collective-op count in the
optimized HLO of a TP-compiled UNet apply — hardware-free, catches a
partitioner-strategy regression (e.g. a rule change that makes every conv
all-gather its inputs).
"""
import collections
import re

import jax
import jax.numpy as jnp
import pytest

from flexdiffuse_tpu.models import TINY_UNET, UNet2DCondition
from flexdiffuse_tpu.parallel import make_mesh, shard_batch, shard_params

COLLECTIVE_RE = re.compile(
    r'= \S+ (all-gather|all-reduce|reduce-scatter|collective-permute'
    r'|all-to-all)\(')


@pytest.fixture(scope='module')
def tp_hlo_text():
    unet = UNet2DCondition(TINY_UNET)
    k = jax.random.PRNGKey(0)
    params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                       jnp.zeros((1, 77, 32)))
    mesh = make_mesh(model_parallel=2)
    params_s = shard_params(params, mesh)
    lat = shard_batch(jnp.zeros((4, 8, 8, 4)), mesh)
    t = shard_batch(jnp.zeros((4,)), mesh)
    ctx = shard_batch(jnp.zeros((4, 77, 32)), mesh)
    with mesh:
        compiled = jax.jit(unet.apply).lower(params_s, lat, t,
                                             ctx).compile()
    return compiled.as_text()


def test_tp_collective_count_bounded(tp_hlo_text):
    ops = collections.Counter(
        m.group(1) for m in COLLECTIVE_RE.finditer(tp_hlo_text))
    total = sum(ops.values())
    # The TINY_UNET has ~40 sharded matmuls/convs; one boundary collective
    # per sharded contraction is the expected GSPMD outcome. A blow-up
    # (every op gathering full activations) lands in the hundreds.
    assert 0 < total <= 120, (total, dict(ops))
    # The data axis must stay communication-free inside the model: no
    # all-to-alls (batch resharding) at all.
    assert ops.get('all-to-all', 0) == 0, dict(ops)


def test_tp_does_not_gather_full_parameters(tp_hlo_text):
    """No all-gather may reconstruct a full (unsharded) weight: gathers of
    the largest kernel's full shape would mean TP is sharding in name only.

    TINY_UNET's biggest param is [3, 3, C, C] with C=32 (9216 elems); a
    full-weight gather materializes >= that many elements per op. Parse
    all-gather result shapes and bound them."""
    for m in re.finditer(r'= \S*?\[([\d,]+)\]\S* all-gather\(', tp_hlo_text):
        shape = m.group(1)
        elems = 1
        for d in shape.split(','):
            elems *= int(d)
        # Activation gathers at the tiny geometry are small ([4,8,8,C]
        # scale); full-weight gathers are not. 16384 = 4x headroom over the
        # largest legitimate activation gather seen at pinning time.
        assert elems <= 16384, (shape, elems)
