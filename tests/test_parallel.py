"""Mesh/sharding tests on the 8-virtual-device CPU platform."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flexdiffuse_tpu.parallel import (DATA_AXIS, MODEL_AXIS, make_mesh,
                                      seed_sweep_keys, shard_batch,
                                      shard_params)


def test_mesh_shapes():
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:3], model_parallel=2)


def test_shard_params_rules():
    mesh = make_mesh(model_parallel=2)
    params = {
        'dense': {'kernel': jnp.zeros((16, 64)), 'bias': jnp.zeros((64,))},
        'odd': {'kernel': jnp.zeros((16, 33))},   # indivisible → replicated
        'scalar': jnp.zeros(()),
    }
    sharded = shard_params(params, mesh)
    assert sharded['dense']['kernel'].sharding.spec == P(None, MODEL_AXIS)
    assert sharded['dense']['bias'].sharding.spec == P(MODEL_AXIS)
    assert sharded['odd']['kernel'].sharding.spec == P()


def test_dp_sweep_matches_single_device():
    """A data-parallel multi-seed denoise step must equal per-device math."""
    from flexdiffuse_tpu.models import TINY_UNET, UNet2DCondition

    mesh = make_mesh(model_parallel=1)
    unet = UNet2DCondition(TINY_UNET)
    b = 8
    lat = jnp.asarray(np.random.default_rng(0).normal(
        size=(b, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(np.random.default_rng(1).normal(
        size=(b, 77, 32)).astype(np.float32))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.zeros((b,)), ctx)

    fn = jax.jit(lambda p, l, c: unet.apply(p, l, jnp.full(
        (l.shape[0],), 300.0), c))
    expected = np.asarray(fn(params, lat, ctx))

    lat_s, ctx_s = shard_batch((lat, ctx), mesh)
    assert lat_s.sharding.spec == P(DATA_AXIS)
    with mesh:
        got = np.asarray(fn(params, lat_s, ctx_s))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_tp_unet_matches_replicated():
    """Tensor-parallel params must not change the numerics."""
    from flexdiffuse_tpu.models import TINY_UNET, UNet2DCondition

    mesh = make_mesh(model_parallel=2)
    unet = UNet2DCondition(TINY_UNET)
    lat = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 77, 32)).astype(np.float32))
    params = unet.init(jax.random.PRNGKey(0), lat, jnp.zeros((2,)), ctx)
    fn = jax.jit(lambda p, l, c: unet.apply(p, l, jnp.full(
        (l.shape[0],), 300.0), c))
    expected = np.asarray(fn(params, lat, ctx))
    sharded = shard_params(params, mesh)
    with mesh:
        got = np.asarray(fn(sharded, lat, ctx))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_seed_sweep_keys_unique():
    keys = seed_sweep_keys(1337, 8)
    assert keys.shape[0] == 8
    assert len({tuple(np.asarray(k)) for k in keys}) == 8


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
