"""Ring attention: exactness vs single-device attention on the 8-dev mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flexdiffuse_tpu.ops.attention import xla_attention
from flexdiffuse_tpu.ops.ring_attention import ring_attention


@pytest.fixture(scope='module')
def mesh():
    return Mesh(np.array(jax.devices()).reshape(8), ('sp',))


@pytest.mark.parametrize('shape', [(1, 2, 256, 40), (2, 4, 128, 64)])
def test_ring_matches_full_attention(mesh, shape):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
               for _ in range(3))
    scale = shape[-1]**-0.5
    ref = np.asarray(xla_attention(q, k, v, scale))
    out = ring_attention(q, k, v, mesh, 'sp', scale)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_ring_with_sharded_inputs(mesh):
    """Inputs already sequence-sharded: output keeps the sharding."""
    rng = np.random.default_rng(1)
    shape = (1, 2, 512, 32)
    sh = NamedSharding(mesh, P(None, None, 'sp', None))
    q, k, v = (jax.device_put(
        jnp.asarray(rng.normal(size=shape).astype(np.float32)), sh)
               for _ in range(3))
    out = ring_attention(q, k, v, mesh, 'sp')
    assert out.sharding.spec == P(None, None, 'sp', None)
    ref = np.asarray(xla_attention(q, k, v, shape[-1]**-0.5))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_ring_jits_inside_jit(mesh):
    rng = np.random.default_rng(2)
    shape = (1, 1, 64, 16)
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
               for _ in range(3))

    @jax.jit
    def fn(q, k, v):
        return ring_attention(q, k, v, mesh, 'sp')

    out = fn(q, k, v)
    ref = np.asarray(xla_attention(q, k, v, 16**-0.5))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
