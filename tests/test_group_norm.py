"""Fused GroupNorm(+SiLU) Pallas kernel vs flax nn.GroupNorm."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from flexdiffuse_tpu.ops.group_norm import (GroupNormFused, _gn_reference,
                                            group_norm)


@pytest.mark.parametrize('shape,groups',
                         [((2, 8, 8, 320), 32), ((1, 4, 4, 64), 16),
                          ((2, 16, 96), 32)])
@pytest.mark.parametrize('silu', [False, True])
def test_kernel_matches_flax(shape, groups, silu):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 3.0 + 1.0
    c = shape[-1]
    gamma = jnp.asarray(rng.normal(size=c).astype(np.float32))
    beta = jnp.asarray(rng.normal(size=c).astype(np.float32))

    got = group_norm(x, gamma, beta, groups, 1e-5, silu, interpret=True)

    ref = nn.GroupNorm(groups, epsilon=1e-5).apply(
        {'params': {'scale': gamma, 'bias': beta}}, x)
    if silu:
        ref = nn.silu(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_bf16_io():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    gamma = jnp.ones(64)
    beta = jnp.zeros(64)
    got = group_norm(x.astype(jnp.bfloat16), gamma, beta, 16, 1e-5, True,
                     interpret=True).astype(jnp.float32)
    ref = _gn_reference(x.reshape(2, 64, 64), gamma, beta, 16, 1e-5,
                        True).reshape(2, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_oversized_falls_back():
    # 3M elements * 4B > block budget → reference path (must not raise).
    x = jnp.zeros((1, 96, 96, 512))
    out = group_norm(x, jnp.ones(512), jnp.zeros(512), 32)
    assert out.shape == x.shape


def test_module_param_names_match_flax_groupnorm():
    x = jnp.zeros((1, 4, 4, 64))
    params = GroupNormFused(16, name='norm').init(jax.random.PRNGKey(0), x)
    leaf = params['params']
    assert set(leaf.keys()) == {'scale', 'bias'}
    assert leaf['scale'].shape == (64,)
