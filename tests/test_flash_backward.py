"""Flash-attention VJP (ops/flash_backward.py): gradients vs the
differentiated XLA reference, primal equality, both layouts, and the
chunked non-resident fallback."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.ops import flash_backward as fb
from flexdiffuse_tpu.ops.attention import xla_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(
        size=shape).astype(np.float32))


def _ref_loss(q, k, v, scale, w):
    return jnp.sum(xla_attention(q, k, v, scale) * w)


def _flash_loss(q, k, v, scale, w):
    return jnp.sum(fb.flash_attention_diff(q, k, v, scale) * w)


# (b, h, s, d): lane-padded d=40 CFG shape, power-of-two d, multi-block,
# and a kv-shorter cross-attention-like shape.
SHAPES = [(2, 2, 512, 40), (1, 2, 1024, 64), (2, 1, 2048, 40)]


@pytest.mark.parametrize('shape', SHAPES)
def test_grads_match_xla_reference(shape):
    b, h, s, d = shape
    scale = d**-0.5
    q, k, v = (_rand((b, h, s, d), i) for i in range(3))
    w = _rand((b, h, s, d), 7)

    got = jax.grad(_flash_loss, argnums=(0, 1, 2))(q, k, v, scale, w)
    want = jax.grad(_ref_loss, argnums=(0, 1, 2))(q, k, v, scale, w)
    for g, r, name in zip(got, want, 'qkv'):
        err = float(jnp.abs(g - r).max())
        ref = float(jnp.abs(r).max())
        assert err < 2e-3 * max(ref, 1.0), (name, err, ref)


def test_primal_matches_inference_kernel():
    """The custom_vjp primal must be the inference kernel bit-for-bit."""
    from flexdiffuse_tpu.ops.flash_attention import flash_attention
    q, k, v = (_rand((2, 2, 512, 40), i) for i in range(3))
    a = fb.flash_attention_diff(q, k, v, 40**-0.5)
    b_ = flash_attention(q, k, v, 40**-0.5)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_fwd_lse_matches_reference():
    q, k, v = (_rand((1, 2, 512, 40), i) for i in range(3))
    qt, kt, vt = (x.transpose(0, 1, 3, 2) for x in (q, k, v))
    o, lse = fb._tt_forward_lse(qt, kt, vt, 40**-0.5)
    ref = xla_attention(q, k, v, 40**-0.5).transpose(0, 1, 3, 2)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5,
                               rtol=0)
    # lse (base 2) vs a direct logsumexp.
    s = jnp.einsum('bhqd,bhkd->bhqk', q, k) * (40**-0.5) * fb.LOG2E
    want = jax.scipy.special.logsumexp(s * np.log(2.0), axis=-1) / np.log(2.0)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want), atol=1e-4,
                               rtol=0)


def test_chunked_backward_matches_kernels():
    """The non-resident fallback computes the same grads."""
    q, k, v = (_rand((1, 2, 512, 40), i) for i in range(3))
    w = _rand((1, 2, 512, 40), 9)
    scale = 40**-0.5
    qt, kt, vt = (x.transpose(0, 1, 3, 2) for x in (q, k, v))
    o, lse = fb._tt_forward_lse(qt, kt, vt, scale)
    gt = w.transpose(0, 1, 3, 2)
    a = fb._tt_backward(qt, kt, vt, o, lse, gt, scale)
    b_ = fb._chunked_backward(qt, kt, vt, o, lse, gt, scale, chunk=128)
    for x, y, name in zip(a, b_, 'qkv'):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4,
                                   rtol=0, err_msg=name)


def test_attention_dispatcher_grads_flash_vs_xla():
    """jax.grad through ops.attention.attention with backend='flash'
    matches backend='xla' at a flash-eligible shape — the path the
    training step takes (training/train.py _remat_apply)."""
    from flexdiffuse_tpu.ops import attention as attn_mod
    b, h, s, d = 1, 2, 1024, 40
    scale = d**-0.5
    q, k, v = (_rand((b, h, s, d), i) for i in range(3))
    w = _rand((b, h, s, d), 11)

    def loss(q, k, v, backend):
        return jnp.sum(attn_mod.attention(q, k, v, scale,
                                          backend=backend) * w)

    gf = jax.grad(functools.partial(loss, backend='flash'),
                  argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(functools.partial(loss, backend='xla'),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gx, 'qkv'):
        err = float(jnp.abs(a - b_).max())
        assert err < 2e-3 * max(float(jnp.abs(b_).max()), 1.0), (name, err)


def test_cm_grads_match():
    b, h, s, d = 2, 2, 512, 40
    scale = d**-0.5
    q, k, v = (_rand((h, d, b, s), i) for i in range(3))
    w = _rand((h, d, b, s), 5)

    def cm_loss(q, k, v):
        return jnp.sum(fb.flash_attention_cm_diff(q, k, v, scale) * w)

    def ref_loss(q, k, v):
        # CM → standard layout reference.
        std = lambda x: x.transpose(2, 0, 3, 1)           # [b, h, s, d]
        o = xla_attention(std(q), std(k), std(v), scale)
        return jnp.sum(o.transpose(1, 3, 0, 2) * w)

    got = jax.grad(cm_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, 'qkv'):
        err = float(jnp.abs(g - r).max())
        assert err < 2e-3 * max(float(jnp.abs(r).max()), 1.0), (name, err)
