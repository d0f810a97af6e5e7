"""Channel-major transformer interior (models/unet.py DenseCM et al.).

The TPU product path runs transformer-block interiors channel-major
([C, B·S], sequence minor) so every interior dot uses the standard MXU
emitter and the flash kernel's operands need no relayout (the profiled
transposed-emitter tax of the seq-minor layouts — docs/PERFORMANCE.md).
These tests pin the properties that make that safe:

* the param tree (names AND shapes) is identical to the standard
  orientation — checkpoints/LoRA/converters are orientation-blind;
* outputs match the standard orientation;
* the channel-major flash wrapper matches the reference XLA attention;
* gating: tiny levels (< CM_MIN_SEQ tokens) stay standard, SP pipelines
  force the standard orientation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import UNet2DCondition
from flexdiffuse_tpu.models.configs import UNetConfig

CFG = UNetConfig(block_channels=(8, 16), layers_per_block=1,
                 attention_levels=(True, True), num_heads=2,
                 cross_attention_dim=16, norm_groups=4)


def _models():
    std = UNet2DCondition(CFG, channel_major=False)
    cm = UNet2DCondition(CFG, channel_major=True)
    return std, cm


def _inputs(hw=64):
    # hw=64 → level-0 seq 4096 ≥ CM_MIN_SEQ: the channel-major branch and
    # (interpret-mode) flash kernel genuinely engage on CPU.
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    lat = jax.random.normal(k1, (2, hw, hw, 4))
    t = jnp.array([3.0, 3.0])
    ctx = jax.random.normal(k2, (2, 7, 16))
    return lat, t, ctx


def test_param_tree_identical():
    std, cm = _models()
    lat, t, ctx = _inputs()
    p1 = std.init(jax.random.PRNGKey(0), lat, t, ctx)
    p2 = cm.init(jax.random.PRNGKey(0), lat, t, ctx)
    assert (jax.tree_util.tree_structure(p1) ==
            jax.tree_util.tree_structure(p2))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_outputs_match_standard():
    std, cm = _models()
    lat, t, ctx = _inputs()
    params = std.init(jax.random.PRNGKey(0), lat, t, ctx)
    o1 = std.apply(params, lat, t, ctx)
    o2 = cm.apply(params, lat, t, ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=0, atol=1e-4)


def test_flash_cm_matches_xla():
    from flexdiffuse_tpu.ops.attention import xla_attention
    from flexdiffuse_tpu.ops.flash_attention import flash_attention_cm
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    h, d, b, s = 2, 8, 2, 1024
    q = jax.random.normal(k1, (h, d, b, s), jnp.float32)
    k = jax.random.normal(k2, (h, d, b, s), jnp.float32)
    v = jax.random.normal(k3, (h, d, b, s), jnp.float32)
    out = flash_attention_cm(q, k, v, scale=d**-0.5, interpret=True)
    # Reference path works on [B, H, S, D]
    to_std = lambda t: t.transpose(2, 0, 3, 1)
    ref = xla_attention(to_std(q), to_std(k), to_std(v), scale=d**-0.5)
    np.testing.assert_allclose(np.asarray(out.transpose(2, 0, 3, 1)),
                               np.asarray(ref), rtol=0, atol=2e-5)


def test_flash_cm_batches_do_not_mix():
    """The flattened [H, D, B·S] grid must map each q block to ITS batch's
    K/V slab — zeroing batch 1's V must not change batch 0's output."""
    from flexdiffuse_tpu.ops.flash_attention import flash_attention_cm
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    h, d, b, s = 1, 8, 2, 512
    q = jax.random.normal(k1, (h, d, b, s), jnp.float32)
    k = jax.random.normal(k2, (h, d, b, s), jnp.float32)
    v = jax.random.normal(k3, (h, d, b, s), jnp.float32)
    out = flash_attention_cm(q, k, v, scale=1.0, block_q=128, block_k=128,
                             interpret=True)
    v2 = v.at[:, :, 1, :].set(0.0)
    out2 = flash_attention_cm(q, k, v2, scale=1.0, block_q=128, block_k=128,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(out[:, :, 0]),
                                  np.asarray(out2[:, :, 0]))
    assert np.abs(np.asarray(out2[:, :, 1])).max() < 1e-6


def test_attention_cm_dispatch_xla_small():
    """Cross-attention (tiny kv) under channel-major uses the XLA path and
    matches the standard-orientation reference."""
    from flexdiffuse_tpu.ops.attention import attention, attention_cm
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    h, d, b, sq, skv = 2, 8, 2, 256, 7
    q = jax.random.normal(k1, (h, d, b, sq), jnp.float32)
    k = jax.random.normal(k2, (h, d, b, skv), jnp.float32)
    v = jax.random.normal(k3, (h, d, b, skv), jnp.float32)
    out = attention_cm(q, k, v)
    to_std = lambda t: t.transpose(2, 0, 3, 1)
    ref = attention(to_std(q), to_std(k), to_std(v))
    np.testing.assert_allclose(np.asarray(out.transpose(2, 0, 3, 1)),
                               np.asarray(ref), rtol=0, atol=2e-5)


def test_small_levels_stay_standard():
    """Below CM_MIN_SEQ tokens the standard NHWC branch runs even with
    channel_major=True (same params, same output, no CM modules traced)."""
    std, cm = _models()
    lat, t, ctx = _inputs(hw=16)  # level-0 seq 256 < 1024
    params = std.init(jax.random.PRNGKey(0), lat, t, ctx)
    o1 = std.apply(params, lat, t, ctx)
    o2 = cm.apply(params, lat, t, ctx)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_sp_pipeline_forces_standard():
    from flexdiffuse_tpu.pipeline.flex import FlexPipeline
    if len(jax.devices()) < 2:
        pytest.skip('needs the multi-device CPU mesh')
    from jax.sharding import Mesh
    from flexdiffuse_tpu.models import TINY_VAE, AutoencoderKL
    mesh = Mesh(np.array(jax.devices()[:2]), ('seq',))
    unet = UNet2DCondition(CFG, channel_major=True)
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    lat, t, ctx = _inputs(hw=16)
    up = unet.init(k, lat, t, ctx)
    vp = vae.init(k, jnp.zeros((1, 32, 32, 3)), k)
    pipe = FlexPipeline(unet, up, vae, vp, sp_mesh=mesh)
    assert pipe.unet.channel_major is False


def test_layernorm_cm_matches_flax():
    """MXU-stat LayerNormCM (models/unet.py) is interchangeable with
    ``nn.LayerNorm(reduction_axes=0)``: same param tree, same output."""
    from flax import linen as nn

    from flexdiffuse_tpu.models.unet import LayerNormCM
    x = jax.random.normal(jax.random.PRNGKey(2), (320, 512), jnp.float32)
    x = x * 1.7 - 0.3
    ref = nn.LayerNorm(epsilon=1e-5, reduction_axes=0, feature_axes=0)
    mine = LayerNormCM(epsilon=1e-5)
    p = ref.init(jax.random.PRNGKey(1), x)
    p['params']['scale'] = jax.random.normal(jax.random.PRNGKey(3), (320,))
    p['params']['bias'] = jax.random.normal(jax.random.PRNGKey(4), (320,))
    assert (jax.tree_util.tree_structure(p) ==
            jax.tree_util.tree_structure(mine.init(jax.random.PRNGKey(1),
                                                   x)))
    np.testing.assert_allclose(np.asarray(mine.apply(p, x)),
                               np.asarray(ref.apply(p, x)),
                               rtol=0, atol=2e-5)


def test_approx_gelu_bound():
    """tanh-gelu (the bf16-on-TPU auto default) stays within the documented
    5e-4 absolute bound of exact erf gelu."""
    x = jnp.linspace(-20.0, 20.0, 200001)
    exact = jax.nn.gelu(x, approximate=False)
    approx = jax.nn.gelu(x, approximate=True)
    assert float(jnp.max(jnp.abs(exact - approx))) < 5e-4


def test_approx_gelu_resolution():
    from flexdiffuse_tpu.models.unet import resolve_approx_gelu
    # CPU test runner: auto resolves False (exact erf) off-TPU.
    on_tpu = jax.default_backend() == 'tpu'
    assert resolve_approx_gelu(None, jnp.bfloat16) == on_tpu
    assert resolve_approx_gelu(None, jnp.float32) is False
    assert resolve_approx_gelu(True, jnp.float32) is True
    assert resolve_approx_gelu(False, jnp.bfloat16) is False
