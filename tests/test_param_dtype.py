"""Param dtype policy: bf16 pre-cast of matmul/conv kernels (utils/params).

The product pipeline holds matmul/conv params pre-cast to the module's bf16
compute dtype; flax's ``promote_dtype`` would have rounded them identically
at every use, so outputs must be BIT-IDENTICAL to the fp32-stored tree.
fp32-compute modules (every other test in the suite) must pass through
untouched.
"""
import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.models import (AutoencoderKL, TINY_UNET, TINY_VAE,
                                    UNet2DCondition)
from flexdiffuse_tpu.pipeline import FlexPipeline, SimpleGuidance
from flexdiffuse_tpu.utils.params import cast_for_module, cast_matmul_params

T, D = 77, 32


def _models(dtype):
    unet = UNet2DCondition(TINY_UNET, dtype=dtype)
    vae = AutoencoderKL(TINY_VAE, dtype=dtype)
    k = jax.random.PRNGKey(0)
    unet_params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                            jnp.zeros((1, T, D)))
    vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return unet, unet_params, vae, vae_params


def test_cast_rule_shapes_and_dtypes():
    unet, params, _, _ = _models(jnp.bfloat16)
    cast = cast_matmul_params(params)
    flat = jax.tree_util.tree_leaves_with_path(cast)
    n_bf16 = n_fp32 = 0
    for path, leaf in flat:
        if leaf.ndim >= 2:
            assert leaf.dtype == jnp.bfloat16, path
            n_bf16 += 1
        else:
            assert leaf.dtype == jnp.float32, path
            n_fp32 += 1
    assert n_bf16 > 0 and n_fp32 > 0


def test_fp32_module_params_pass_through():
    unet, params, _, _ = _models(jnp.float32)
    assert cast_for_module(params, unet) is params


def test_bf16_precast_is_bit_identical():
    unet, params, _, _ = _models(jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, T, D), jnp.float32)
    t = jnp.full((2,), 500.0)
    ref = unet.apply(params, lat, t, ctx)                 # per-use casts
    out = unet.apply(cast_matmul_params(params), lat, t, ctx)  # pre-cast
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_lora_merge_preserves_bf16_storage():
    """LoRA on a bf16-cast tree: fp32-accumulated merge, bf16 result."""
    from flexdiffuse_tpu.weights import lora

    _, params, _, _ = _models(jnp.bfloat16)
    cast = cast_matmul_params(params)
    rng = np.random.default_rng(0)
    rank, c = 4, 32
    down = rng.normal(size=(rank, c)).astype(np.float32) * 0.1
    up = rng.normal(size=(c, rank)).astype(np.float32) * 0.1
    sd = {
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_down.weight': down,
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_up.weight': up,
    }
    merged, _ = lora.apply_lora(cast, None, sd, scale=0.7)
    w = merged['params']['down_0_attn_0']['blocks_0']['attn1']['to_q'][
        'kernel']
    assert np.asarray(w).dtype == jnp.bfloat16
    # Value check vs an fp32 merge rounded once at the end.
    w32 = (np.asarray(cast['params']['down_0_attn_0']['blocks_0']['attn1']
                      ['to_q']['kernel']).astype(np.float32) +
           0.7 * (up @ down).T)
    np.testing.assert_array_equal(np.asarray(w),
                                  w32.astype(jnp.bfloat16))


def test_pipeline_casts_bf16_module_params():
    unet, unet_params, vae, vae_params = _models(jnp.bfloat16)
    pipe = FlexPipeline(unet, unet_params, vae, vae_params, scheduler='pndm')
    kernels = [l for l in jax.tree_util.tree_leaves(pipe.unet_params)
               if l.ndim >= 2]
    assert kernels and all(k.dtype == jnp.bfloat16 for k in kernels)
    ones = [l for l in jax.tree_util.tree_leaves(pipe.unet_params)
            if l.ndim < 2]
    assert ones and all(o.dtype == jnp.float32 for o in ones)

    # And the pipeline still runs end to end with the cast tree.
    rng = np.random.default_rng(0)
    guide = SimpleGuidance(
        embeddings=jnp.asarray(rng.normal(size=(1, T, D)), jnp.float32),
        uncond=jnp.asarray(rng.normal(size=(1, T, D)), jnp.float32),
        guidance_scale=jnp.float32(8.0), cfg=True)
    out = pipe(guide, steps=2, init_size=(16, 16), output_type='np',
               key=jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(out.images)).all()
