"""IP-Adapter: layer enumeration, decoupled attention, end-to-end merge."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (SD14_UNET, TINY_UNET, UNet2DCondition)
from flexdiffuse_tpu.models.ip_adapter import (ImageProjection,
                                               attn2_layer_order,
                                               convert_ip_adapter,
                                               merge_ip_weights)

IP_TINY = dataclasses.replace(TINY_UNET, ip_adapter=True, ip_tokens=4)


def test_attn2_layer_order_matches_diffusers_enumeration():
    # SD1.x: 6 down + 1 mid + 9 up cross-attention layers = 16 (the official
    # ip-adapter_sd15 checkpoint carries exactly 16 to_k_ip/to_v_ip pairs).
    order = attn2_layer_order(SD14_UNET)
    assert len(order) == 16
    # down (6) -> up (9) -> mid last: diffusers assigns the up_blocks
    # ModuleList before mid_block, so named_children/attn_processors put
    # the mid block last (ComfyUI/A1111 IP-Adapter index maps agree).
    assert order[0] == ('down_0_attn_0', 'blocks_0', 'attn2')
    assert order[5] == ('down_2_attn_1', 'blocks_0', 'attn2')
    assert order[6] == ('up_1_attn_0', 'blocks_0', 'attn2')
    assert order[14] == ('up_3_attn_2', 'blocks_0', 'attn2')
    assert order[-1] == ('mid_attn', 'blocks_0', 'attn2')
    # Tiny geometry: 1 down + 1 mid + 2 up.
    assert len(attn2_layer_order(TINY_UNET)) == 4


def _models():
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(IP_TINY)
    ip_ctx = jnp.zeros((1, 4, 32))
    params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                      jnp.zeros((1, 77, 32)), None, None, ip_ctx)
    return unet, params


def test_ip_scale_zero_matches_base_unet():
    """With ip_scale=0 the decoupled branch is inert: output equals the
    plain (ip_adapter=False) UNet with the shared weights."""
    unet_ip, params = _models()
    unet_base = UNet2DCondition(TINY_UNET)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    ip = jnp.asarray(rng.normal(size=(1, 4, 32)).astype(np.float32))
    out0 = unet_ip.apply(params, lat, jnp.zeros((1,)), ctx, None, None,
                         ip, 0.0)
    base = unet_base.apply(params, lat, jnp.zeros((1,)), ctx)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base),
                               atol=1e-6)
    # Nonzero scale with nonzero ip weights changes the output.
    out1 = unet_ip.apply(params, lat, jnp.zeros((1,)), ctx, None, None,
                         ip, 1.0)
    assert np.abs(np.asarray(out1) - np.asarray(base)).max() > 1e-7


def test_convert_and_merge_official_layout():
    """Synthesize an official-style checkpoint (image_proj + odd-indexed
    ip_adapter entries) and merge into a converted-base tree."""
    rng = np.random.default_rng(1)
    d_ctx = TINY_UNET.cross_attention_dim          # 32
    d_img = 24
    sd = {
        'image_proj.proj.weight':
            rng.normal(size=(4 * d_ctx, d_img)).astype(np.float32),
        'image_proj.proj.bias':
            rng.normal(size=(4 * d_ctx,)).astype(np.float32),
        'image_proj.norm.weight': np.ones(d_ctx, np.float32),
        'image_proj.norm.bias': np.zeros(d_ctx, np.float32),
    }
    order = attn2_layer_order(TINY_UNET)
    widths = {'down_0_attn_0': 32, 'mid_attn': 64, 'up_1_attn_0': 32,
              'up_1_attn_1': 32}
    for n, path in enumerate(order):
        idx = 2 * n + 1                             # official odd indices
        d = widths[path[0]]
        sd[f'ip_adapter.{idx}.to_k_ip.weight'] = \
            rng.normal(size=(d, d_ctx)).astype(np.float32) * 0.1
        sd[f'ip_adapter.{idx}.to_v_ip.weight'] = \
            rng.normal(size=(d, d_ctx)).astype(np.float32) * 0.1

    proj_p, layer_map = convert_ip_adapter(sd, TINY_UNET)
    assert set(layer_map) == set(order)
    # Flax [in, out] layout.
    assert layer_map[order[0]]['to_k_ip']['kernel'].shape == (d_ctx, 32)

    # Merge into a base (no-ip) tree and run the ip-enabled module.
    unet_base = UNet2DCondition(TINY_UNET)
    k = jax.random.PRNGKey(2)
    base_params = unet_base.init(k, jnp.zeros((1, 8, 8, 4)),
                                 jnp.zeros((1,)), jnp.zeros((1, 77, 32)))
    merged = merge_ip_weights(base_params, layer_map)
    unet_ip = UNet2DCondition(IP_TINY)

    proj = ImageProjection(d_ctx, 4)
    emb = jnp.asarray(rng.normal(size=(1, d_img)).astype(np.float32))
    tokens = proj.apply({'params': proj_p}, emb)
    assert tokens.shape == (1, 4, d_ctx)

    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    with_ip = unet_ip.apply(merged, lat, jnp.zeros((1,)), ctx, None, None,
                            tokens, 1.0)
    base = unet_base.apply(base_params, lat, jnp.zeros((1,)), ctx)
    assert np.isfinite(np.asarray(with_ip)).all()
    assert np.abs(np.asarray(with_ip) - np.asarray(base)).max() > 1e-7
    # Layer-count mismatch is rejected.
    bad = {k2: v for k2, v in sd.items()
           if not k2.endswith('7.to_k_ip.weight')
           and not k2.endswith('7.to_v_ip.weight')}
    with pytest.raises(ValueError, match='cross-attention layers'):
        convert_ip_adapter(bad, TINY_UNET)


def test_pipeline_with_ip_tokens():
    """SimpleGuidance carries ip tokens through the compiled scan (CFG path:
    uncond rows use ip_uncond)."""
    from flexdiffuse_tpu.models import TINY_VAE, AutoencoderKL
    from flexdiffuse_tpu.pipeline import FlexPipeline
    from flexdiffuse_tpu.pipeline.guides import SimpleGuidance
    unet, params = _models()
    k = jax.random.PRNGKey(0)
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    pipe = FlexPipeline(unet, params, vae, vp, scheduler='pndm')
    rng = np.random.default_rng(3)
    base_kwargs = dict(
        embeddings=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
        uncond=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
        guidance_scale=jnp.float32(7.5))
    ip = jnp.asarray(rng.normal(size=(1, 4, 32)), jnp.float32)
    g0 = SimpleGuidance(**base_kwargs, ip_tokens=ip,
                        ip_scale=jnp.float32(0.0))
    g1 = SimpleGuidance(**base_kwargs, ip_tokens=ip,
                        ip_scale=jnp.float32(1.0))
    out0 = pipe(g0, steps=3, init_size=(32, 32), output_type='np',
                key=jax.random.PRNGKey(7))
    out1 = pipe(g1, steps=3, init_size=(32, 32), output_type='np',
                key=jax.random.PRNGKey(7))
    assert np.isfinite(out1.images).all()
    assert np.abs(out1.images - out0.images).max() > 1e-6
