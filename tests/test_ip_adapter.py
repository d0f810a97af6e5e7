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


# ---------------------------------------------------------------------------
# Plus (perceiver Resampler) variant


def _plus_sd(rng, d_ctx=32, dim=16, nq=3, depth=2, embed=24, ff_mult=2):
    """Synthetic IP-Adapter *Plus* checkpoint (image_proj Resampler part)."""
    inner = dim  # single head at tiny dims
    sd = {
        'image_proj.latents':
            rng.normal(size=(1, nq, dim)).astype(np.float32),
        'image_proj.proj_in.weight':
            rng.normal(size=(dim, embed)).astype(np.float32) * 0.2,
        'image_proj.proj_in.bias': rng.normal(size=(dim,)).astype(np.float32),
        'image_proj.proj_out.weight':
            rng.normal(size=(d_ctx, dim)).astype(np.float32) * 0.2,
        'image_proj.proj_out.bias':
            rng.normal(size=(d_ctx,)).astype(np.float32),
        'image_proj.norm_out.weight':
            rng.normal(size=(d_ctx,)).astype(np.float32),
        'image_proj.norm_out.bias':
            rng.normal(size=(d_ctx,)).astype(np.float32),
    }
    for i in range(depth):
        pre = f'image_proj.layers.{i}'
        sd[f'{pre}.0.norm1.weight'] = rng.normal(size=(dim,)).astype(
            np.float32)
        sd[f'{pre}.0.norm1.bias'] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f'{pre}.0.norm2.weight'] = rng.normal(size=(dim,)).astype(
            np.float32)
        sd[f'{pre}.0.norm2.bias'] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f'{pre}.0.to_q.weight'] = \
            rng.normal(size=(inner, dim)).astype(np.float32) * 0.2
        sd[f'{pre}.0.to_kv.weight'] = \
            rng.normal(size=(2 * inner, dim)).astype(np.float32) * 0.2
        sd[f'{pre}.0.to_out.weight'] = \
            rng.normal(size=(dim, inner)).astype(np.float32) * 0.2
        sd[f'{pre}.1.0.weight'] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f'{pre}.1.0.bias'] = rng.normal(size=(dim,)).astype(np.float32)
        sd[f'{pre}.1.1.weight'] = \
            rng.normal(size=(ff_mult * dim, dim)).astype(np.float32) * 0.2
        sd[f'{pre}.1.3.weight'] = \
            rng.normal(size=(dim, ff_mult * dim)).astype(np.float32) * 0.2
    return sd


def _np_ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _np_resampler(sd, x, depth, heads):
    """Numpy oracle of the published IP-Adapter Plus Resampler forward
    (proj_in -> depth x [perceiver attention + gated-free FF, residual] ->
    proj_out -> LN), written independently of the flax module."""
    lat = np.repeat(sd['image_proj.latents'], x.shape[0], axis=0)
    x = x @ sd['image_proj.proj_in.weight'].T + sd['image_proj.proj_in.bias']
    b, nq, dim = lat.shape
    for i in range(depth):
        pre = f'image_proj.layers.{i}'
        xn = _np_ln(x, sd[f'{pre}.0.norm1.weight'], sd[f'{pre}.0.norm1.bias'])
        ln = _np_ln(lat, sd[f'{pre}.0.norm2.weight'],
                    sd[f'{pre}.0.norm2.bias'])
        q = ln @ sd[f'{pre}.0.to_q.weight'].T
        kv_in = np.concatenate([xn, ln], axis=1)
        kv = kv_in @ sd[f'{pre}.0.to_kv.weight'].T
        k, v = np.split(kv, 2, axis=-1)
        inner = q.shape[-1]
        dh = inner // heads

        def hsplit(t):
            return t.reshape(b, t.shape[1], heads, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = hsplit(q), hsplit(k), hsplit(v)
        scale = 1.0 / np.sqrt(np.sqrt(dh))
        w = (qh * scale) @ (kh * scale).transpose(0, 1, 3, 2)
        w = np.exp(w - w.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        out = (w @ vh).transpose(0, 2, 1, 3).reshape(b, nq, inner)
        lat = lat + out @ sd[f'{pre}.0.to_out.weight'].T
        h = _np_ln(lat, sd[f'{pre}.1.0.weight'], sd[f'{pre}.1.0.bias'])
        h = h @ sd[f'{pre}.1.1.weight'].T
        from scipy.special import erf  # exact GELU
        h = 0.5 * h * (1.0 + erf(h / np.sqrt(2.0)))
        lat = lat + h @ sd[f'{pre}.1.3.weight'].T
    out = lat @ sd['image_proj.proj_out.weight'].T + \
        sd['image_proj.proj_out.bias']
    return _np_ln(out, sd['image_proj.norm_out.weight'],
                  sd['image_proj.norm_out.bias'])


def test_resampler_matches_numpy_oracle():
    from flexdiffuse_tpu.models.ip_adapter import build_image_proj
    pytest.importorskip('scipy')
    rng = np.random.default_rng(5)
    sd = _plus_sd(rng)
    module, params, tokens, kind = build_image_proj(sd, TINY_UNET)
    assert kind == 'penultimate'
    assert tokens == 3
    x = rng.normal(size=(2, 7, 24)).astype(np.float32)
    got = np.asarray(module.apply(params, jnp.asarray(x)))
    want = _np_resampler(sd, x, depth=2, heads=module.heads)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_plus_checkpoint_end_to_end_merge():
    """Full Plus checkpoint (Resampler + per-layer projections) through
    build_image_proj + convert_ip_layers + merge, driven through the
    ip-enabled UNet."""
    from flexdiffuse_tpu.models.ip_adapter import (build_image_proj,
                                                   convert_ip_layers)
    rng = np.random.default_rng(6)
    d_ctx = TINY_UNET.cross_attention_dim
    sd = _plus_sd(rng, d_ctx=d_ctx)
    order = attn2_layer_order(TINY_UNET)
    widths = {'down_0_attn_0': 32, 'mid_attn': 64, 'up_1_attn_0': 32,
              'up_1_attn_1': 32}
    for n, path in enumerate(order):
        d = widths[path[0]]
        sd[f'ip_adapter.{2 * n + 1}.to_k_ip.weight'] = \
            rng.normal(size=(d, d_ctx)).astype(np.float32) * 0.1
        sd[f'ip_adapter.{2 * n + 1}.to_v_ip.weight'] = \
            rng.normal(size=(d, d_ctx)).astype(np.float32) * 0.1

    module, pparams, tokens, kind = build_image_proj(sd, TINY_UNET)
    layer_map = convert_ip_layers(sd, TINY_UNET)
    unet_base = UNet2DCondition(TINY_UNET)
    k = jax.random.PRNGKey(2)
    base_params = unet_base.init(k, jnp.zeros((1, 8, 8, 4)),
                                 jnp.zeros((1,)), jnp.zeros((1, 77, 32)))
    merged = merge_ip_weights(base_params, layer_map)
    ip_cfg = dataclasses.replace(TINY_UNET, ip_adapter=True,
                                 ip_tokens=tokens)
    unet_ip = UNet2DCondition(ip_cfg)
    hidden = rng.normal(size=(1, 7, 24)).astype(np.float32)
    ip_tokens = module.apply(pparams, jnp.asarray(hidden))
    assert ip_tokens.shape == (1, tokens, d_ctx)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    out = unet_ip.apply(merged, lat, jnp.zeros((1,)), ctx, None, None,
                        ip_tokens, 1.0)
    base = unet_base.apply(base_params, lat, jnp.zeros((1,)), ctx)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-7


def test_base_checkpoint_still_detected():
    """convert_ip_adapter (back-compat) keeps working and refuses Plus."""
    from flexdiffuse_tpu.models.ip_adapter import build_image_proj
    rng = np.random.default_rng(7)
    sd = _plus_sd(rng)
    order = attn2_layer_order(TINY_UNET)
    widths = {'down_0_attn_0': 32, 'mid_attn': 64, 'up_1_attn_0': 32,
              'up_1_attn_1': 32}
    for n, path in enumerate(order):
        d = widths[path[0]]
        sd[f'ip_adapter.{n}.to_k_ip.weight'] = \
            rng.normal(size=(d, 32)).astype(np.float32)
        sd[f'ip_adapter.{n}.to_v_ip.weight'] = \
            rng.normal(size=(d, 32)).astype(np.float32)
    with pytest.raises(ValueError, match='base checkpoints only'):
        convert_ip_adapter(sd, TINY_UNET)
    module, _, _, kind = build_image_proj(sd, TINY_UNET)
    assert kind == 'penultimate' and module.depth == 2
