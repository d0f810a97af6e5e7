"""ControlNet: residual wiring, zero-init no-op, pipeline integration."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (TINY_UNET, TINY_VAE, AutoencoderKL,
                                    UNet2DCondition)
from flexdiffuse_tpu.models.controlnet import ControlNetModel
from flexdiffuse_tpu.pipeline import FlexPipeline
from flexdiffuse_tpu.pipeline.guides import SimpleGuidance


@pytest.fixture(scope='module')
def models():
    k = jax.random.PRNGKey(0)
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    cn = ControlNetModel(TINY_UNET, cond_channels=(8, 16))
    cnp = cn.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                  jnp.zeros((1, 77, 32)), jnp.zeros((1, 16, 16, 3)))
    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return unet, up, cn, cnp, vae, vp


def test_residual_shapes_match_unet_skips(models):
    unet, up, cn, cnp, _, _ = models
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 77, 32)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    down, mid = cn.apply(cnp, lat, jnp.zeros((2,)), ctx, cond)
    # TINY_UNET (2 levels, 1 layer each, 1 downsample): conv_in + 2 + 1 = 4.
    assert len(down) == 4
    assert down[0].shape == (2, 8, 8, 32)
    assert mid.shape[-1] == TINY_UNET.block_channels[-1]
    # The UNet consumes them without shape errors.
    out = unet.apply(up, lat, jnp.zeros((2,)), ctx, None, (down, mid))
    assert out.shape == lat.shape


def test_zero_init_controlnet_is_exact_noop(models):
    """Freshly initialized zero convs make the control branch an exact
    no-op — the defining ControlNet property."""
    unet, up, cn, cnp, _, _ = models
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    control = cn.apply(cnp, lat, jnp.zeros((1,)), ctx, cond)
    base = unet.apply(up, lat, jnp.zeros((1,)), ctx)
    with_cn = unet.apply(up, lat, jnp.zeros((1,)), ctx, None, control)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_cn))


def _perturb_zero_convs(cnp):
    import jax
    params = jax.tree_util.tree_map(lambda x: x, cnp)
    rng = np.random.default_rng(7)
    root = params['params']
    targets = [node for name, node in root.items()
               if name.startswith('zero_conv')]
    targets.append(root['cond_embed']['conv_out'])  # also zero-init
    for node in targets:
        k = np.asarray(node['kernel'])
        node['kernel'] = jnp.asarray(
            rng.normal(size=k.shape).astype(np.float32) * 0.1)
    return params


def test_pipeline_with_controlnet(models):
    unet, up, cn, cnp, vae, vp = models
    cnp_live = _perturb_zero_convs(cnp)
    pipe = FlexPipeline(unet, up, vae, vp, scheduler='pndm',
                        controlnet=cn, controlnet_params=cnp_live)
    rng = np.random.default_rng(2)
    g = SimpleGuidance(
        embeddings=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
        uncond=jnp.asarray(rng.normal(size=(1, 77, 32)), jnp.float32),
        guidance_scale=jnp.float32(7.5))
    cond = rng.uniform(size=(32, 32, 3)).astype(np.float32)

    base = pipe(g, steps=3, init_size=(32, 32), output_type='np',
                key=jax.random.PRNGKey(5))
    ctl = pipe(g, steps=3, init_size=(32, 32), output_type='np',
               key=jax.random.PRNGKey(5), control_image=cond)
    assert np.isfinite(ctl.images).all()
    assert np.abs(ctl.images - base.images).max() > 1e-6
    # scale 0 restores the uncontrolled result exactly.
    off = pipe(g, steps=3, init_size=(32, 32), output_type='np',
               key=jax.random.PRNGKey(5), control_image=cond,
               controlnet_scale=0.0)
    np.testing.assert_allclose(off.images, base.images, atol=1e-6)
    # A different control image changes the output.
    cond2 = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    ctl2 = pipe(g, steps=3, init_size=(32, 32), output_type='np',
                key=jax.random.PRNGKey(5), control_image=cond2)
    assert np.abs(ctl2.images - ctl.images).max() > 1e-6


def test_control_image_without_controlnet_raises(models):
    unet, up, _, _, vae, vp = models
    pipe = FlexPipeline(unet, up, vae, vp)
    g = SimpleGuidance(embeddings=jnp.zeros((1, 77, 32)),
                       uncond=jnp.zeros((1, 77, 32)),
                       guidance_scale=jnp.float32(7.5))
    with pytest.raises(ValueError, match='controlnet'):
        pipe(g, steps=2, init_size=(32, 32),
             control_image=np.zeros((32, 32, 3), np.float32))


def test_converter_roundtrip_shapes(models):
    """Synthesize a diffusers-named ControlNet state dict from our params
    (inverse rename) and check the converter reproduces the tree."""
    from flexdiffuse_tpu.weights import convert
    _, _, cn, cnp, _, _ = models
    params = cnp['params']

    sd = {}

    def put_conv(dst, node):
        sd[f'{dst}.weight'] = np.asarray(node['kernel']).transpose(3, 2, 0, 1)
        if 'bias' in node:
            sd[f'{dst}.bias'] = np.asarray(node['bias'])

    def put_dense(dst, node):
        sd[f'{dst}.weight'] = np.asarray(node['kernel']).T
        if 'bias' in node:
            sd[f'{dst}.bias'] = np.asarray(node['bias'])

    def put_norm(dst, node):
        sd[f'{dst}.weight'] = np.asarray(node['scale'])
        sd[f'{dst}.bias'] = np.asarray(node['bias'])

    def put_tree(dst, node):
        for k, v in node.items():
            name = f'{dst}.{k}'
            if isinstance(v, dict):
                if set(v) <= {'kernel', 'bias'}:
                    kern = np.asarray(v['kernel'])
                    (put_conv if kern.ndim == 4 else put_dense)(name, v)
                elif set(v) == {'scale', 'bias'}:
                    put_norm(name, v)
                else:
                    put_tree(name, v)

    put_dense('time_embedding.linear_1', params['time_embed_1'])
    put_dense('time_embedding.linear_2', params['time_embed_2'])
    put_conv('conv_in', params['conv_in'])
    put_conv('controlnet_cond_embedding.conv_in',
             params['cond_embed']['conv_in'])
    put_conv('controlnet_cond_embedding.conv_out',
             params['cond_embed']['conv_out'])
    for i in range(6):
        key = f'block_{i}'
        if key in params['cond_embed']:
            put_conv(f'controlnet_cond_embedding.blocks.{i}',
                     params['cond_embed'][key])
    cfg = TINY_UNET
    for i in range(len(cfg.block_channels)):
        for j in range(cfg.layers_per_block):
            put_tree(f'down_blocks.{i}.resnets.{j}',
                     params[f'down_{i}_res_{j}'])
            if cfg.attention_levels[i]:
                a = params[f'down_{i}_attn_{j}']
                dst = f'down_blocks.{i}.attentions.{j}'
                put_norm(f'{dst}.norm', a['norm'])
                put_conv(f'{dst}.proj_in', a['proj_in'])
                put_conv(f'{dst}.proj_out', a['proj_out'])
                blk = a['blocks_0']
                for attn in ('attn1', 'attn2'):
                    for proj in ('to_q', 'to_k', 'to_v'):
                        put_dense(
                            f'{dst}.transformer_blocks.0.{attn}.{proj}',
                            blk[attn][proj])
                    put_dense(f'{dst}.transformer_blocks.0.{attn}.to_out.0',
                              blk[attn]['to_out'])
                for nrm in ('norm1', 'norm2', 'norm3'):
                    put_norm(f'{dst}.transformer_blocks.0.{nrm}', blk[nrm])
                put_dense(f'{dst}.transformer_blocks.0.ff.net.0.proj',
                          blk['ff']['proj_in'])
                put_dense(f'{dst}.transformer_blocks.0.ff.net.2',
                          blk['ff']['proj_out'])
        if i != len(cfg.block_channels) - 1:
            put_conv(f'down_blocks.{i}.downsamplers.0.conv',
                     params[f'down_{i}_downsample']['conv'])
    put_tree('mid_block.resnets.0', params['mid_res_0'])
    put_tree('mid_block.resnets.1', params['mid_res_1'])
    a = params['mid_attn']
    put_norm('mid_block.attentions.0.norm', a['norm'])
    put_conv('mid_block.attentions.0.proj_in', a['proj_in'])
    put_conv('mid_block.attentions.0.proj_out', a['proj_out'])
    blk = a['blocks_0']
    for attn in ('attn1', 'attn2'):
        for proj in ('to_q', 'to_k', 'to_v'):
            put_dense(
                f'mid_block.attentions.0.transformer_blocks.0.{attn}.{proj}',
                blk[attn][proj])
        put_dense(
            f'mid_block.attentions.0.transformer_blocks.0.{attn}.to_out.0',
            blk[attn]['to_out'])
    for nrm in ('norm1', 'norm2', 'norm3'):
        put_norm(f'mid_block.attentions.0.transformer_blocks.0.{nrm}',
                 blk[nrm])
    put_dense('mid_block.attentions.0.transformer_blocks.0.ff.net.0.proj',
              blk['ff']['proj_in'])
    put_dense('mid_block.attentions.0.transformer_blocks.0.ff.net.2',
              blk['ff']['proj_out'])
    k = 0
    while f'zero_conv_{k}' in params:
        put_conv(f'controlnet_down_blocks.{k}', params[f'zero_conv_{k}'])
        k += 1
    put_conv('controlnet_mid_block', params['zero_conv_mid'])

    got = convert.convert_controlnet(sd, cfg)
    flat_got = dict((jax.tree_util.keystr(p), v) for p, v in
                    jax.tree_util.tree_leaves_with_path(got))
    flat_ref = dict((jax.tree_util.keystr(p), v) for p, v in
                    jax.tree_util.tree_leaves_with_path(params))
    assert set(flat_got) == set(flat_ref)
    for kk, v in flat_got.items():
        np.testing.assert_allclose(v, flat_ref[kk], atol=1e-6,
                                   err_msg=f'mismatch at {kk}')
