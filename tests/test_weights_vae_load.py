"""VAE converter roundtrip + state-dict/caching load paths."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import AutoencoderKL, TINY_VAE
from flexdiffuse_tpu.weights import convert, load


def _flat(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        name = f'{prefix}.{k}' if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, name))
        else:
            out[name] = np.asarray(v)
    return out


def _torchify_leaf(name, kern_tree):
    """Invert our conversion rules for one conv/dense/norm node."""
    out = {}
    if 'kernel' in kern_tree:
        kern = np.asarray(kern_tree['kernel'])
        # ascontiguousarray: safetensors serializes raw buffers and would
        # scramble transposed views.
        out[f'{name}.weight'] = np.ascontiguousarray(
            kern.transpose(3, 2, 0, 1) if kern.ndim == 4 else kern.T)
        if 'bias' in kern_tree:
            out[f'{name}.bias'] = np.asarray(kern_tree['bias'])
    else:
        out[f'{name}.weight'] = np.asarray(kern_tree['scale'])
        out[f'{name}.bias'] = np.asarray(kern_tree['bias'])
    return out


def _synth_vae_sd(params):
    """Build a diffusers-named AutoencoderKL state dict from tiny params."""
    sd = {}
    cfg = TINY_VAE
    n = len(cfg.block_channels)

    def resnet(dst, src):
        for ours, theirs in (('norm1', 'norm1'), ('conv1', 'conv1'),
                             ('norm2', 'norm2'), ('conv2', 'conv2'),
                             ('conv_shortcut', 'conv_shortcut')):
            if ours in src:
                sd.update(_torchify_leaf(f'{dst}.{theirs}', src[ours]))

    def attn(dst, src):
        for ours, theirs in (('to_q', 'to_q'), ('to_k', 'to_k'),
                             ('to_v', 'to_v'), ('to_out', 'to_out.0'),
                             ('group_norm', 'group_norm')):
            sd.update(_torchify_leaf(f'{dst}.{theirs}', src[ours]))

    enc = params['encoder']
    sd.update(_torchify_leaf('encoder.conv_in', enc['conv_in']))
    sd.update(_torchify_leaf('encoder.conv_norm_out', enc['norm_out']))
    sd.update(_torchify_leaf('encoder.conv_out', enc['conv_out']))
    for i in range(n):
        for j in range(cfg.layers_per_block):
            resnet(f'encoder.down_blocks.{i}.resnets.{j}',
                   enc[f'down_{i}_res_{j}'])
        if i != n - 1:
            sd.update(_torchify_leaf(
                f'encoder.down_blocks.{i}.downsamplers.0.conv',
                enc[f'down_{i}_downsample']))
    resnet('encoder.mid_block.resnets.0', enc['mid_res_0'])
    resnet('encoder.mid_block.resnets.1', enc['mid_res_1'])
    attn('encoder.mid_block.attentions.0', enc['mid_attn'])

    dec = params['decoder']
    sd.update(_torchify_leaf('decoder.conv_in', dec['conv_in']))
    sd.update(_torchify_leaf('decoder.conv_norm_out', dec['norm_out']))
    sd.update(_torchify_leaf('decoder.conv_out', dec['conv_out']))
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            resnet(f'decoder.up_blocks.{i}.resnets.{j}',
                   dec[f'up_{i}_res_{j}'])
        if i != n - 1:
            sd.update(_torchify_leaf(
                f'decoder.up_blocks.{i}.upsamplers.0.conv',
                dec[f'up_{i}_upsample']))
    resnet('decoder.mid_block.resnets.0', dec['mid_res_0'])
    resnet('decoder.mid_block.resnets.1', dec['mid_res_1'])
    attn('decoder.mid_block.attentions.0', dec['mid_attn'])

    sd.update(_torchify_leaf('quant_conv', params['quant_conv']))
    sd.update(_torchify_leaf('post_quant_conv', params['post_quant_conv']))
    return sd


@pytest.fixture(scope='module')
def vae_params():
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    return vae.init(k, jnp.zeros((1, 16, 16, 3)), k)['params']


def test_vae_converter_roundtrip(vae_params):
    sd = _synth_vae_sd(vae_params)
    got = convert.convert_vae(sd, TINY_VAE)
    ref = dict((jax.tree_util.keystr(k), v) for k, v in
               jax.tree_util.tree_leaves_with_path(vae_params))
    flat_got = jax.tree_util.tree_leaves_with_path(got)
    assert len(flat_got) == len(ref)
    for k, v in flat_got:
        np.testing.assert_allclose(v, ref[jax.tree_util.keystr(k)],
                                   atol=1e-6,
                                   err_msg=jax.tree_util.keystr(k))


def test_vae_converter_old_attention_names(vae_params):
    """Pre-0.9 diffusers VAE checkpoints use query/key/value/proj_attn."""
    sd = _synth_vae_sd(vae_params)
    for side in ('encoder', 'decoder'):
        for theirs, old in (('to_q', 'query'), ('to_k', 'key'),
                            ('to_v', 'value'), ('to_out.0', 'proj_attn')):
            for suf in ('weight', 'bias'):
                sd[f'{side}.mid_block.attentions.0.{old}.{suf}'] = sd.pop(
                    f'{side}.mid_block.attentions.0.{theirs}.{suf}')
    got = convert.convert_vae(sd, TINY_VAE)
    ref = dict((jax.tree_util.keystr(k), v) for k, v in
               jax.tree_util.tree_leaves_with_path(vae_params))
    for k, v in jax.tree_util.tree_leaves_with_path(got):
        np.testing.assert_allclose(v, ref[jax.tree_util.keystr(k)],
                                   atol=1e-6)


def test_load_state_dict_safetensors(tmp_path, vae_params):
    from safetensors.numpy import save_file
    sd = _synth_vae_sd(vae_params)
    path = tmp_path / 'diffusion_pytorch_model.safetensors'
    save_file(sd, str(path))
    # File path and directory path both work.
    loaded = load.load_state_dict(str(path))
    assert set(loaded) == set(sd)
    loaded2 = load.load_state_dict(str(tmp_path))
    np.testing.assert_array_equal(loaded2['quant_conv.weight'],
                                  sd['quant_conv.weight'])
    with pytest.raises(FileNotFoundError):
        load.load_state_dict(str(tmp_path / 'nope'))


def test_msgpack_cache_roundtrip(tmp_path, vae_params):
    from flax import serialization
    cache = tmp_path / 'cache.msgpack'
    calls = []

    def build():
        calls.append(1)
        return {'a': np.arange(6, dtype=np.float32).reshape(2, 3)}

    a = load._cached(str(cache), build)
    b = load._cached(str(cache), build)
    assert len(calls) == 1  # second hit came from disk
    np.testing.assert_array_equal(a['a'], b['a'])
