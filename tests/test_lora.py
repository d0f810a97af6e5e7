"""LoRA merging: kohya-format adapters folded into the param pytrees."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import (TINY_TEXT, TINY_UNET, CLIPTextModel,
                                    UNet2DCondition)
from flexdiffuse_tpu.weights import lora


def _tiny_unet():
    unet = UNet2DCondition(TINY_UNET)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.zeros((1, 77, 32)))
    return unet, params


def _lora_pair(rng, out_dim, in_dim, rank=4):
    down = rng.normal(size=(rank, in_dim)).astype(np.float32) * 0.1
    up = rng.normal(size=(out_dim, rank)).astype(np.float32) * 0.1
    return down, up


def test_unet_attention_lora_merges_and_changes_output():
    unet, params = _tiny_unet()
    rng = np.random.default_rng(0)
    c = TINY_UNET.block_channels[0]            # 32: level-0 attention width
    down_q, up_q = _lora_pair(rng, c, c)
    down_ff, up_ff = _lora_pair(rng, c * 8, c)  # GEGLU proj_in: dim*4*2
    sd = {
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_down.weight': down_q,
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_up.weight': up_q,
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1'
        '_to_q.alpha': np.float32(4.0),
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0'
        '_ff_net_0_proj.lora_down.weight': down_ff,
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0'
        '_ff_net_0_proj.lora_up.weight': up_ff,
    }
    merged, _ = lora.apply_lora(params, None, sd, scale=0.7)

    # Exact kernel delta: W_flax += scale*(alpha/r)*(up@down)^T.
    w0 = np.asarray(params['params']['down_0_attn_0']['blocks_0']['attn1']
                    ['to_q']['kernel'])
    w1 = np.asarray(merged['params']['down_0_attn_0']['blocks_0']['attn1']
                    ['to_q']['kernel'])
    np.testing.assert_allclose(w1 - w0, 0.7 * (4.0 / 4) * (up_q @ down_q).T,
                               atol=1e-6)
    # alpha defaults to rank when absent → factor 1.
    f0 = np.asarray(params['params']['down_0_attn_0']['blocks_0']['ff']
                    ['proj_in']['kernel'])
    f1 = np.asarray(merged['params']['down_0_attn_0']['blocks_0']['ff']
                    ['proj_in']['kernel'])
    np.testing.assert_allclose(f1 - f0, 0.7 * (up_ff @ down_ff).T,
                               atol=1e-6)

    # The merged model actually computes differently; scale=0 is identity.
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, 77, 32)).astype(np.float32))
    y0 = unet.apply(params, x, jnp.zeros((1,)), ctx)
    y1 = unet.apply(merged, x, jnp.zeros((1,)), ctx)
    assert np.abs(np.asarray(y1) - np.asarray(y0)).max() > 1e-6
    zero, _ = lora.apply_lora(params, None, sd, scale=0.0)
    yz = unet.apply(zero, x, jnp.zeros((1,)), ctx)
    np.testing.assert_array_equal(np.asarray(yz), np.asarray(y0))


def test_proj_in_conv_layout_lora():
    """Transformer proj_in is a 1×1 conv here; conv-layout LoRA tensors
    ([r, in, 1, 1]) must merge into the [1, 1, in, out] kernel."""
    unet, params = _tiny_unet()
    rng = np.random.default_rng(1)
    c = TINY_UNET.block_channels[0]
    down, up = _lora_pair(rng, c, c)
    sd = {
        'lora_unet_down_blocks_0_attentions_0_proj_in.lora_down.weight':
            down[:, :, None, None],
        'lora_unet_down_blocks_0_attentions_0_proj_in.lora_up.weight':
            up[:, :, None, None],
    }
    merged, _ = lora.apply_lora(params, None, sd)
    w0 = np.asarray(
        params['params']['down_0_attn_0']['proj_in']['kernel'])
    w1 = np.asarray(
        merged['params']['down_0_attn_0']['proj_in']['kernel'])
    np.testing.assert_allclose(w1 - w0, (up @ down).T[None, None],
                               atol=1e-6)


def test_text_encoder_lora():
    clip = CLIPTextModel(TINY_TEXT)
    params = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    rng = np.random.default_rng(2)
    d = TINY_TEXT.hidden_size
    down, up = _lora_pair(rng, d, d)
    sd = {
        'lora_te_text_model_encoder_layers_1_self_attn_q_proj'
        '.lora_down.weight': down,
        'lora_te_text_model_encoder_layers_1_self_attn_q_proj'
        '.lora_up.weight': up,
    }
    _, merged = lora.apply_lora(None, params, sd)
    w0 = np.asarray(params['params']['encoder']['layers_1']['self_attn']
                    ['q_proj']['kernel'])
    w1 = np.asarray(merged['params']['encoder']['layers_1']['self_attn']
                    ['q_proj']['kernel'])
    np.testing.assert_allclose(w1 - w0, (up @ down).T, atol=1e-6)
    ids = jnp.zeros((1, 77), jnp.int32)
    assert np.abs(np.asarray(clip.apply(merged, ids))
                  - np.asarray(clip.apply(params, ids))).max() > 1e-8


def test_wrong_base_model_raises_and_unknown_keys_skipped():
    _, params = _tiny_unet()
    rng = np.random.default_rng(3)
    down, up = _lora_pair(rng, 8, 8)
    sd = {
        # attention block index 5 doesn't exist in the tiny model
        'lora_unet_down_blocks_5_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_down.weight': down,
        'lora_unet_down_blocks_5_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_up.weight': up,
    }
    with pytest.raises(KeyError, match='does not match'):
        lora.apply_lora(params, None, sd)
    # LoCon-style conv adapters are skipped (unsupported), and with nothing
    # applicable the call errors clearly.
    with pytest.raises(ValueError, match='no applicable'):
        lora.apply_lora(params, None, {
            'lora_unet_down_blocks_0_resnets_0_conv1.lora_down.weight': down,
            'lora_unet_down_blocks_0_resnets_0_conv1.lora_up.weight': up,
        })


def test_runner_apply_lora_end_to_end(tmp_path):
    """Runner.apply_lora merges a saved safetensors adapter and changes the
    generated image (same seed)."""
    import safetensors.numpy as st
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.models import (TINY_VAE, TINY_VISION, AutoencoderKL,
                                        CLIPVisionModel)
    from flexdiffuse_tpu.runner import Runner

    class FakeTokenizer:
        def __call__(self, texts):
            if isinstance(texts, str):
                texts = [texts]
            return np.full((len(texts), 77), 3, np.int32)

    k = jax.random.PRNGKey(0)
    text = CLIPTextModel(TINY_TEXT)
    tp = text.init(k, jnp.zeros((1, 77), jnp.int32))
    vision = CLIPVisionModel(TINY_VISION)
    vp = vision.init(k, jnp.zeros((1, 32, 32, 3)))
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
    vae = AutoencoderKL(TINY_VAE)
    vaep = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    runner = Runner.from_models(
        text, tp, vision, vp, unet, up, vae, vaep, FakeTokenizer(),
        config=RunConfig(output_dir=str(tmp_path)))

    rng = np.random.default_rng(7)
    c = TINY_UNET.block_channels[0]
    down, upw = _lora_pair(rng, c, c)
    f = str(tmp_path / 'style.safetensors')
    st.save_file({
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_down.weight': down,
        'lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1'
        '_to_q.lora_up.weight': upw,
    }, f)

    base, _ = runner.gen(prompt='a deer', steps=2, init_size=(32, 32),
                         samples=1, seed=5, save=False)
    runner.apply_lora(f, scale=1.5)
    styled, _ = runner.gen(prompt='a deer', steps=2, init_size=(32, 32),
                           samples=1, seed=5, save=False)
    assert np.abs(np.asarray(base[0], np.float32)
                  - np.asarray(styled[0], np.float32)).max() > 0


def test_sgm_block_map_real_sdxl_geometry():
    """The config-derived SGM map must match the known SDXL-base layout."""
    from flexdiffuse_tpu.models.configs import SDXL_UNET
    m = lora.sgm_block_map(SDXL_UNET)
    assert m['input_blocks_4_1'] == 'down_1_attn_0'
    assert m['input_blocks_5_1'] == 'down_1_attn_1'
    assert m['input_blocks_7_1'] == 'down_2_attn_0'
    assert m['input_blocks_8_1'] == 'down_2_attn_1'
    assert m['middle_block_1'] == 'mid_attn'
    assert m['output_blocks_0_1'] == 'up_0_attn_0'
    assert m['output_blocks_2_1'] == 'up_0_attn_2'
    assert m['output_blocks_3_1'] == 'up_1_attn_0'
    assert m['output_blocks_5_1'] == 'up_1_attn_2'
    # level 0 has no attention: blocks 1,2,3,6 and 6.. absent
    assert 'input_blocks_1_1' not in m
    assert 'output_blocks_6_1' not in m


def test_sdxl_sgm_lora_merges():
    """SGM-named (kohya SDXL) adapter merges into the SDXL-shaped tree,
    including the second text encoder via lora_te2_*."""
    from flexdiffuse_tpu.models.configs import TINY_BIGG_TEXT, TINY_SDXL_UNET
    unet = UNet2DCondition(TINY_SDXL_UNET)
    added = {'text_embeds': jnp.zeros((1, 24)), 'time_ids': jnp.zeros((1, 6))}
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.zeros((1, 77, 48)), added)
    te2 = CLIPTextModel(TINY_BIGG_TEXT)
    te2_params = te2.init(jax.random.PRNGKey(1), jnp.zeros((1, 77),
                                                           jnp.int32))
    rng = np.random.default_rng(4)
    c = TINY_SDXL_UNET.block_channels[1]        # 64: the attention level
    # attn2 to_v is a cross-attention projection: context dim -> channels.
    down_u, up_u = _lora_pair(rng, c, TINY_SDXL_UNET.cross_attention_dim)
    d2 = TINY_BIGG_TEXT.hidden_size
    down_t, up_t = _lora_pair(rng, TINY_BIGG_TEXT.intermediate_size, d2)
    # TINY_SDXL (2 levels, 1 layer/level, attn at level 1):
    # conv_in=0, down0 res=1, downsample=2, down1 res+attn=3 -> 3_1.
    sd = {
        'lora_unet_input_blocks_3_1_transformer_blocks_1_attn2_to_v'
        '.lora_down.weight': down_u,
        'lora_unet_input_blocks_3_1_transformer_blocks_1_attn2_to_v'
        '.lora_up.weight': up_u,
        'lora_te2_text_model_encoder_layers_0_mlp_fc1.lora_down.weight':
            down_t,
        'lora_te2_text_model_encoder_layers_0_mlp_fc1.lora_up.weight':
            up_t,
    }
    merged_u, _, merged_t2 = lora.apply_lora(
        params, None, sd, text2_params=te2_params,
        unet_config=TINY_SDXL_UNET)
    w0 = np.asarray(params['params']['down_1_attn_0']['blocks_1']['attn2']
                    ['to_v']['kernel'])
    w1 = np.asarray(merged_u['params']['down_1_attn_0']['blocks_1']['attn2']
                    ['to_v']['kernel'])
    np.testing.assert_allclose(w1 - w0, (up_u @ down_u).T, atol=1e-6)
    t0 = np.asarray(te2_params['params']['encoder']['layers_0']['mlp']
                    ['fc1']['kernel'])
    t1 = np.asarray(merged_t2['params']['encoder']['layers_0']['mlp']
                    ['fc1']['kernel'])
    assert np.abs(t1 - t0).max() > 0


def test_peft_named_lora_with_conv_adapters():
    """diffusers/PEFT naming (the LCM-LoRA format): lora_A/lora_B keys with
    dotted module paths, including k×k conv and resnet adapters."""
    unet, params = _tiny_unet()
    rng = np.random.default_rng(7)
    c = TINY_UNET.block_channels[0]            # 32
    rank = 4
    down_q, up_q = _lora_pair(rng, c, c, rank)
    # 3×3 conv adapter on down_blocks.0.resnets.0.conv1 (in=c, out=c)
    down_c = rng.normal(size=(rank, c, 3, 3)).astype(np.float32) * 0.1
    up_c = rng.normal(size=(c, rank, 1, 1)).astype(np.float32) * 0.1
    # time_emb_proj Dense [temb_dim=4c → c]
    down_t, up_t = _lora_pair(rng, c, 4 * c, rank)
    # downsampler conv (1×1-style handled as k×k too: real one is 3×3)
    down_s = rng.normal(size=(rank, c, 3, 3)).astype(np.float32) * 0.1
    up_s = rng.normal(size=(c, rank, 1, 1)).astype(np.float32) * 0.1
    sd = {
        'unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q'
        '.lora_A.weight': down_q,
        'unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q'
        '.lora_B.weight': up_q,
        'unet.down_blocks.0.resnets.0.conv1.lora_A.weight': down_c,
        'unet.down_blocks.0.resnets.0.conv1.lora_B.weight': up_c,
        'unet.down_blocks.0.resnets.0.time_emb_proj.lora_A.weight': down_t,
        'unet.down_blocks.0.resnets.0.time_emb_proj.lora_B.weight': up_t,
        'unet.down_blocks.0.downsamplers.0.conv.lora_A.weight': down_s,
        'unet.down_blocks.0.downsamplers.0.conv.lora_B.weight': up_s,
    }
    merged, _ = lora.apply_lora(params, None, sd, scale=1.0)

    base = params['params']
    new = merged['params']
    # Dense delta (alpha defaults to rank → unit scaling): W += (up@down)^T
    got = (np.asarray(new['down_0_attn_0']['blocks_0']['attn1']['to_q']
                      ['kernel']) -
           np.asarray(base['down_0_attn_0']['blocks_0']['attn1']['to_q']
                      ['kernel']))
    np.testing.assert_allclose(got, (up_q @ down_q).T, rtol=0, atol=1e-5)
    # conv delta: ΔW[kh,kw,i,o] = Σ_r up[o,r]·down[r,i,kh,kw]
    got_c = (np.asarray(new['down_0_res_0']['conv1']['kernel']) -
             np.asarray(base['down_0_res_0']['conv1']['kernel']))
    want_c = np.einsum('or,rihw->hwio', up_c[:, :, 0, 0], down_c)
    np.testing.assert_allclose(got_c, want_c, rtol=0, atol=1e-5)
    got_t = (np.asarray(new['down_0_res_0']['time_emb_proj']['kernel']) -
             np.asarray(base['down_0_res_0']['time_emb_proj']['kernel']))
    np.testing.assert_allclose(got_t, (up_t @ down_t).T, rtol=0, atol=1e-5)
    got_s = (np.asarray(new['down_0_downsample']['conv']['kernel']) -
             np.asarray(base['down_0_downsample']['conv']['kernel']))
    want_s = np.einsum('or,rihw->hwio', up_s[:, :, 0, 0], down_s)
    np.testing.assert_allclose(got_s, want_s, rtol=0, atol=1e-5)


def test_peft_named_text_encoder_lora():
    text = CLIPTextModel(TINY_TEXT)
    params = text.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 77), jnp.int32))
    rng = np.random.default_rng(9)
    d = TINY_TEXT.hidden_size
    down, up = _lora_pair(rng, d, d)
    sd = {
        'text_encoder.text_model.encoder.layers.0.self_attn.q_proj'
        '.lora_A.weight': down,
        'text_encoder.text_model.encoder.layers.0.self_attn.q_proj'
        '.lora_B.weight': up,
    }
    _, merged = lora.apply_lora(None, params, sd)
    got = (np.asarray(merged['params']['encoder']['layers_0']['self_attn']
                      ['q_proj']['kernel']) -
           np.asarray(params['params']['encoder']['layers_0']['self_attn']
                      ['q_proj']['kernel']))
    np.testing.assert_allclose(got, (up @ down).T, rtol=0, atol=1e-5)
