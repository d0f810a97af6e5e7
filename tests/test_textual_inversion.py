"""Textual-inversion: tokenizer added tokens + embedding-table extension."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.models import CLIPTextModel
from flexdiffuse_tpu.models.configs import CLIPTextConfig
from flexdiffuse_tpu.text.tokenizer import CLIPTokenizer
from flexdiffuse_tpu.weights import textual_inversion as ti


@pytest.fixture()
def mini_tok(tmp_path):
    chars = 'abcdefghijklmnopqrstuvwxyz<>{}'
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
        vocab[c + '</w>'] = len(vocab)
    for tok in ('ca', 'cat</w>',):
        vocab[tok] = len(vocab)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    (tmp_path / 'vocab.json').write_text(json.dumps(vocab))
    (tmp_path / 'merges.txt').write_text(
        '\n'.join(['#version: 0.2', 'c a', 'ca t</w>']))
    return CLIPTokenizer(str(tmp_path / 'vocab.json'),
                         str(tmp_path / 'merges.txt'))


def test_added_tokens_encode_literally(mini_tok):
    tk = mini_tok
    ids = tk.add_tokens('<sks>', num_vectors=2)
    assert ids == [len(tk.encoder), len(tk.encoder) + 1]
    # Literal match inside a sentence; multi-vector expands in place.
    got = tk.encode('a <sks> cat')
    assert got == [tk.encoder['a</w>']] + ids + [tk.encoder['cat</w>']]
    # Case-insensitive (prompts are lowercased).
    assert tk.encode('<SKS>') == ids
    # Re-adding the same name is an error; new names keep advancing ids.
    with pytest.raises(ValueError):
        tk.add_tokens('<sks>')
    assert tk.add_tokens('<other>') == [len(tk.encoder) + 2]


def test_add_textual_inversion_extends_table_and_conditions(mini_tok):
    tk = mini_tok
    cfg = CLIPTextConfig(vocab_size=len(tk.encoder), hidden_size=16,
                         num_layers=2, num_heads=2, intermediate_size=32)
    model = CLIPTextModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))

    rng = np.random.default_rng(0)
    table = rng.normal(size=(2, 16)).astype(np.float32)
    new_params = ti.add_textual_inversion(tk, params, '<sks>', table)

    emb = np.asarray(new_params['params']['token_embedding']['embedding'])
    assert emb.shape[0] == len(tk.encoder) + 2
    np.testing.assert_array_equal(emb[-2:], table)
    # Original tree untouched.
    assert np.asarray(
        params['params']['token_embedding']['embedding']).shape[0] == \
        len(tk.encoder)

    # The concept changes the encoding vs an unknown plain word. flax
    # validates the Embed shape against the config, so apply through a
    # model rebuilt for the grown vocabulary (what Runner does).
    import dataclasses
    model2 = CLIPTextModel(dataclasses.replace(cfg,
                                               vocab_size=emb.shape[0]))
    ids_c = jnp.asarray(tk('a <sks> cat'))
    ids_p = jnp.asarray(tk('a cat'))
    out_c = model2.apply(new_params, ids_c)
    out_p = model2.apply(new_params, ids_p)
    assert np.isfinite(np.asarray(out_c)).all()
    assert np.abs(np.asarray(out_c) - np.asarray(out_p)).max() > 1e-6


def test_extract_embedding_formats():
    t = np.zeros((3, 8), np.float32)
    # A1111 flattened .pt
    tok, got = ti.extract_embedding({'string_to_param.*': t})
    assert got.shape == (3, 8) and tok is None
    # safetensors emb_params
    _, got = ti.extract_embedding({'emb_params': t})
    assert got.shape == (3, 8)
    # diffusers single-tensor dict: key is the token
    tok, got = ti.extract_embedding({'<concept>': t[0]})
    assert tok == '<concept>' and got.shape == (1, 8)
    with pytest.raises(ValueError, match='cannot locate'):
        ti.extract_embedding({'a': t, 'b': t})


def test_width_mismatch_raises(mini_tok):
    cfg = CLIPTextConfig(vocab_size=len(mini_tok.encoder), hidden_size=16,
                         num_layers=1, num_heads=2, intermediate_size=32)
    params = CLIPTextModel(cfg).init(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 77), jnp.int32))
    with pytest.raises(ValueError, match='width'):
        ti.add_textual_inversion(mini_tok, params, '<x>',
                                 np.zeros((1, 24), np.float32))


def test_runner_load_textual_inversion_end_to_end(mini_tok, tmp_path):
    import safetensors.numpy as st
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.models import (TINY_UNET, TINY_VAE, TINY_VISION,
                                        AutoencoderKL, CLIPVisionModel,
                                        UNet2DCondition)
    from flexdiffuse_tpu.runner import Runner

    k = jax.random.PRNGKey(0)
    cfg = CLIPTextConfig(vocab_size=len(mini_tok.encoder), hidden_size=32,
                         num_layers=2, num_heads=4, intermediate_size=64)
    text = CLIPTextModel(cfg)
    tp = text.init(k, jnp.zeros((1, 77), jnp.int32))
    vision = CLIPVisionModel(TINY_VISION)
    vp = vision.init(k, jnp.zeros((1, 32, 32, 3)))
    unet = UNet2DCondition(TINY_UNET)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vae = AutoencoderKL(TINY_VAE)
    vaep = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    runner = Runner.from_models(text, tp, vision, vp, unet, up, vae, vaep,
                                mini_tok,
                                config=RunConfig(output_dir=str(tmp_path)))

    rng = np.random.default_rng(0)
    f = str(tmp_path / 'concept.safetensors')
    st.save_file({'emb_params': rng.normal(size=(2, 32)).astype(np.float32)},
                 f)
    base, _ = runner.gen(prompt='a <cept> cat', steps=2, init_size=(32, 32),
                         samples=1, seed=3, save=False)
    runner.load_textual_inversion(f, token='<cept>')
    styled, _ = runner.gen(prompt='a <cept> cat', steps=2,
                           init_size=(32, 32), samples=1, seed=3, save=False)
    # Before loading, '<cept>' tokenizes as plain chars; after, the learned
    # vectors condition the UNet -> different image at the same seed.
    assert np.abs(np.asarray(base[0], np.float32)
                  - np.asarray(styled[0], np.float32)).max() > 0
