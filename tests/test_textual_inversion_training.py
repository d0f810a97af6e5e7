"""Textual-inversion TRAINING (training/textual_inversion.py): only the new
rows move, loss drops on an overfit draw, export round-trips through the
inference-side loader (weights/textual_inversion.py)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from flexdiffuse_tpu import training
from flexdiffuse_tpu.models import (TINY_TEXT, TINY_UNET, TINY_VAE,
                                    AutoencoderKL, CLIPTextModel,
                                    UNet2DCondition)
from flexdiffuse_tpu.text.tokenizer import FakeTokenizer

pytestmark = pytest.mark.filterwarnings('ignore::DeprecationWarning')


@pytest.fixture(scope='module')
def models():
    import dataclasses
    text_cfg = dataclasses.replace(TINY_TEXT, hidden_size=32)
    text = CLIPTextModel(text_cfg)
    unet = UNet2DCondition(TINY_UNET)
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    tp = text.init(k, jnp.zeros((1, 77), jnp.int32))
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    vp = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
    return text, tp, unet, up, vae, vp


def _images(tmp_path, n=3):
    paths = []
    for i in range(n):
        p = str(tmp_path / f'concept_{i}.png')
        arr = (np.random.default_rng(i).uniform(0, 255, (48, 48, 3)))
        Image.fromarray(arr.astype(np.uint8)).save(p)
        paths.append(p)
    return paths


def test_fake_tokenizer_add_tokens():
    tok = FakeTokenizer(1000)
    ids = tok.add_tokens('<thing>', num_vectors=2)
    assert ids == [1000, 1001]
    enc = tok.encode('a photo of <thing> here')
    assert 1000 in enc and 1001 in enc
    with pytest.raises(ValueError):
        tok.add_tokens('<thing>')


def test_ti_step_moves_only_new_rows(models):
    """Gradients reach the trainable rows; the frozen table is untouched
    by construction (rows live outside the param tree)."""
    text, tp, unet, up, vae, vp = models
    tok = FakeTokenizer(TINY_TEXT.vocab_size)
    tok.add_tokens('<cat-toy>')
    cfg = training.TrainConfig(learning_rate=1e-2, weight_decay=0.0,
                               donate=False)
    # Grow the frozen table by one row (what train_textual_inversion does).
    import dataclasses
    root = dict(tp['params'])
    emb = np.asarray(root['token_embedding']['embedding'])
    rows0 = jnp.asarray(0.01 * np.ones((1, emb.shape[1]), np.float32))
    root['token_embedding'] = dict(root['token_embedding'],
                                   embedding=np.concatenate(
                                       [emb, np.asarray(rows0)]))
    tp2 = {'params': root}
    text2 = CLIPTextModel(dataclasses.replace(text.config,
                                              vocab_size=emb.shape[0] + 1))
    step, tx = training.make_ti_train_step(text2, tp2, unet, up, cfg,
                                           row_start=emb.shape[0])
    opt = tx.init(rows0)
    ids = jnp.asarray(tok(['a photo of <cat-toy>'] * 2))
    lat = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 8, 8, 4)).astype(np.float32))
    rows, opt, loss = step(rows0, opt, lat, ids, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert float(jnp.abs(rows - rows0).max()) > 0


def test_ti_end_to_end_and_reload(models, tmp_path):
    text, tp, unet, up, vae, vp = models
    tok = FakeTokenizer(TINY_TEXT.vocab_size)
    out = str(tmp_path / 'concept.safetensors')
    paths = _images(tmp_path)
    rows, losses = training.train_textual_inversion(
        text, tp, tok, unet, up, vae, vp, paths, '<my-concept>',
        num_vectors=2, steps=6, batch_size=2, resolution=16,
        key=jax.random.PRNGKey(0), save_path=out, log_every=2,
        cfg=training.TrainConfig(learning_rate=5e-3, weight_decay=0.0))
    assert rows.shape == (2, 32)
    assert losses and all(np.isfinite(losses))
    assert os.path.exists(out)

    # Round-trip through the inference loader: token + table recovered,
    # vectors appended at the ids the tokenizer hands out.
    from flexdiffuse_tpu.weights import load as wload
    from flexdiffuse_tpu.weights import textual_inversion as wti
    sd = wload.load_state_dict(out)
    token, table = wti.extract_embedding(sd, None)
    assert token == '<my-concept>'
    np.testing.assert_allclose(table, rows, rtol=0, atol=1e-6)
    tok2 = FakeTokenizer(TINY_TEXT.vocab_size)
    new_tp = wti.add_textual_inversion(tok2, tp, token, table)
    new_emb = np.asarray(new_tp['params']['token_embedding']['embedding'])
    assert new_emb.shape[0] == TINY_TEXT.vocab_size + 2
    np.testing.assert_allclose(new_emb[-2:], rows, rtol=0, atol=1e-6)


def test_ti_initializer_token(models):
    text, tp, unet, up, vae, vp = models
    tok = FakeTokenizer(TINY_TEXT.vocab_size)
    rows = training.textual_inversion.init_rows(
        tp, tok, 'toy', 3, jax.random.PRNGKey(0))
    tid = tok.encode('toy')[0]
    emb = np.asarray(tp['params']['token_embedding']['embedding'])
    np.testing.assert_allclose(np.asarray(rows),
                               np.broadcast_to(emb[tid], (3, 32)))
