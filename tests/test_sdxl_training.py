"""SDXL training: added_cond threading through the train steps, SDXL
dataset encoding (dual-tower context + pooled + time_ids), LoRA
fine-tuning of the SDXL backbone with export round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from flexdiffuse_tpu import training
from flexdiffuse_tpu.models import TINY_VAE, AutoencoderKL, UNet2DCondition
from flexdiffuse_tpu.models.configs import TINY_SDXL_UNET


@pytest.fixture(scope='module')
def sdxl_unet():
    unet = UNet2DCondition(TINY_SDXL_UNET)
    k = jax.random.PRNGKey(0)
    d = TINY_SDXL_UNET.addition_pooled_dim
    ac = {'text_embeds': jnp.zeros((1, d)), 'time_ids': jnp.zeros((1, 6))}
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, TINY_SDXL_UNET.cross_attention_dim)),
                   added_cond=ac)
    return unet, up


class StubSDXLEncoder:
    """SDXLTextEncoder stand-in: (context, pooled) from caption hash."""

    def encode(self, prompts):
        if isinstance(prompts, str):
            prompts = [prompts]
        ctx, pooled = [], []
        for p in prompts:
            rng = np.random.default_rng(abs(hash(p)) % (2**31))
            ctx.append(rng.normal(
                size=(77, TINY_SDXL_UNET.cross_attention_dim)).astype(
                    np.float32))
            pooled.append(rng.normal(
                size=(TINY_SDXL_UNET.addition_pooled_dim,)).astype(
                    np.float32))
        return jnp.asarray(np.stack(ctx)), jnp.asarray(np.stack(pooled))


def _write_images(d, n=3):
    os.makedirs(d, exist_ok=True)
    for i in range(n):
        Image.fromarray(np.full((32, 32, 3), 30 * i + 9, np.uint8)).save(
            os.path.join(d, f'x_{i}.png'))
        with open(os.path.join(d, f'x_{i}.txt'), 'w') as f:
            f.write(f'an sdxl test {i}')


def test_encode_dataset_sdxl(tmp_path):
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    vp = vae.init(k, jnp.zeros((1, 8, 8, 3)), k)
    d = str(tmp_path / 'ds')
    _write_images(d)
    ds = training.encode_dataset_sdxl(training.find_items(d), vae, vp,
                                      StubSDXLEncoder(), resolution=16)
    assert ds.pooled.shape == (3, TINY_SDXL_UNET.addition_pooled_dim)
    assert ds.time_ids.shape == (1, 6)
    assert float(ds.time_ids[0, 0]) == 16.0
    lat, ctx, added = next(ds.batches(2, jax.random.PRNGKey(1)))
    assert added['text_embeds'].shape == (
        2, TINY_SDXL_UNET.addition_pooled_dim)
    assert added['time_ids'].shape == (2, 6)


def test_sdxl_full_step_with_added_cond(sdxl_unet):
    unet, up = sdxl_unet
    cfg = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                               donate=False)
    step, tx = training.make_train_step(unet, cfg)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(
        size=(2, 77, TINY_SDXL_UNET.cross_attention_dim)).astype(np.float32))
    extra = {'text_embeds': jnp.asarray(rng.normal(
        size=(2, TINY_SDXL_UNET.addition_pooled_dim)).astype(np.float32)),
        'time_ids': jnp.broadcast_to(jnp.arange(6.0), (2, 6))}
    p, _, loss = step(up, tx.init(up), lat, ctx, jax.random.PRNGKey(1),
                      extra)
    assert np.isfinite(float(loss))
    # added_cond must influence the loss (different embeds → different pred).
    extra2 = dict(extra, text_embeds=extra['text_embeds'] + 1.0)
    _, _, loss2 = step(up, tx.init(up), lat, ctx, jax.random.PRNGKey(1),
                       extra2)
    assert float(loss) != float(loss2)


def test_sdxl_lora_end_to_end(sdxl_unet, tmp_path):
    """Folder → SDXL encode → train_lora → kohya file → apply_lora."""
    unet, up = sdxl_unet
    vae = AutoencoderKL(TINY_VAE)
    k = jax.random.PRNGKey(0)
    vp = vae.init(k, jnp.zeros((1, 8, 8, 3)), k)
    d = str(tmp_path / 'ds')
    _write_images(d)
    ds = training.encode_dataset_sdxl(training.find_items(d), vae, vp,
                                      StubSDXLEncoder(), resolution=16)
    out = str(tmp_path / 'sdxl_lora.safetensors')
    cfg = training.TrainConfig(learning_rate=5e-3, weight_decay=0.0)
    factors, losses = training.train_lora(
        unet, up, ds, cfg, rank=2, steps=4, batch_size=2,
        key=jax.random.PRNGKey(0), save_path=out, log_every=2)
    assert losses and all(np.isfinite(losses))
    from safetensors.numpy import load_file

    from flexdiffuse_tpu.weights import lora as wlora
    merged, _ = wlora.apply_lora(up, None, load_file(out), scale=1.0)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), up, merged)
    assert max(jax.tree_util.tree_leaves(deltas)) > 0
