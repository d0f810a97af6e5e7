"""DreamBooth training (training/dreambooth.py): prior-weighted loss,
instance+class batching, export paths, class-image pre-generation."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from flexdiffuse_tpu import training
from flexdiffuse_tpu.models import (TINY_UNET, TINY_VAE, AutoencoderKL,
                                    UNet2DCondition)
from flexdiffuse_tpu.training.data import EncodedDataset


@pytest.fixture(scope='module')
def tiny():
    unet = UNet2DCondition(TINY_UNET)
    k = jax.random.PRNGKey(0)
    up = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                   jnp.zeros((1, 77, 32)))
    return unet, up


def _ds(seed, n=4):
    rng = np.random.default_rng(seed)
    return EncodedDataset(
        jnp.asarray(rng.normal(size=(n, 8, 8, 4)).astype(np.float32)),
        jnp.full((n, 8, 8, 4), -8.0, jnp.float32),  # tiny posterior noise
        jnp.asarray(rng.normal(size=(n, 77, 32)).astype(np.float32)),
        ['cap'] * n)


def test_sample_weights_scale_loss():
    """diffusion_loss with weights [1, w] == (L_a + w·L_b) / 2 computed
    per-row."""
    cfg = training.TrainConfig()
    acp = jnp.linspace(0.99, 0.01, cfg.num_train_timesteps)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    ctx = jnp.zeros((2, 7, 32))
    key = jax.random.PRNGKey(3)

    def zero_apply(params, noisy, t, context):
        return jnp.zeros_like(noisy)

    w = jnp.asarray([1.0, 0.5])
    got = float(training.diffusion_loss(zero_apply, {}, lat, ctx, key, acp,
                                        cfg, sample_weights=w))
    # Per-row reference: same noise draw, weighted mean.
    k_t, k_n = jax.random.split(key)
    noise = np.asarray(jax.random.normal(k_n, lat.shape, jnp.float32))
    per = (noise**2).mean(axis=(1, 2, 3))
    want = float((per[0] * 1.0 + per[1] * 0.5) / 2)
    assert abs(got - want) < 1e-6


@pytest.mark.parametrize('mode', ['lora', 'full'])
def test_dreambooth_trains_and_saves(tiny, tmp_path, mode):
    unet, up = tiny
    out = str(tmp_path / ('db.safetensors' if mode == 'lora'
                          else 'db.msgpack'))
    cfg = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                               donate=False)
    tree, losses = training.train_dreambooth(
        unet, up, _ds(1), _ds(2), cfg=cfg, prior_weight=0.7, mode=mode,
        rank=2, steps=4, batch_size=2, key=jax.random.PRNGKey(0),
        save_path=out, log_every=2)
    assert losses and all(np.isfinite(losses))
    assert os.path.exists(out)
    if mode == 'lora':
        from safetensors.numpy import load_file

        from flexdiffuse_tpu.weights import lora as wlora
        merged, _ = wlora.apply_lora(up, None, load_file(out), scale=1.0)
        assert merged is not None


def test_generate_class_images(tmp_path):
    """Drives a stub runner; incremental re-run tops up to count."""

    class StubRunner:
        def __init__(self):
            self.calls = 0

        def gen(self, prompt, samples, steps, seed, save):
            self.calls += 1
            img = Image.fromarray(
                np.zeros((8, 8, 3), np.uint8))
            return [img] * samples, None

    d = str(tmp_path / 'class')
    r = StubRunner()
    paths = training.generate_class_images(r, 'a photo of a dog', d,
                                           count=6, steps=2)
    assert len(paths) == 6 and all(os.path.exists(p) for p in paths)
    # Incremental: already have 6, ask for 7 → one more image only.
    r2 = StubRunner()
    paths2 = training.generate_class_images(r2, 'a photo of a dog', d,
                                            count=7, steps=2)
    assert len(paths2) == 7 and r2.calls == 1
