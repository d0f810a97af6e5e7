"""Training checkpoint/resume (training/checkpoint.py + loop.py + the
data-stream ``skip`` fast-forward): a run interrupted at step N and
resumed must reproduce the uninterrupted run bit-exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flexdiffuse_tpu import training
from flexdiffuse_tpu.models import TINY_UNET, UNet2DCondition

T, D = 7, 32


@pytest.fixture(scope='module')
def unet_and_params():
    unet = UNet2DCondition(TINY_UNET)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.zeros((1, T, D)))
    return unet, params


def _dataset(n=5, hw=8):
    rng = np.random.default_rng(0)
    mean = jnp.asarray(rng.normal(size=(n, hw, hw, 4)).astype(np.float32))
    logvar = jnp.asarray(
        rng.normal(size=(n, hw, hw, 4)).astype(np.float32) - 4)
    ctx = jnp.asarray(rng.normal(size=(n, T, D)).astype(np.float32))
    return training.EncodedDataset(mean, logvar, ctx,
                                   [f'cap {i}' for i in range(n)])


@pytest.mark.parametrize('n,bs,skip', [
    (5, 2, 3),    # mid-epoch resume (2 batches/epoch)
    (5, 2, 4),    # epoch-boundary resume
    (3, 2, 5),    # 1 batch/epoch: skip replays 5 whole epochs
    (2, 4, 3),    # small-dataset replacement-sampling path
])
def test_batches_skip_matches_plain_stream(n, bs, skip):
    ds = _dataset(n=n)
    key = jax.random.PRNGKey(42)
    plain = ds.batches(bs, key)
    for _ in range(skip):
        next(plain)
    fast = ds.batches(bs, key, skip=skip)
    for _ in range(3):  # several post-skip batches stay in lockstep
        a, b = next(plain), next(fast)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_full_resume_bitwise_exact(tmp_path, unet_and_params):
    """train_full interrupted at 3/6 then resumed == uninterrupted 6."""
    unet, params = unet_and_params
    ds = _dataset()
    cfg = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                               donate=False)
    key = jax.random.PRNGKey(7)
    want, want_losses = training.train_full(
        unet, params, ds, cfg, steps=6, batch_size=2, key=key, log_every=1)

    cdir = str(tmp_path / 'ckpt')
    training.train_full(unet, params, ds, cfg, steps=3, batch_size=2,
                        key=key, log_every=1, checkpoint_dir=cdir)
    # Second call resumes from step 3 (the key argument is irrelevant on
    # resume — the checkpoint carries the RNG state).
    got, got_losses = training.train_full(
        unet, params, ds, cfg, steps=6, batch_size=2,
        key=jax.random.PRNGKey(999), log_every=1, checkpoint_dir=cdir)

    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert got_losses == want_losses


def test_lora_resume_with_ema_and_retention(tmp_path, unet_and_params):
    unet, params = unet_and_params
    ds = _dataset()
    cfg = training.TrainConfig(learning_rate=5e-3, weight_decay=0.0,
                               ema_decay=0.5)
    key = jax.random.PRNGKey(3)
    want, _ = training.train_lora(unet, params, ds, cfg, rank=2, steps=5,
                                  batch_size=2, key=key, log_every=1)

    cdir = str(tmp_path / 'lora_ckpt')
    training.train_lora(unet, params, ds, cfg, rank=2, steps=2,
                        batch_size=2, key=key, log_every=1,
                        checkpoint_dir=cdir, checkpoint_every=1)
    got, _ = training.train_lora(unet, params, ds, cfg, rank=2, steps=5,
                                 batch_size=2, key=key, log_every=1,
                                 checkpoint_dir=cdir, checkpoint_every=1)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Retention: checkpoint_every=1 over 5 steps, but only the newest 3
    # survive (TrainCheckpointer keep=3).
    ck = training.TrainCheckpointer(cdir)
    try:
        assert ck.latest_step() == 5
        assert len(ck.mgr.all_steps()) <= 3
    finally:
        ck.close()


def test_resume_config_mismatch_raises(tmp_path, unet_and_params):
    unet, params = unet_and_params
    ds = _dataset()
    cfg = training.TrainConfig(learning_rate=5e-3, weight_decay=0.0)
    cdir = str(tmp_path / 'mismatch')
    training.train_lora(unet, params, ds, cfg, rank=2, steps=1,
                        batch_size=2, key=jax.random.PRNGKey(0),
                        checkpoint_dir=cdir)
    with pytest.raises(RuntimeError, match='does not match'):
        training.train_lora(unet, params, ds, cfg, rank=4, steps=2,
                            batch_size=2, key=jax.random.PRNGKey(0),
                            checkpoint_dir=cdir)


def test_completed_run_restores_without_stepping(tmp_path, unet_and_params):
    """Re-invoking with steps == saved next_step returns the trained tree
    without running any step (idempotent restart)."""
    unet, params = unet_and_params
    ds = _dataset()
    cfg = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                               donate=False)
    cdir = str(tmp_path / 'done')
    want, _ = training.train_full(unet, params, ds, cfg, steps=2,
                                  batch_size=2, key=jax.random.PRNGKey(1),
                                  log_every=1, checkpoint_dir=cdir)
    got, _ = training.train_full(unet, params, ds, cfg, steps=2,
                                 batch_size=2, key=jax.random.PRNGKey(1),
                                 log_every=1, checkpoint_dir=cdir)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
