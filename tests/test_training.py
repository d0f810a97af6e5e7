"""Training subsystem (flexdiffuse_tpu/training): loss, full/LoRA steps,
DP-mesh gradient averaging, kohya export round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu import training
from flexdiffuse_tpu.models import TINY_UNET, UNet2DCondition

B, T, D = 4, 7, 32


@pytest.fixture(scope='module')
def unet_and_params():
    unet = UNet2DCondition(TINY_UNET)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                       jnp.zeros((1,)), jnp.zeros((1, T, D)))
    return unet, params


def _batch(key=0):
    rng = np.random.default_rng(key)
    lat = jnp.asarray(rng.normal(size=(B, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    return lat, ctx


def test_loss_matches_hand_formula():
    """diffusion_loss against a numpy transcription with a linear stub
    model (pred = 0) — loss must equal mean ||target||²."""
    cfg = training.TrainConfig()
    acp = jnp.linspace(0.99, 0.01, cfg.num_train_timesteps)
    lat, ctx = _batch()
    key = jax.random.PRNGKey(3)

    def zero_apply(params, noisy, t, context):
        return jnp.zeros_like(noisy)

    loss = training.diffusion_loss(zero_apply, {}, lat, ctx, key, acp, cfg)
    # Reproduce the sampled noise exactly.
    k_t, k_n = jax.random.split(key)
    noise = jax.random.normal(k_n, lat.shape, jnp.float32)
    want = float(jnp.mean(jnp.square(noise)))
    assert abs(float(loss) - want) < 1e-6


def test_v_prediction_target():
    cfg = training.TrainConfig(prediction_type='v_prediction')
    acp = jnp.linspace(0.99, 0.01, cfg.num_train_timesteps)
    lat, ctx = _batch()
    key = jax.random.PRNGKey(4)

    def zero_apply(params, noisy, t, context):
        return jnp.zeros_like(noisy)

    loss = training.diffusion_loss(zero_apply, {}, lat, ctx, key, acp, cfg)
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (B,), 0, cfg.num_train_timesteps)
    noise = jax.random.normal(k_n, lat.shape, jnp.float32)
    ap = acp[t][:, None, None, None]
    v = jnp.sqrt(ap) * noise - jnp.sqrt(1.0 - ap) * lat
    want = float(jnp.mean(jnp.square(v)))
    assert abs(float(loss) - want) < 1e-5


def test_full_training_reduces_loss(unet_and_params):
    unet, params = unet_and_params
    cfg = training.TrainConfig(learning_rate=3e-4, weight_decay=0.0,
                               donate=False)
    step, tx = training.make_train_step(unet, cfg)
    opt_state = tx.init(params)
    lat, ctx = _batch()
    first = None
    loss = None
    p = params
    for i in range(25):
        # Fixed key: overfit one (batch, timestep, noise) draw — the loss
        # must drop monotonically-ish.
        p, opt_state, loss = step(p, opt_state, lat, ctx,
                                  jax.random.PRNGKey(7))
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first, (first, float(loss))


def test_lora_init_and_exact_noop(unet_and_params):
    unet, params = unet_and_params
    factors = training.init_lora(params, rank=4)
    assert factors  # attention + ff targets found
    for f in factors.values():
        assert f['down'].shape[0] == 4 and f['up'].shape[1] == 4
        np.testing.assert_array_equal(np.asarray(f['up']), 0.0)
    merged = training.merge_lora_params(params, factors)
    # up == 0 → merge is an exact no-op.
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lora_training_reduces_loss_and_preserves_base(unet_and_params):
    unet, params = unet_and_params
    cfg = training.TrainConfig(learning_rate=1e-2, weight_decay=0.0,
                               donate=False)
    factors = training.init_lora(params, rank=4)
    step, tx = training.make_lora_train_step(unet, params, cfg)
    opt_state = tx.init(factors)
    lat, ctx = _batch(1)
    first = loss = None
    f = factors
    for i in range(25):
        f, opt_state, loss = step(f, opt_state, lat, ctx,
                                  jax.random.PRNGKey(9))
        if first is None:
            first = float(loss)
    assert float(loss) < 0.8 * first, (first, float(loss))
    # Factors moved; base tree untouched by construction (closed over).
    moved = any(
        float(jnp.abs(f[k]['up']).max()) > 0 for k in f)
    assert moved


def test_lora_export_roundtrip(unet_and_params, tmp_path):
    """Trained factors → kohya safetensors → weights.lora.apply_lora gives
    the same kernels as merge_lora_params."""
    from safetensors.numpy import load_file

    from flexdiffuse_tpu.weights import lora as wlora
    unet, params = unet_and_params
    factors = training.init_lora(params, rank=4)
    # Give 'up' nonzero values so the merge does something.
    factors = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.arange(x.size, dtype=np.float32).reshape(
            x.shape) / x.size, factors)
    path = str(tmp_path / 'trained.safetensors')
    n = training.export_lora_safetensors(factors, path)
    assert n == len(factors)
    sd = load_file(path)
    merged_via_loader, _ = wlora.apply_lora(params, None, sd, scale=1.0)
    merged_direct = training.merge_lora_params(params, factors)
    for a, b in zip(jax.tree_util.tree_leaves(merged_via_loader),
                    jax.tree_util.tree_leaves(merged_direct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize('mode', ['full', 'dots'])
def test_remat_matches_no_remat(unet_and_params, mode):
    """Rematerialization changes memory, not math: one step with remat
    produces the same params as without."""
    unet, params = unet_and_params
    lat, ctx = _batch(2)
    key = jax.random.PRNGKey(13)
    outs = []
    for remat in ('none', mode):
        cfg = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                                   remat=remat, donate=False)
        step, tx = training.make_train_step(unet, cfg)
        p, _, loss = step(params, tx.init(params), lat, ctx, key)
        outs.append((p, float(loss)))
    assert outs[0][1] == outs[1][1]
    # Remat changes fusion groupings, which perturbs isolated grad
    # elements at float-epsilon scale (Adam's rescaling amplifies to a few
    # e-5 on the updated params); the loss itself is bit-equal.
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]),
                    jax.tree_util.tree_leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)


def test_grad_accum_matches_single_step(unet_and_params):
    """k identical micro-batches through MultiSteps(k) == one plain step
    on that batch (grads average to the same value)."""
    unet, params = unet_and_params
    lat, ctx = _batch(3)
    key = jax.random.PRNGKey(17)

    plain = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                                 donate=False)
    step1, tx1 = training.make_train_step(unet, plain)
    p_ref, _, _ = step1(params, tx1.init(params), lat, ctx, key)

    acc = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                               grad_accum=2, donate=False)
    step2, tx2 = training.make_train_step(unet, acc)
    o = tx2.init(params)
    p, o, _ = step2(params, o, lat, ctx, key)
    # After the first micro-step params must be UNCHANGED (accumulating).
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    p, o, _ = step2(p, o, lat, ctx, key)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-6)


def test_ema_update_formula():
    ema = {'k': jnp.ones((3,), jnp.float32)}
    cur = {'k': jnp.full((3,), 2.0, jnp.float32)}
    out = training.train.ema_update(ema, cur, 0.9)
    np.testing.assert_allclose(np.asarray(out['k']), 1.1, rtol=1e-6)


def test_dp_mesh_step_matches_single_device(unet_and_params):
    """The sharded train step over an 8-way data mesh produces the same
    update as the unsharded step (global-mean loss → averaged grads)."""
    if len(jax.devices()) < 8:
        pytest.skip('needs the 8-device CPU mesh')
    from flexdiffuse_tpu.parallel.mesh import make_mesh, shard_batch
    unet, params = unet_and_params
    cfg = training.TrainConfig(learning_rate=1e-3, weight_decay=0.0,
                               donate=False)
    mesh = make_mesh(jax.devices()[:8], model_parallel=1)
    rng = np.random.default_rng(11)
    lat = jnp.asarray(rng.normal(size=(8, 8, 8, 4)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(8, T, D)).astype(np.float32))
    key = jax.random.PRNGKey(5)

    step1, tx1 = training.make_train_step(unet, cfg)
    o1 = tx1.init(params)
    p1, _, l1 = step1(params, o1, lat, ctx, key)

    stepm, txm = training.make_train_step(unet, cfg, mesh=mesh)
    om = txm.init(params)
    pm, _, lm = stepm(params, om, shard_batch(lat, mesh),
                      shard_batch(ctx, mesh), key)
    assert abs(float(l1) - float(lm)) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pm)):
        # Cross-device reduction order perturbs grads at ~1e-7; Adam's
        # rescaling amplifies that to a few e-5 on the updated params.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)
