"""ToMe token merging (ops/tome.py + models/unet.py integration).

Merging is an approximation (no bit-parity target vs the exact UNet); the
invariants tested are the ones that ARE exact: plan validity, r=0 identity,
merge/unmerge round-trips, row-major ≡ channel-major, and the product
plumbing (Runner.enable_tome recompile toggle, SP incompatibility).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexdiffuse_tpu.ops import tome


def _x(b=2, h=8, w=8, c=16, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, h * w, c),
                             jnp.float32)


# ---------------------------------------------------------------------------
# ops


def test_bipartite_split_partition():
    dst, src = tome.bipartite_split(6, 10)
    ids = np.concatenate([np.asarray(dst), np.asarray(src)])
    assert sorted(ids.tolist()) == list(range(60))
    assert dst.shape[0] == 3 * 5  # top-left of each 2x2 window


def test_resolve_r_multiple_and_cap():
    for (hh, ww, ratio, mult) in [(64, 64, 0.5, 128), (96, 96, 0.3, 128),
                                  (8, 8, 0.9, 1)]:
        r = tome.resolve_r(hh, ww, ratio, mult)
        s = hh * ww
        sd = ((hh + 1) // 2) * ((ww + 1) // 2)
        assert 0 <= r <= s - sd          # never merges a dst token
        assert (s - r) % mult == 0       # reduced length stays block-sized


def test_r0_identity_roundtrip():
    x = _x()
    plan = tome.merge_plan(x, (8, 8), r=0)
    out = tome.unmerge(tome.merge(x, plan), plan)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_merge_shapes_and_unmerge_semantics():
    x = _x()
    plan = tome.merge_plan(x, (8, 8), r=12)
    m = tome.merge(x, plan)
    assert m.shape == (2, plan.merged_len, 16)
    assert plan.merged_len == 64 - 12
    u = tome.unmerge(m, plan)
    assert u.shape == x.shape
    # Every merged src token carries its assigned dst's output.
    sd = plan.dst_idx.shape[0]
    un = np.asarray(u)
    mn = np.asarray(m)
    src_idx = np.asarray(plan.src_idx)
    for bi in range(2):
        for k in range(plan.r):
            tok = src_idx[int(plan.merged_pos[bi, k])]
            dst_slot = int(plan.assign[bi, k])
            np.testing.assert_array_equal(un[bi, tok], mn[bi, dst_slot])
    # Dst slots average their own token with the merged-in srcs.
    assert sd == 16
    np.testing.assert_allclose(
        un[:, np.asarray(plan.dst_idx)], mn[:, :sd], rtol=1e-6)


def test_merge_dst_mean():
    # One src merged into one dst: the dst output must be their mean.
    x = _x(b=1)
    plan = tome.merge_plan(x, (8, 8), r=1)
    m = np.asarray(tome.merge(x, plan))
    src_tok = int(np.asarray(plan.src_idx)[int(plan.merged_pos[0, 0])])
    dst_slot = int(plan.assign[0, 0])
    dst_tok = int(np.asarray(plan.dst_idx)[dst_slot])
    want = (np.asarray(x)[0, src_tok] + np.asarray(x)[0, dst_tok]) / 2
    np.testing.assert_allclose(m[0, dst_slot], want, rtol=1e-6)


def test_channel_major_equivalence():
    b, h, w, c = 2, 8, 8, 16
    x = _x(b, h, w, c)
    plan = tome.merge_plan(x, (h, w), r=12)
    xc = x.transpose(2, 0, 1).reshape(c, b * h * w)
    mc = tome.merge_cm(xc, plan, b)
    m = tome.merge(x, plan)
    np.testing.assert_allclose(
        np.asarray(mc),
        np.asarray(m.transpose(2, 0, 1).reshape(c, b * plan.merged_len)),
        rtol=1e-6)
    uc = tome.unmerge_cm(mc, plan, b)
    u = tome.unmerge(m, plan)
    np.testing.assert_allclose(
        np.asarray(uc),
        np.asarray(u.transpose(2, 0, 1).reshape(c, b * h * w)), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(tome.metric_from_cm(xc, b)), np.asarray(x))


# ---------------------------------------------------------------------------
# UNet integration


@pytest.fixture(scope='module')
def tiny_unet():
    from flexdiffuse_tpu.models import UNet2DCondition, TINY_UNET
    k = jax.random.PRNGKey(0)
    lat = jax.random.normal(k, (2, 16, 16, 4))
    t = jnp.zeros((2,))
    ctx = jax.random.normal(k, (2, 77, 32))
    base = UNet2DCondition(TINY_UNET)
    params = base.init(k, lat, t, ctx)
    return base, params, (lat, t, ctx)


def test_unet_tome_r0_is_exact(tiny_unet):
    base, params, args = tiny_unet
    # ratio small enough that resolve_r rounds to 0 → bit-identical.
    t0 = base.clone(tome=(0.001, 256))
    np.testing.assert_array_equal(np.asarray(base.apply(params, *args)),
                                  np.asarray(t0.apply(params, *args)))


def test_unet_tome_engages_and_layouts_match(tiny_unet):
    base, params, args = tiny_unet
    e0 = np.asarray(base.apply(params, *args))
    row = base.clone(tome=(0.5, 256), channel_major=False)
    cm = base.clone(tome=(0.5, 256), channel_major=True)
    er = np.asarray(row.apply(params, *args))
    ec = np.asarray(cm.apply(params, *args))
    assert np.isfinite(er).all()
    assert np.abs(er - e0).max() > 1e-6   # it actually merged something
    np.testing.assert_allclose(ec, er, atol=1e-5)  # fp32 layout parity


def test_unet_tome_min_seq_gates(tiny_unet):
    base, params, args = tiny_unet
    # min_seq above every grid in the tiny UNet (16x16=256) → identity.
    off = base.clone(tome=(0.5, 512))
    np.testing.assert_array_equal(np.asarray(base.apply(params, *args)),
                                  np.asarray(off.apply(params, *args)))


# ---------------------------------------------------------------------------
# product plumbing


@pytest.fixture()
def tiny_runner_factory(tmp_path):
    from flexdiffuse_tpu.models import (AutoencoderKL, CLIPTextModel,
                                        CLIPVisionModel, TINY_TEXT,
                                        TINY_UNET, TINY_VAE, TINY_VISION,
                                        UNet2DCondition)
    from flexdiffuse_tpu.runner import Runner
    from flexdiffuse_tpu.config import RunConfig
    from flexdiffuse_tpu.text.tokenizer import FakeTokenizer

    def make():
        k = jax.random.PRNGKey(0)
        text = CLIPTextModel(TINY_TEXT)
        text_params = text.init(k, jnp.zeros((1, 77), jnp.int32))
        vision = CLIPVisionModel(TINY_VISION)
        vision_params = vision.init(k, jnp.zeros((1, 32, 32, 3)))
        unet = UNet2DCondition(TINY_UNET)
        unet_params = unet.init(k, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                                jnp.zeros((1, 77, TINY_TEXT.hidden_size)))
        vae = AutoencoderKL(TINY_VAE)
        vae_params = vae.init(k, jnp.zeros((1, 16, 16, 3)), k)
        return Runner.from_models(
            text, text_params, vision, vision_params, unet, unet_params,
            vae, vae_params, FakeTokenizer(),
            config=RunConfig(output_dir=str(tmp_path)))

    return make


def test_runner_enable_tome(tiny_runner_factory):
    r = tiny_runner_factory()
    imgs0, _ = r.gen(prompt='a deer', steps=2, init_size=(64, 64),
                     samples=1, seed=7)
    r.enable_tome(0.5, min_seq=16)   # engage at the tiny 8x8 latent grid
    assert r.pipe.unet.tome == (0.5, 16)
    imgs1, _ = r.gen(prompt='a deer', steps=2, init_size=(64, 64),
                     samples=1, seed=7)
    assert imgs1[0].size == imgs0[0].size
    r.disable_tome()
    assert r.pipe.unet.tome is None
    imgs2, _ = r.gen(prompt='a deer', steps=2, init_size=(64, 64),
                     samples=1, seed=7)
    np.testing.assert_array_equal(np.asarray(imgs0[0]), np.asarray(imgs2[0]))


def test_tome_rejects_bad_ratio(tiny_runner_factory):
    r = tiny_runner_factory()
    with pytest.raises(ValueError):
        r.enable_tome(0.0)
    with pytest.raises(ValueError):
        r.enable_tome(1.0)


def test_tome_incompatible_with_sp(tiny_runner_factory):
    from flexdiffuse_tpu.pipeline.flex import FlexPipeline
    r = tiny_runner_factory()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ('seq',))
    p = r.pipe
    with pytest.raises(ValueError, match='sequence parallelism'):
        FlexPipeline(p.unet.clone(tome=(0.5, 4096)), p.unet_params,
                     p.vae, p.vae_params, sp_mesh=mesh)
