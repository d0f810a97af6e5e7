"""Golden tests: vectorized JAX guidance core vs. the sequential numpy oracle."""
import numpy as np
import pytest

from flexdiffuse_tpu.config import (GUIDE_ORDER_ALIGN, GUIDE_ORDER_DIRECT,
                                    GUIDE_ORDER_TEXT, GuidanceParams)
from flexdiffuse_tpu.guidance import (ConceptMapper, Guide, Tweener,
                                      blend_weights, clustered_weights,
                                      map_embeddings)

from tests import reference_oracle as oracle

T, D = 77, 64


def _embs(seed, a=33, t=T, d=D):
    rng = np.random.default_rng(seed)
    alt = rng.normal(size=(a, d)).astype(np.float32)
    txt = rng.normal(size=(t, d)).astype(np.float32)
    return alt, txt


@pytest.mark.parametrize('reuse', [True, False])
@pytest.mark.parametrize('mode',
                         [GUIDE_ORDER_TEXT, GUIDE_ORDER_ALIGN,
                          GUIDE_ORDER_DIRECT])
@pytest.mark.parametrize('a', [33, 120])
def test_map_embeddings_matches_oracle(reuse, mode, a):
    alt, txt = _embs(seed=42 + a, a=a)
    idx, sim = map_embeddings(alt, txt, reuse=reuse, mode=mode)
    expected = oracle.map_emb(alt, txt, reuse=reuse, order=mode)
    np.testing.assert_array_equal(np.asarray(idx), expected[:, 0].astype(int))
    np.testing.assert_allclose(np.asarray(sim), expected[:, 1], atol=1e-5)


def test_map_no_reuse_exhausts_alt_tokens():
    # Fewer alt embeddings than text tokens: only `a` tokens can be matched.
    alt, txt = _embs(seed=7, a=10)
    idx, sim = map_embeddings(alt, txt, reuse=False, mode=GUIDE_ORDER_ALIGN)
    assert int((np.asarray(sim) > 0).sum()) == 10
    expected = oracle.map_emb(alt, txt, reuse=False, order=GUIDE_ORDER_ALIGN)
    np.testing.assert_array_equal(np.asarray(idx), expected[:, 0].astype(int))


def test_last_row_always_unmatched():
    alt, txt = _embs(seed=3)
    for mode in (GUIDE_ORDER_TEXT, GUIDE_ORDER_ALIGN, GUIDE_ORDER_DIRECT):
        idx, sim = map_embeddings(alt, txt, mode=mode)
        assert int(idx[-1]) == 0 and float(sim[-1]) == 0.0


@pytest.mark.parametrize('seed', range(6))
def test_clustered_weights_match_oracle(seed):
    rng = np.random.default_rng(seed)
    sims = (rng.uniform(0, 1, size=T)**2).astype(np.float32)
    thr = float(sims.mean())
    mapped = np.stack([np.zeros(T), sims], axis=1)
    expected = oracle.clustered_guidance(mapped, thr, 0.7)
    got, has_peaks = clustered_weights(sims, thr, 0.7)
    if expected is None:
        assert not bool(has_peaks)
    else:
        assert bool(has_peaks)
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


def test_clustered_weights_adjacent_peaks_no_crash():
    # Runs of equal similarity create adjacent peaks — the reference would
    # divide by zero (guidance.py:110-114); we take the limit value instead.
    sims = np.zeros(T, np.float32)
    sims[10] = sims[11] = 0.9
    w, has_peaks = clustered_weights(sims, 0.5, 1.0)
    assert bool(has_peaks)
    assert np.isfinite(np.asarray(w)).all()


@pytest.mark.parametrize('case', [
    (np.array([0.1, 0.5, -0.2]), np.array([0.3, 0.2, 0.4])),   # both pos-max
    (np.array([0.1, 0.5, -0.2]), np.array([-0.3, -0.2, -0.4])), # fight
    (np.array([-0.1, -0.5, -0.2]), np.array([0.3, 0.2, 0.4])),  # a negative
    (np.array([-0.1, -0.5, -0.2]), np.array([-0.3, -0.2, -0.4])),
])
def test_blend_weights_matches_oracle(case):
    a, b = (c.astype(np.float32) for c in case)
    np.testing.assert_allclose(np.asarray(blend_weights(a, b)),
                               oracle.blend_weights(a, b), atol=1e-6)


@pytest.mark.parametrize('mode,reuse', [(GUIDE_ORDER_ALIGN, True),
                                        (GUIDE_ORDER_ALIGN, False),
                                        (GUIDE_ORDER_TEXT, False),
                                        (GUIDE_ORDER_DIRECT, True)])
def test_tween_matches_oracle(mode, reuse):
    alt, txt = _embs(seed=11)
    params = GuidanceParams(threshold_mult=0.25, threshold_floor=0.75,
                            clustered=0.15, linear=(0.1, 0.5),
                            max_guidance=0.35, header_max=0.0, mode=mode,
                            reuse=reuse)
    got = Tweener(params).tween(txt, alt)
    expected = oracle.tween(txt, alt, threshold=(0.75, 0.25),
                            linear=(0.1, 0.5), clustered=0.15,
                            max_guidance=0.35, header_max=0.0, mode=mode,
                            reuse=reuse)
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-4)


def test_tween_zero_params_identity():
    # All-zero guidance leaves the prompt embeddings untouched.
    alt, txt = _embs(seed=13)
    params = GuidanceParams(threshold_mult=0.0, threshold_floor=0.0,
                            clustered=0.0, linear=(0.0, 0.0),
                            max_guidance=1.0, header_max=0.0)
    got = Tweener(params).tween(txt, alt)
    np.testing.assert_allclose(np.asarray(got), txt, atol=1e-6)


def test_tween_batched_layout():
    alt, txt = _embs(seed=17)
    out3 = Tweener().tween(txt[None], alt[None])
    out2 = Tweener().tween(txt, alt)
    assert out3.shape == (1, T, D)
    np.testing.assert_allclose(np.asarray(out3[0]), np.asarray(out2),
                               atol=1e-6)


def test_concept_mapper_matches_oracle():
    rng = np.random.default_rng(23)
    guide = rng.normal(size=(40, D)).astype(np.float32)
    concept = rng.normal(size=(T, D)).astype(np.float32)
    base = rng.normal(size=(T, D)).astype(np.float32)
    # Plant strong matches so the >0.9 overwrite path fires.
    concept[5] = base[9] * 1.01
    mapper = ConceptMapper(guide, concept)
    got = mapper.map(base)
    expected = oracle.concept_map(guide, concept, base, base)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


class FakeEncoder:
    """Deterministic stand-in for CLIPEncoder."""

    def __init__(self, d=D):
        self.d = d

    def prompt(self, prompt):
        prompts = [prompt] if isinstance(prompt, str) else prompt
        rows = []
        for p in prompts:
            rng = np.random.default_rng(abs(hash(p)) % (2**32))
            rows.append(rng.normal(size=(T, self.d)).astype(np.float32))
        import jax.numpy as jnp
        return jnp.asarray(np.stack(rows))

    def image(self, image):
        import jax.numpy as jnp
        rng = np.random.default_rng(99)
        return jnp.asarray(rng.normal(size=(1, 257,
                                            self.d)).astype(np.float32))


def test_guide_requires_prompt_or_guide():
    g = Guide(FakeEncoder())
    with pytest.raises(ValueError):
        g.embeds(prompt='', guide=None)
    with pytest.raises(ValueError):
        g.embeds(prompt=42)  # type: ignore[arg-type]


def test_guide_text_only_passthrough():
    g = Guide(FakeEncoder())
    out = g.embeds(prompt='a deer in the woods')
    assert out.shape == (1, T, D)


def test_guide_image_blend_and_batch():
    g = Guide(FakeEncoder())
    one = g.embeds(prompt='a deer', guide=object())
    assert one.shape == (1, T, D)
    batch = g.embeds(prompt=['a deer', 'a turtle'], guide=object())
    assert batch.shape == (2, T, D)
    # First batch row must equal the solo tween of the same prompt.
    np.testing.assert_allclose(np.asarray(batch[0]), np.asarray(one[0]),
                               atol=1e-6)


def test_guide_pure_image_header_pull():
    g = Guide(FakeEncoder())
    out = g.embeds(prompt='', guide=object())
    assert out.shape == (1, T, D)
    enc = FakeEncoder()
    img = np.asarray(enc.image(None))[:, :T]
    placeholder = np.asarray(enc.prompt('{}'))
    expect_header = img[:, 0] + (placeholder[:, 0] - img[:, 0]) * 0.85
    np.testing.assert_allclose(np.asarray(out[:, 0]), expect_header, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 1:]), img[:, 1:], atol=1e-6)
