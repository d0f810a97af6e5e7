"""Prompt-emphasis parser unit tests (text/emphasis.py).

Beyond-reference feature: A1111 attention syntax. Pure-Python parser —
no JAX involvement here; weighted *encoding* is covered in
test_tokenizer_and_runner.py against the tiny text tower.
"""
import math

from flexdiffuse_tpu.text.emphasis import (ATTENTION_MULT, parse,
                                           tokenize_weighted)
from flexdiffuse_tpu.text.tokenizer import FakeTokenizer


def test_plain_text_single_fragment():
    assert parse('a photo of a cat') == [('a photo of a cat', 1.0)]


def test_round_brackets_multiply():
    assert parse('(cat)') == [('cat', ATTENTION_MULT)]
    frags = parse('((cat))')
    assert len(frags) == 1
    assert math.isclose(frags[0][1], ATTENTION_MULT**2)


def test_square_brackets_attenuate():
    frags = parse('[cat]')
    assert math.isclose(frags[0][1], 1 / ATTENTION_MULT)


def test_explicit_weight():
    assert parse('(cat:1.3)') == [('cat', 1.3)]
    assert parse('(cat:0.5)') == [('cat', 0.5)]


def test_mixed_fragments_in_order():
    frags = parse('a (cat:2) dog')
    assert frags == [('a ', 1.0), ('cat', 2.0), (' dog', 1.0)]


def test_nested_explicit_weights_compound():
    frags = parse('(a (b:2):3)')
    assert frags == [('a ', 3.0), ('b', 6.0)]


def test_escapes_are_literal():
    assert parse(r'\(literal\)') == [('(literal)', 1.0)]
    assert parse(r'50\\50') == [('50\\50', 1.0)]


def test_unbalanced_closers_are_literal():
    assert parse('cat)') == [('cat)', 1.0)]
    assert parse('cat]') == [('cat]', 1.0)]


def test_unclosed_opener_applies_to_tail():
    frags = parse('a (cat dog')
    assert frags == [('a ', 1.0), ('cat dog', ATTENTION_MULT)]


def test_colon_in_plain_text_is_literal():
    assert parse('ratio 16:9') == [('ratio 16:9', 1.0)]


def test_break_splits_fragments():
    frags = parse('a cat BREAK a dog')
    assert ('BREAK', None) in frags
    texts = [f for f, w in frags if w is not None]
    assert texts == ['a cat ', ' a dog']


def test_break_must_be_whole_word():
    assert parse('unBREAKable') == [('unBREAKable', 1.0)]


def test_adjacent_same_weight_fragments_merge():
    # "(red)ish" must not split the word across a tokenizer call when the
    # weights are equal after parsing.
    assert parse('a (cat) (dog)') == [('a ', 1.0),
                                      ('cat', ATTENTION_MULT),
                                      (' ', 1.0),
                                      ('dog', ATTENTION_MULT)]
    assert parse('plain stays whole') == [('plain stays whole', 1.0)]


def test_tokenize_weighted_parallel_arrays():
    tk = FakeTokenizer()
    ids, weights, breaks = tokenize_weighted(tk, 'a (cat:2) dog')
    assert len(ids) == len(weights) == 3
    assert weights == [1.0, 2.0, 1.0]
    assert ids == tk.encode('a cat dog')
    assert breaks == set()


def test_tokenize_weighted_break_positions():
    tk = FakeTokenizer()
    ids, weights, breaks = tokenize_weighted(tk, 'a cat BREAK a dog')
    assert len(ids) == 4
    assert breaks == {2}       # first token after the BREAK
