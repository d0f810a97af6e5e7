"""Native C++ BPE (flexdiffuse_tpu/native) vs the pure-Python merge loop.

The native path must be id-for-id identical to CLIPTokenizer's Python
implementation (which is itself HF-parity-tested) across ASCII, unicode,
merge-heavy and out-of-vocab inputs — the C++ code is an optimization, not
an alternative tokenization.
"""
import json
import random

import numpy as np
import pytest

from flexdiffuse_tpu.text.tokenizer import CLIPTokenizer, bytes_to_unicode


def _write_vocab(tmp_path, extra_merges):
    """A complete byte-level vocab (every byte symbol ± </w>) plus merges —
    any text tokenizes without unknowns, like the real CLIP vocab."""
    vocab = {}
    for ch in bytes_to_unicode().values():
        vocab[ch] = len(vocab)
        vocab[ch + '</w>'] = len(vocab)
    merges = ['#version: 0.2']
    for a, b in extra_merges:
        merges.append(f'{a} {b}')
        merged = a + b
        if merged not in vocab:
            vocab[merged] = len(vocab)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    (tmp_path / 'vocab.json').write_text(json.dumps(vocab))
    (tmp_path / 'merges.txt').write_text('\n'.join(merges))
    return str(tmp_path / 'vocab.json'), str(tmp_path / 'merges.txt')


MERGES = [('c', 'a'), ('ca', 't</w>'), ('s', 'a'), ('sa', 't</w>'),
          ('t', 'h'), ('th', 'e</w>'), ('i', 'n'), ('in', 'g</w>'),
          ('a', 'a'), ('aa', 'aa'), ('e', 'r</w>'), ('o', 'o'),
          ('d', 'e'), ('de', 'er</w>'), ('f', 'o'), ('fo', 'r')]


@pytest.fixture()
def tok_pair(tmp_path):
    v, m = _write_vocab(tmp_path, MERGES)
    native = CLIPTokenizer(v, m)
    if native._native is None:
        pytest.skip('native BPE unavailable (no g++?)')
    python = CLIPTokenizer(v, m)
    python._native = None
    return native, python


PROMPTS = [
    'a cat sat',
    'the deer in the forest, hq, trending on artstation',
    'aaa aaaa aaaaa aaaaaaaa',          # overlapping-merge stress
    'Déjà vu — naïve façade ☂ 日本語',   # multi-byte UTF-8
    "it's the cat's hat, isn't it",     # contraction pre-tokens
    'foo123!!! <tag> 100% #1',
    '',
    '   spaced     out   ',
]


def test_native_matches_python(tok_pair):
    native, python = tok_pair
    for p in PROMPTS:
        assert native.encode(p) == python.encode(p), p
    np.testing.assert_array_equal(native(PROMPTS[:4]), python(PROMPTS[:4]))


def test_native_matches_python_fuzz(tok_pair):
    native, python = tok_pair
    rng = random.Random(0)
    alphabet = 'abcdefot hrs,.!éø語'
    for _ in range(200):
        p = ''.join(rng.choice(alphabet)
                    for _ in range(rng.randrange(1, 60)))
        assert native.encode(p) == python.encode(p), repr(p)


def test_added_tokens_still_work(tok_pair):
    native, _ = tok_pair
    ids = native.add_tokens('<my-concept>', num_vectors=2)
    out = native.encode('a cat <my-concept> sat')
    for i in ids:
        assert i in out
    # surrounding text still encodes through the native path
    assert out[:len(native.encode('a cat'))] == native.encode('a cat')


def test_kill_switch(tmp_path, monkeypatch):
    monkeypatch.setenv('FLEXDIFFUSE_NATIVE', '0')
    v, m = _write_vocab(tmp_path, MERGES)
    tok = CLIPTokenizer(v, m)
    assert tok._native is None
    assert tok.encode('a cat sat')
