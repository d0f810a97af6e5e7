"""Native C++ BPE vs pure-Python merge loop throughput.

Builds a full byte-level vocab with a few thousand synthetic merges (the
real CLIP vocab is not available offline; merge-loop cost depends on merge
count and word length, both matched here), then times ``encode`` on a
prompt corpus with the word cache cleared between runs (serving sees mostly
novel words) and with it warm (repeated prompts).

Run: ``python tools/bench_tokenizer.py``
"""
from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, '/root/repo')

from flexdiffuse_tpu.text.tokenizer import CLIPTokenizer, bytes_to_unicode


def build_vocab(tmp: str, n_merges: int = 4000):
    rng = random.Random(0)
    vocab = {}
    for ch in bytes_to_unicode().values():
        vocab[ch] = len(vocab)
        vocab[ch + '</w>'] = len(vocab)
    letters = 'abcdefghijklmnopqrstuvwxyz'
    merges = ['#version: 0.2']
    seen = set()
    pieces = [c for c in letters] + [c + '</w>' for c in letters]
    for _ in range(n_merges):
        a = rng.choice([p for p in pieces if not p.endswith('</w>')])
        b = rng.choice(pieces)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        merges.append(f'{a} {b}')
        merged = a + b
        if merged not in vocab:
            vocab[merged] = len(vocab)
        if not merged.endswith('</w>'):
            pieces.append(merged)
    vocab['<|startoftext|>'] = len(vocab)
    vocab['<|endoftext|>'] = len(vocab)
    vp, mp = os.path.join(tmp, 'vocab.json'), os.path.join(tmp, 'merges.txt')
    with open(vp, 'w') as f:
        json.dump(vocab, f)
    with open(mp, 'w') as f:
        f.write('\n'.join(merges))
    return vp, mp


def corpus(n: int = 2000) -> list:
    rng = random.Random(1)
    words = []
    letters = 'abcdefghijklmnopqrstuvwxyz'
    for _ in range(400):
        words.append(''.join(rng.choice(letters)
                             for _ in range(rng.randrange(2, 12))))
    return [' '.join(rng.choice(words)
                     for _ in range(rng.randrange(5, 60)))
            for _ in range(n)]


def main() -> None:
    import tempfile
    tmp = tempfile.mkdtemp()
    vp, mp = build_vocab(tmp)
    prompts = corpus()

    def run(native: bool, cold: bool) -> float:
        tok = CLIPTokenizer(vp, mp)
        if not native:
            tok._native = None
        t0 = time.perf_counter()
        total = 0
        for p in prompts:
            if cold and native and tok._native is not None:
                pass  # cache lives in the handle; cold = fresh tokenizer
            total += len(tok.encode(p))
        dt = time.perf_counter() - t0
        return total / dt

    results = {}
    for label, native in (('python', False), ('native', True)):
        # cold: fresh tokenizer per run (empty word cache)
        results[label + '_cold_tok_per_s'] = round(run(native, True))
        # warm: second pass over the same corpus (cache hits)
        tok = CLIPTokenizer(vp, mp)
        if not native:
            tok._native = None
        for p in prompts:
            tok.encode(p)
        t0 = time.perf_counter()
        total = sum(len(tok.encode(p)) for p in prompts)
        results[label + '_warm_tok_per_s'] = round(
            total / (time.perf_counter() - t0))
    results['native_available'] = CLIPTokenizer(vp, mp)._native is not None
    results['speedup_cold'] = round(
        results['native_cold_tok_per_s'] /
        results['python_cold_tok_per_s'], 2)
    results['speedup_warm'] = round(
        results['native_warm_tok_per_s'] /
        results['python_warm_tok_per_s'], 2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
