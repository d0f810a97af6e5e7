"""Numpy oracle of the reference guidance algorithm (sequential semantics).

A from-scratch, step-by-step reimplementation of the algorithm described by
``/root/reference/guidance.py`` used *only* as a test fixture: the framework's
vectorized JAX code must reproduce these numbers (SURVEY.md §4 golden-fixture
strategy). Deliberately written in the reference's sequential style so that
any vectorization mistake in the framework shows up as a mismatch here.

Known reference quirks intentionally reproduced:
* softmax over all 77 tokens (header included) before the header column drop;
* the one-row shift: row ``t`` of the mapping carries token ``t+1``'s
  similarity but is applied to token ``t``;
* guarded division in the clustered traversal (the reference would crash on
  adjacent peaks; the oracle skips the zero-length traversal instead, matching
  the framework's closed form).
"""
import math
from itertools import pairwise

import numpy as np

ORDER_TEXT, ORDER_ALIGN, ORDER_DIRECT = 0, 1, 2


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def map_emb(alt, txt, reuse=True, order=ORDER_ALIGN):
    altft = alt / np.linalg.norm(alt, axis=-1, keepdims=True)
    txtft = txt / np.linalg.norm(txt, axis=-1, keepdims=True)
    t = txt.shape[0]
    all_matches = []
    for i in range(alt.shape[0]):
        sim = softmax(100.0 * (altft[i:i + 1] @ txtft.T))
        for ii, v in enumerate(sim[0, 1:]):
            all_matches.append((i, ii, float(v)))
    mapped = np.zeros((t, 2))
    if order == ORDER_TEXT:
        all_matches.sort(key=lambda m: (m[1], -m[2], m[0]))
    elif order == ORDER_DIRECT:
        all_matches.sort(key=lambda m: (m[1], m[0]))
        for ai, ti, s in all_matches:
            if ai == ti:
                mapped[ti] = (ai, s)
        return mapped
    else:
        all_matches.sort(key=lambda m: (-m[2], m[1], m[0]))
    used = set()
    for ai, ti, s in all_matches:
        if mapped[ti, 1] > 0 or ai in used:
            continue
        mapped[ti] = (ai, s)
        if not reuse:
            used.add(ai)
    return mapped


def traverse_a_to_b(al, bl, weights, slope):
    bi = 0

    def left(a, b):
        d = a - b
        g = slope / d
        for i in range(1, d):
            weights[a - i] -= g * i

    def right(a, b):
        d = b - a
        if d == 0:  # guard: reference divides by zero here
            return
        g = slope / d
        for i in range(1, d + 1):
            weights[a + i] -= g * i

    if bl[0] == 0:
        weights[0] -= slope
    for a in al:
        b = bl[bi]
        if b < a:
            left(a, b)
            bi += 1
        if bi >= len(bl):
            break
        b = bl[bi]
        right(a, b)
    return weights


def clustered_guidance(mapped, threshold, guidance):
    n = mapped.shape[0]
    peaks = []
    for ti in range(1, n - 1):
        s = mapped[ti, 1]
        if s < threshold:
            continue
        if mapped[ti - 1, 1] <= s >= mapped[ti + 1, 1]:
            peaks.append(ti)
    if not peaks:
        return None
    valleys = []
    if peaks[0] != 0:
        valleys.append(0)
    for p1, p2 in pairwise(peaks):
        d = p2 - p1
        if d > 0:
            valleys.append(p1 + math.ceil(d / 2))
    if peaks[-1] != n - 1:
        valleys.append(n - 1)
    return traverse_a_to_b(peaks, valleys, np.ones(n), 1.0) * guidance


def blend_weights(a, b):
    if a.max() >= 0:
        if b.max() >= 0:
            return np.maximum(a, b)
        return a + b
    return np.minimum(a, b)


def tween(base, alt, threshold=(0.5, 0.5), linear=(0.0, 0.5), clustered=0.5,
          max_guidance=0.5, header_max=0.15, mode=ORDER_ALIGN, reuse=True):
    mapped = map_emb(alt, base, reuse, mode)
    avg = mapped[:, 1].mean()
    w = np.linspace(linear[0], linear[1], base.shape[0])
    if clustered != 0:
        cw = clustered_guidance(mapped, avg, clustered)
        if cw is not None:
            w = blend_weights(w, cw)
    if threshold[1] != 0:
        th = np.ones_like(w) * threshold[1]
        th[mapped[:, 1] < threshold[0]] = 0
        w = blend_weights(w, th)
    if header_max < 1.0:
        hw = w[0]
        w[0] = min(hw, header_max) if hw >= 0 else max(hw, -header_max)
    out = np.zeros_like(base)
    for ti, (ai, s) in enumerate(mapped):
        sd = 1.0 - s
        iw = min(w[ti], max_guidance)
        if iw == 0:
            out[ti] = base[ti]
        elif abs(iw) >= sd:
            out[ti] = alt[int(ai)]
        else:
            out[ti] = base[ti] + (alt[int(ai)] - base[ti]) * iw
    return out


def concept_map(guide_emb, concept_emb, base_emb, out_emb):
    """Two-hop concept mapping (reference ConceptMapper semantics)."""
    concept_mappings = map_emb(guide_emb, concept_emb, False, ORDER_TEXT)
    concept_text = map_emb(concept_emb, base_emb, True, ORDER_ALIGN)
    out = out_emb.copy()
    for row, (ci, s) in enumerate(concept_text):
        ti = row + 1  # enumerate(..., 1) shift
        cmi = int(ci) - 1
        if cmi < 0:
            continue
        img_i = int(concept_mappings[cmi, 0])
        if s > 0.9 and ti < out.shape[0]:
            out[ti] = guide_emb[img_i]
    return out
