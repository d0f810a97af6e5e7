"""Token↔embedding similarity mapping — vectorized TPU-native core.

Reimplements the semantics of the reference's ``_map_emb`` (guidance.py:23-85)
as pure JAX. The reference loops over every (alt, text) pair in Python
(~257×76 ≈ 19.5k iterations, flagged ``TODO-OPT`` at guidance.py:47); here the
whole similarity field is one ``[A, T]`` matmul + softmax on the MXU, and the
sequential "no-reuse" greedy assignment becomes a fixed-trip ``lax.fori_loop``
(≤76 iterations of masked argmax — loop-carried by necessity, but entirely
on-device and jit-compiled).

Reference-faithful quirks preserved (documented, golden-tested):

* The softmax over similarities runs across **all 77 text tokens including the
  header**, and only afterwards is the header column dropped
  (guidance.py:50-55).
* Row ``t`` of the returned mapping holds the match computed against text
  token ``t+1`` but is *applied* to token ``t`` by the tween
  (guidance.py:55,76-82 vs. guidance.py:259) — a systematic off-by-one the
  reference's published experiments were tuned with. We reproduce it exactly;
  row ``T-1`` is always unmatched ``(0, 0.0)``.
* With ``reuse=True`` the TEXT and ALIGN orders are equivalent (both reduce to
  a per-token argmax); they differ only when ``reuse=False``.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.config import (GUIDE_ORDER_ALIGN, GUIDE_ORDER_DIRECT,
                                    GUIDE_ORDER_TEXT)

Array = jax.Array


def similarity_matrix(alt_emb: Array, txt_emb: Array) -> Array:
    """``softmax(100·cosine(alt, txt))`` over the text axis.

    Args:
        alt_emb: ``[A, D]`` alternate (image-patch or text) embeddings.
        txt_emb: ``[T, D]`` text-token embeddings (T includes the header).

    Returns:
        ``[A, T]`` similarity field, each row softmaxed over all T tokens
        (header included — reference guidance.py:50).
    """
    alt_n = alt_emb / jnp.linalg.norm(alt_emb, axis=-1, keepdims=True)
    txt_n = txt_emb / jnp.linalg.norm(txt_emb, axis=-1, keepdims=True)
    # Full-precision dot: the similarity field feeds argmax/greedy matching,
    # where bf16 MXU error can flip matches. The matrix is tiny (≤257×77).
    logits = 100.0 * jnp.dot(alt_n, txt_n.T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    return jax.nn.softmax(logits, axis=-1)


def _map_reuse(sim: Array) -> Tuple[Array, Array]:
    """Per-token argmax — TEXT and ALIGN orders with ``reuse=True``."""
    a, t = sim.shape
    idx = jnp.argmax(sim, axis=0)                    # [T-1] smallest alt wins ties
    val = jnp.max(sim, axis=0)
    # Returned arrays are padded to T rows; the final row is never matched.
    idx = jnp.concatenate([idx, jnp.zeros((1,), idx.dtype)])
    val = jnp.concatenate([val, jnp.zeros((1,), val.dtype)])
    return idx, val


def _map_direct(sim: Array) -> Tuple[Array, Array]:
    """GUIDE_ORDER_DIRECT — identity pairing ``alt_i == txt_i`` (guidance.py:60-69)."""
    a, tm1 = sim.shape
    t = tm1 + 1
    rows = jnp.arange(t)
    in_range = rows < min(a, tm1)
    diag = jnp.diagonal(sim)                          # [min(A, T-1)]
    diag = jnp.pad(diag, (0, t - diag.shape[0]))
    idx = jnp.where(in_range, rows, 0)
    val = jnp.where(in_range, diag, 0.0)
    return idx, val


def _map_no_reuse_align(sim: Array) -> Tuple[Array, Array]:
    """Greedy globally-best assignment without alt reuse (ALIGN order).

    Equivalent to the reference's "sort all pairs by descending similarity and
    assign greedily" (guidance.py:70-85): repeatedly taking the global max of
    the unassigned mask yields the identical matching, including tie-breaks
    (argmax of the text-major flattened array prefers the smallest text index,
    then the smallest alt index — the reference's sort key ``(-s, txt, alt)``).
    """
    a, tm1 = sim.shape
    t = tm1 + 1
    steps = min(a, tm1)

    def body(_, carry):
        idx, val, s = carry
        flat = jnp.argmax(s.T)                        # text-major flattening
        txt_i, alt_i = flat // a, flat % a
        mval = s[alt_i, txt_i]
        ok = mval > 0.0                               # softmax outputs are > 0
        idx = jnp.where(ok, idx.at[txt_i].set(alt_i), idx)
        val = jnp.where(ok, val.at[txt_i].set(mval), val)
        # Retire the alt row and the text column.
        s = jnp.where(ok, s.at[alt_i, :].set(-1.0), s)
        s = jnp.where(ok, s.at[:, txt_i].set(-1.0), s)
        return idx, val, s

    idx0 = jnp.zeros((t,), jnp.int32)
    val0 = jnp.zeros((t,), sim.dtype)
    idx, val, _ = jax.lax.fori_loop(0, steps, body, (idx0, val0, sim))
    return idx, val


def _map_no_reuse_text(sim: Array) -> Tuple[Array, Array]:
    """Each text token, in order, claims its best unused alt (TEXT order,
    guidance.py:57-59 with ``alt_emb_reuse=False``)."""
    a, tm1 = sim.shape
    t = tm1 + 1

    def body(txt_i, carry):
        idx, val, used = carry
        col = jnp.where(used, -1.0, sim[:, txt_i])
        alt_i = jnp.argmax(col)
        mval = col[alt_i]
        ok = mval > 0.0
        idx = jnp.where(ok, idx.at[txt_i].set(alt_i), idx)
        val = jnp.where(ok, val.at[txt_i].set(mval), val)
        used = jnp.where(ok, used.at[alt_i].set(True), used)
        return idx, val, used

    idx0 = jnp.zeros((t,), jnp.int32)
    val0 = jnp.zeros((t,), sim.dtype)
    used0 = jnp.zeros((a,), bool)
    idx, val, _ = jax.lax.fori_loop(0, tm1, body, (idx0, val0, used0))
    return idx, val


@functools.partial(jax.jit, static_argnames=("reuse", "mode"))
def map_embeddings(alt_emb: Array,
                   txt_emb: Array,
                   reuse: bool = True,
                   mode: int = GUIDE_ORDER_ALIGN) -> Tuple[Array, Array]:
    """Map alt embeddings onto text tokens by cosine-similarity best fit.

    Args:
        alt_emb: ``[A, D]`` alternate embeddings (image patches or guide text).
        txt_emb: ``[T, D]`` prompt token embeddings.
        reuse: allow one alt embedding to serve several text tokens.
        mode: GUIDE_ORDER_TEXT | GUIDE_ORDER_ALIGN | GUIDE_ORDER_DIRECT
            (static — each mode compiles its own tiny executable).

    Returns:
        ``(idx [T] int32, sim [T] float32)`` — for row ``r``: the alt index
        matched to text token ``r`` and its (shifted, see module docstring)
        similarity. Unmatched rows are ``(0, 0.0)``.
    """
    sim = similarity_matrix(alt_emb, txt_emb)[:, 1:]  # drop header column
    if mode == GUIDE_ORDER_DIRECT:
        return _map_direct(sim)
    if reuse:
        return _map_reuse(sim)
    if mode == GUIDE_ORDER_TEXT:
        return _map_no_reuse_text(sim)
    return _map_no_reuse_align(sim)
