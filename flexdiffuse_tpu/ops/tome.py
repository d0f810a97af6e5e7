"""Token merging (ToMe) for the UNet's self-attention.

Bolya & Hoffman 2023, "Token Merging for Fast Stable Diffusion": spatial
tokens are highly redundant, so before self-attention a fixed fraction of
them is merged into their most-similar neighbours (bipartite soft
matching), attention runs on the reduced set, and outputs are copied back
("unmerged") to the full set. No reference equivalent — the reference's
only attention knob is memory slicing (`/root/reference/pipeline/
flex.py:85-110`); ToMe is a *compute* reduction, complementary to
DeepCache (conv side) and the CFG interval (batch side): it attacks the
O(S²) self-attention that dominates large canvases (SD1.x 1024² highres:
16k tokens).

TPU-first design (vs the torch original's dynamic shapes + random dst):

- **Static shapes everywhere.** The merge count ``r`` is fixed at trace
  time from the ratio, so every gather/scatter and the reduced attention
  have static shapes and jit once. Dst selection is the deterministic
  top-left of each 2×2 window (the original's ``use_rand`` jitter is a
  quality tweak that would break shape/seed stability under `lax.scan`).
- **One MXU matmul for matching.** Cosine scores are a single
  ``[B, Ss, C] × [B, Sd, C]`` batched matmul; ranking is one sort. The
  sequential "pick best pairs" loop of the original collapses into
  argmax + argsort (merged srcs all average into their best dst — same
  policy as the original's batched mode).
- **Both token layouts.** Plan building and merge/unmerge work on
  ``[B, S, C]`` rows and on the channel-major ``[C, B·S]`` interior
  (models/unet.py) via column gathers — no layout rotation is introduced.

Exactness: merging is an approximation (softmax mass over duplicates is
not preserved), so there is no bit-parity target; the invariants tested
instead are plan validity, unmerge/merge round-trips, and r=0 identity.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class TomePlan(NamedTuple):
    """Static-shape merge plan for one (B, S) token grid.

    ``dst_idx``/``src_idx`` are the fixed bipartite split (shared across
    the batch); ``merged_pos``/``kept_pos`` index into ``src_idx``'s rows
    and ``assign`` gives each merged src's dst slot, all per batch row.
    The merged sequence is laid out ``[dst..., kept src...]`` and has
    static length ``Sd + Sk``.
    """
    dst_idx: Array      # [Sd] int32, token ids of dst slots
    src_idx: Array      # [Ss] int32, token ids of src slots
    merged_pos: Array   # [B, r] int32, positions into src_idx (merged away)
    kept_pos: Array     # [B, Sk] int32, positions into src_idx (kept)
    assign: Array       # [B, r] int32, dst slot for each merged src
    grid_hw: Tuple[int, int]

    @property
    def r(self) -> int:
        return self.merged_pos.shape[-1]

    @property
    def merged_len(self) -> int:
        return self.dst_idx.shape[0] + self.kept_pos.shape[-1]


def bipartite_split(hh: int, ww: int) -> Tuple[Array, Array]:
    """Token ids of the dst (top-left of each 2×2 window) and src (rest)
    sets for an ``hh×ww`` grid (row-major tokens). Odd edges fall to src."""
    ids = jnp.arange(hh * ww, dtype=jnp.int32).reshape(hh, ww)
    dst = ids[0::2, 0::2].reshape(-1)
    mask = jnp.zeros((hh, ww), bool).at[0::2, 0::2].set(True).reshape(-1)
    src = jnp.where(~mask, size=hh * ww - dst.shape[0])[0].astype(jnp.int32)
    return dst, src


def resolve_r(hh: int, ww: int, ratio: float,
              multiple: int = 128) -> int:
    """Merge count for a grid: ``ratio`` of all tokens, capped at the src
    count, rounded so the reduced length stays a multiple of ``multiple``
    (flash-attention blocks pad less)."""
    s = hh * ww
    sd = ((hh + 1) // 2) * ((ww + 1) // 2)
    r = min(int(s * ratio), s - sd)
    rem = (s - r) % multiple
    if rem:                      # round the REDUCED length up to a multiple
        r = max(r - (multiple - rem), 0)
    return r


def merge_plan(metric: Array, grid_hw: Tuple[int, int], r: int) -> TomePlan:
    """Build the merge plan from a ``[B, S, C]`` similarity metric (the
    pre-attention hidden states; cosine similarity — the original's
    choice)."""
    hh, ww = grid_hw
    b, s, c = metric.shape
    assert s == hh * ww, (s, grid_hw)
    dst_idx, src_idx = bipartite_split(hh, ww)
    m = metric.astype(jnp.float32)
    m = m * jax.lax.rsqrt(jnp.sum(m * m, -1, keepdims=True) + 1e-12)
    msrc = jnp.take(m, src_idx, axis=1)                  # [B, Ss, C]
    mdst = jnp.take(m, dst_idx, axis=1)                  # [B, Sd, C]
    scores = jnp.einsum('bsc,bdc->bsd', msrc, mdst)      # one MXU matmul
    best = jnp.max(scores, axis=-1)                      # [B, Ss]
    assign_all = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    order = jnp.argsort(-best, axis=-1).astype(jnp.int32)  # most similar 1st
    merged_pos = order[:, :r]
    kept_pos = order[:, r:]
    assign = jnp.take_along_axis(assign_all, merged_pos, axis=1)
    return TomePlan(dst_idx, src_idx, merged_pos, kept_pos, assign, grid_hw)


def _gather_rows(x: Array, token_ids: Array) -> Array:
    """x [B, S, C], token_ids [S'] or [B, S'] → [B, S', C]."""
    if token_ids.ndim == 1:
        return jnp.take(x, token_ids, axis=1)
    return jnp.take_along_axis(x, token_ids[..., None], axis=1)


def merge(x: Array, plan: TomePlan) -> Array:
    """``[B, S, C] → [B, Sd+Sk, C]``: dst slots average in their merged
    srcs (mean mode, like the original); kept srcs pass through."""
    b = x.shape[0]
    src_tokens = jnp.take_along_axis(
        plan.src_idx[None].repeat(b, 0), plan.merged_pos, axis=1)
    x_dst = _gather_rows(x, plan.dst_idx)                # [B, Sd, C]
    x_merged = _gather_rows(x, src_tokens)               # [B, r, C]
    x_kept = _gather_rows(
        x, jnp.take_along_axis(plan.src_idx[None].repeat(b, 0),
                               plan.kept_pos, axis=1))   # [B, Sk, C]
    binx = jnp.arange(b, dtype=jnp.int32)[:, None]
    acc = jnp.zeros_like(x_dst).at[binx, plan.assign].add(x_merged)
    cnt = jnp.zeros(x_dst.shape[:2], x.dtype).at[binx, plan.assign].add(1.0)
    x_dst = (x_dst + acc) / (1.0 + cnt)[..., None]
    return jnp.concatenate([x_dst, x_kept], axis=1)


def unmerge(y: Array, plan: TomePlan) -> Array:
    """``[B, Sd+Sk, C] → [B, S, C]``: dst and kept tokens take their own
    outputs; merged srcs take their assigned dst's output."""
    b = y.shape[0]
    sd = plan.dst_idx.shape[0]
    y_dst, y_kept = y[:, :sd], y[:, sd:]
    s = plan.grid_hw[0] * plan.grid_hw[1]
    out = jnp.zeros((b, s, y.shape[-1]), y.dtype)
    binx = jnp.arange(b, dtype=jnp.int32)[:, None]
    out = out.at[binx, plan.dst_idx[None]].set(y_dst)
    kept_tokens = jnp.take_along_axis(plan.src_idx[None].repeat(b, 0),
                                      plan.kept_pos, axis=1)
    out = out.at[binx, kept_tokens].set(y_kept)
    merged_tokens = jnp.take_along_axis(plan.src_idx[None].repeat(b, 0),
                                        plan.merged_pos, axis=1)
    y_for_merged = jnp.take_along_axis(y_dst, plan.assign[..., None], axis=1)
    out = out.at[binx, merged_tokens].set(y_for_merged)
    return out


# ---------------------------------------------------------------------------
# Channel-major ([C, B·S]) variants — token gathers become column gathers;
# the plan itself is layout-independent.

def _flat_cols(token_ids: Array, b: int, s: int) -> Array:
    """Per-batch token ids [B, S'] (or [S'] shared) → flat column ids into
    the ``B·S`` axis (b-major layout, models/unet.py)."""
    if token_ids.ndim == 1:
        token_ids = jnp.broadcast_to(token_ids[None],
                                     (b, token_ids.shape[0]))
    off = (jnp.arange(b, dtype=jnp.int32) * s)[:, None]
    return (token_ids + off).reshape(-1)


def merge_cm(x: Array, plan: TomePlan, b: int) -> Array:
    """``[C, B·S] → [C, B·(Sd+Sk)]`` (same semantics as :func:`merge`)."""
    s = plan.grid_hw[0] * plan.grid_hw[1]
    src_tokens = jnp.take_along_axis(
        plan.src_idx[None].repeat(b, 0), plan.merged_pos, axis=1)
    kept_tokens = jnp.take_along_axis(
        plan.src_idx[None].repeat(b, 0), plan.kept_pos, axis=1)
    x_dst = jnp.take(x, _flat_cols(plan.dst_idx, b, s), axis=1)
    x_merged = jnp.take(x, _flat_cols(src_tokens, b, s), axis=1)
    x_kept = jnp.take(x, _flat_cols(kept_tokens, b, s), axis=1)
    sd = plan.dst_idx.shape[0]
    dst_cols = _flat_cols(plan.assign, b, sd)            # [B·r]
    acc = jnp.zeros_like(x_dst).at[:, dst_cols].add(x_merged)
    cnt = jnp.zeros((x_dst.shape[1],), x.dtype).at[dst_cols].add(1.0)
    x_dst = (x_dst + acc) / (1.0 + cnt)[None]
    # Reassemble b-major: per batch item [dst..., kept...] contiguous.
    c = x.shape[0]
    sk = kept_tokens.shape[1]
    x_dst = x_dst.reshape(c, b, sd)
    x_kept = x_kept.reshape(c, b, sk)
    return jnp.concatenate([x_dst, x_kept], axis=2).reshape(c, b * (sd + sk))


def unmerge_cm(y: Array, plan: TomePlan, b: int) -> Array:
    """``[C, B·(Sd+Sk)] → [C, B·S]`` (same semantics as :func:`unmerge`)."""
    c = y.shape[0]
    sd = plan.dst_idx.shape[0]
    sk = plan.kept_pos.shape[1]
    s = plan.grid_hw[0] * plan.grid_hw[1]
    y3 = y.reshape(c, b, sd + sk)
    y_dst = y3[:, :, :sd].reshape(c, b * sd)
    y_kept = y3[:, :, sd:].reshape(c, b * sk)
    out = jnp.zeros((c, b * s), y.dtype)
    out = out.at[:, _flat_cols(plan.dst_idx, b, s)].set(y_dst)
    kept_tokens = jnp.take_along_axis(plan.src_idx[None].repeat(b, 0),
                                      plan.kept_pos, axis=1)
    out = out.at[:, _flat_cols(kept_tokens, b, s)].set(y_kept)
    merged_tokens = jnp.take_along_axis(plan.src_idx[None].repeat(b, 0),
                                        plan.merged_pos, axis=1)
    y_for_merged = jnp.take(y_dst, _flat_cols(plan.assign, b, sd), axis=1)
    out = out.at[:, _flat_cols(merged_tokens, b, s)].set(y_for_merged)
    return out


def metric_from_cm(x: Array, b: int) -> Array:
    """``[C, B·S] → [B, S, C]`` fp32 metric view for :func:`merge_plan`.

    One transpose of the *metric only* — the activations themselves stay
    channel-major; matching quality needs fp32 anyway so this copy is not
    on the layout-critical path."""
    c, bs = x.shape
    return x.reshape(c, b, bs // b).transpose(1, 2, 0).astype(jnp.float32)
