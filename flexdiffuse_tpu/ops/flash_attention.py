"""Pallas TPU flash attention — the UNet self-attention hot kernel.

Streams K/V blocks through VMEM with an online-softmax accumulator so the
``[S, S]`` score matrix never touches HBM. At SD's 512² bottleneck level
(S = 4096, 8 heads, CFG batch) the naive path materializes
``B·H·S² ≈ 0.5 GiB``-scale score tensors per step; this kernel's working set
is a few hundred KiB of VMEM. Replaces the reference's attention-slicing
memory knob (pipeline/flex.py:85-110) outright.

Head dims in SD1.x are 40/80/160 — not lane-aligned. Round 2 drove the
``[s, d]`` block layout to 97% of its lane-padding ceiling; round 3 removed
the ceiling itself: the resident-K/V path now runs the **transposed-operand
kernel** (``_flash_tt_kernel``, ``[d, s]`` blocks) whose P·V matmul puts the
q block — not the 40-wide head dim padded to 128 — in the output lanes, and
whose operand layout is byte-compatible with the seq-minor layouts XLA picks
for the surrounding transformer ops (measured +3% whole-step,
tools/flash_tt.py). The ``[s, d]`` streaming kernel remains for sequences
whose K/V exceed VMEM.

Run with ``interpret=True`` off-TPU (tests exercise it on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    """Pallas interpret mode off-TPU; honours a jax.default_device scope
    (utils/params.py target_platform) so a CPU-scoped compile on a
    TPU-attached process interprets instead of crashing."""
    from flexdiffuse_tpu.utils.params import target_platform
    return target_platform() != 'tpu'

NEG_INF = -1e30


def _flash_stream_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                         *, scale: float):
    """Streaming variant: grid dim 2 walks K/V blocks ('arbitrary'
    semantics), online-softmax state lives in VMEM scratch across steps."""
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0] * jnp.asarray(scale, q_ref.dtype)      # [bq, d]
    kb = k_ref[0]                                        # [bk, d]
    vb = v_ref[0]
    s = jax.lax.dot_general(q, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m_prev = m_ref[:, :1]                                # replicated lanes
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


LOG2E = 1.4426950408889634


def _tt_body(q, load_k, load_v, *, block_k: int, num_kv: int, unroll: int):
    """Shared transposed-operand online-softmax loop.

    ``q`` is the pre-scaled ``[d, bq]`` query block; ``load_k(j)`` /
    ``load_v(j)`` return the j-th ``[d, block_k]`` K/V block. Returns the
    normalized ``[d, bq]`` output block (see :func:`_flash_tt_kernel` for
    the math and the sum-fold/exp2 VPU folds).
    """
    d, bq = q.shape
    ones_row = None

    def body(j, carry):
        acc, m = carry                             # [d+1, bq], [bq, 1]
        kb = load_k(j)                                      # [d, bk]
        vb = load_v(j)
        s = jax.lax.dot_general(q, kb, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [bq,bk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)                         # [bq, 1]
        vb = jnp.concatenate([vb, jnp.ones((1, block_k), vb.dtype)], axis=0)
        pv = jax.lax.dot_general(vb, p.astype(vb.dtype),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc = acc * alpha.T + pv                            # [d+1, bq]
        return acc, m_new

    acc = jnp.zeros((d + 1, bq), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    carry = (acc, m0)
    unroll = min(unroll, num_kv)
    while num_kv % unroll:
        unroll -= 1
    if num_kv == unroll:
        for j in range(num_kv):
            carry = body(j, carry)
    else:
        def outer(jj, carry):
            for u in range(unroll):
                carry = body(jj * unroll + u, carry)
            return carry
        carry = jax.lax.fori_loop(0, num_kv // unroll, outer, carry)
    acc, _ = carry
    return acc[:d] / acc[d:d + 1]


def _flash_tt_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                     block_k: int, unroll: int = 2):
    """Transposed-operand kernel: refs are ``[1, d, s]`` (head-dim in
    sublanes, sequence in lanes).

    Two structural wins over the ``[s, d]`` layout at SD's narrow heads
    (d = 40/80):

    * The P·V matmul contracts ``[d, bk] × [bk, bq]`` — output lanes are the
      q-block (full 128-lane tiles), not the 40-wide head dim padded to 128.
      MXU cycles per kv block drop from ``bq·bk/128`` to ``d·(bk/128)·
      (bq/128)``: 3.2× fewer at d=40, escaping the lane-padding ceiling the
      ``[s, d]`` layout is stuck at (docs/PERFORMANCE.md round 2).
    * ``[b, h, d, s]`` row-major is byte-identical to the seq-minor
      ``[b, s, h·d]{1,2,0}`` layout XLA prefers for the surrounding
      transformer tensors, so the q/k/v relayout copies and the relayout
      fused into the residual adds (~1 ms/step, profiled) become bitcasts.

    Matmul orientations are stream-friendly (tools/flash_tt.py micro2 —
    10-28% over the first-cut orientation): the scores dot contracts the
    *loop-invariant* q block's sublane dim (its transpose hoists out of the
    kv loop) and P·V streams v with its contraction minor; softmax stats are
    lane-reduced ``[bq, 1]`` columns with one vector transpose per block for
    the acc rescale.

    With the tt orientation the kernel's own MXU-cycle mix supports
    ~94 TFLOP/s, so it is VPU-(softmax-)bound; two VPU passes per element
    are therefore folded away (tools/flash_tt3.py step A/B: −3.4% whole-
    forward at the CFG shape):

    * **sum-fold** — a ones-row appended to each streamed V block makes row
      d of the P·V output the row-sum of P, so the separate lane-reduce of p
      (and the l carry) disappears; the MXU pays one extra sublane row.
    * **exp2** — ``log2(e)`` is pre-folded into the q scaling so the softmax
      transcendental is a bare exp2 (exp lowers to exp2 + a per-element
      multiply on this VPU).
    """
    q = q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)  # [d, bq]
    out = _tt_body(q,
                   lambda j: k_ref[0, :, pl.ds(j * block_k, block_k)],
                   lambda j: v_ref[0, :, pl.ds(j * block_k, block_k)],
                   block_k=block_k, num_kv=k_ref.shape[2] // block_k,
                   unroll=unroll)
    o_ref[0] = out.astype(o_ref.dtype)




@functools.partial(jax.jit,
                   static_argnames=('scale', 'block_q', 'block_k',
                                    'interpret'))
def flash_attention_tt(q: Array, k: Array, v: Array, scale: float,
                       block_q: int = 512, block_k: int = 512,
                       interpret: bool | None = None) -> Array:
    """``[B, H, D, Sq] × [B, H, D, Skv] → [B, H, D, Sq]`` flash attention
    over transposed (seq-minor) operands. See :func:`_flash_tt_kernel`."""
    b, h, d, sq = q.shape
    skv = k.shape[3]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    while block_q > 128 and sq % block_q:
        block_q //= 2
    while block_k > 128 and skv % block_k:
        block_k //= 2
    if sq % block_q or skv % block_k:
        raise ValueError(f'sequence ({sq}, {skv}) not divisible by blocks '
                         f'({block_q}, {block_k})')
    if interpret is None:
        interpret = _interpret()

    qf = q.reshape(b * h, d, sq)
    kf = k.reshape(b * h, d, skv)
    vf = v.reshape(b * h, d, skv)
    kv_bytes = 4 * skv * max(d, 8) * jnp.dtype(k.dtype).itemsize
    unroll = (skv // block_k
              if b * h <= 16 and kv_bytes <= 4 * 1024 * 1024 else 2)
    out = pl.pallas_call(
        functools.partial(_flash_tt_kernel, scale=scale, block_k=block_k,
                          unroll=unroll),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, d, sq)


@functools.partial(jax.jit,
                   static_argnames=('scale', 'block_q', 'block_k',
                                    'interpret'))
def flash_attention_cm(q: Array, k: Array, v: Array, scale: float,
                       block_q: int = 1024, block_k: int = 1024,
                       interpret: bool | None = None) -> Array:
    """``[H, D, B, Sq] × [H, D, B, Skv] → [H, D, B, Sq]`` flash attention
    over channel-major operands (the layout the channel-major transformer
    blocks keep all activations in — models/unet.py).

    The trailing ``(B, S)`` dims are contiguous, so they flatten to one
    ``B·S`` axis by pure bitcast and the grid walks ``(head, q-block)`` with
    the q-block index selecting its batch's K/V slab in the index map
    (q blocks never straddle batches — ``Sq % block_q == 0``). This reuses
    :func:`_flash_tt_kernel` verbatim: block contents are identical to the
    tt path, so outputs are bitwise equal; no transpose or relayout touches
    either side of the custom call."""
    h, d, b, sq = q.shape
    skv = k.shape[3]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    while block_q > 128 and sq % block_q:
        block_q //= 2
    while block_k > 128 and skv % block_k:
        block_k //= 2
    if sq % block_q or skv % block_k:
        raise ValueError(f'sequence ({sq}, {skv}) not divisible by blocks '
                         f'({block_q}, {block_k})')
    if interpret is None:
        interpret = _interpret()

    qf = q.reshape(h, d, b * sq)
    kf = k.reshape(h, d, b * skv)
    vf = v.reshape(h, d, b * skv)
    qb_per_batch = sq // block_q
    kv_bytes = 4 * skv * max(d, 8) * jnp.dtype(k.dtype).itemsize
    unroll = (skv // block_k
              if b * h <= 16 and kv_bytes <= 4 * 1024 * 1024 else 2)
    out = pl.pallas_call(
        functools.partial(_flash_tt_kernel, scale=scale, block_k=block_k,
                          unroll=unroll),
        grid=(h, b * qb_per_batch),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv),
                         lambda i, j: (i, 0, j // qb_per_batch),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv),
                         lambda i, j: (i, 0, j // qb_per_batch),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, d, b * sq), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(h, d, b, sq)


# Full-K/V-resident kernel cap: 2 tensors × 2 pipeline buffers × skv ×
# sublane-rounded d × itemsize must leave VMEM room for q/o/acc blocks.
# Beyond this the streaming kernel takes over (refetches K/V per q block —
# the right trade at long sequence, impossible shapes for the XLA path
# anyway).
_FULL_KV_VMEM_BYTES = 8 * 1024 * 1024


@functools.partial(jax.jit,
                   static_argnames=('scale', 'block_q', 'block_k',
                                    'interpret'))
def flash_attention(q: Array, k: Array, v: Array, scale: float,
                    block_q: int = 512, block_k: int = 1024,
                    interpret: bool | None = None) -> Array:
    """``[B, H, Sq, D] × [B, H, Skv, D] → [B, H, Sq, D]`` flash attention.

    Sq must divide by ``block_q`` (shrunk automatically when smaller) and
    Skv by ``block_k``; SD's power-of-two token grids always satisfy this.
    Short K/V sequences keep the whole K/V resident in VMEM (zero refetch);
    long ones stream K/V blocks with scratch-carried softmax state.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if d > 128:
        # Wide heads (the VAE's single 512-dim head): the per-block working
        # set scales with d — shrink blocks to stay inside scoped VMEM.
        block_q = min(block_q, 256)
        block_k = min(block_k, 512)
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    # Non-square resolutions give sequences like 1536/2560/7680 (768×512
    # etc.) that divide 512 but not the 1024 default — halve blocks until
    # they fit rather than rejecting shapes the dispatcher deems eligible.
    while block_q > 128 and sq % block_q:
        block_q //= 2
    while block_k > 128 and skv % block_k:
        block_k //= 2
    if sq % block_q or skv % block_k:
        raise ValueError(f'sequence ({sq}, {skv}) not divisible by blocks '
                         f'({block_q}, {block_k})')
    if interpret is None:
        interpret = _interpret()

    # Resident-K/V cutoff. In the transposed (tt) layout the K/V working set
    # scales with the true head dim rounded to a sublane (not 128 padded
    # lanes), so e.g. 1024²-image sequences (16384 tokens, d=40) stay
    # resident where the [s, d] layout had to stream.
    kv_bytes = 4 * skv * (-(-d // 8) * 8) * jnp.dtype(k.dtype).itemsize
    if kv_bytes <= _FULL_KV_VMEM_BYTES:
        out = flash_attention_tt(q.transpose(0, 1, 3, 2),
                                 k.transpose(0, 1, 3, 2),
                                 v.transpose(0, 1, 3, 2), scale,
                                 block_q=min(block_q, 512),
                                 block_k=min(block_k, 512),
                                 interpret=interpret)
        return out.transpose(0, 1, 3, 2)

    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, skv, d)
    vf = v.reshape(b * h, skv, d)
    out = pl.pallas_call(
            functools.partial(_flash_stream_kernel, scale=scale),
            grid=(b * h, sq // block_q, skv // block_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda i, qi, j: (i, qi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda i, qi, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, d), lambda i, qi, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda i, qi, j: (i, qi, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, sq, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, d), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=('parallel', 'parallel', 'arbitrary')),
            interpret=interpret,
        )(qf, kf, vf)
    return out.reshape(b, h, sq, d)
