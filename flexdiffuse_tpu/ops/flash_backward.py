"""Flash attention VJP — Pallas backward kernels for training.

The inference flash kernel (ops/flash_attention.py) is a forward-only
custom call; differentiating through it fails, and routing training
attention through XLA's fused path costs ~2× the step time at SD's d=40
heads (tools/bench_train.py, docs/PERFORMANCE.md). This module makes the
flash path differentiable:

* ``flash_attention_diff`` / ``flash_attention_cm_diff`` wrap the
  inference kernels in ``jax.custom_vjp`` — the primal IS the inference
  kernel (zero overhead when not differentiated);
* the VJP forward re-runs the transposed-operand kernel with one extra
  output, the base-2 log-sum-exp rows (``lse = m + log2(l)`` — the online
  softmax state the kernel already carries, exposed instead of discarded);
* the backward recomputes probabilities blockwise as
  ``p = exp2(s̃ − lse)`` (FlashAttention-2 style: no ``[S, S]`` tensor ever
  exists) in two Pallas kernels over the same ``[d, s]`` transposed layout
  as the forward:

  - **dq kernel** (grid: q blocks): ``ds = p ∘ (dp − D) · scale``,
    ``dq += k · dsᵀ``, with ``dp = dOᵀV`` and ``D = Σ_d dO∘O`` (computed
    once outside, fused into XLA);
  - **dk/dv kernel** (grid: kv blocks): ``dv += dO · p``,
    ``dk += q · ds``.

  Loop-invariant operand scaling hoists out of each kernel's inner loop
  (the dq kernel scales its q block once; the dk/dv kernel scales its k
  block once), mirroring the forward's stream-friendly orientations.

Sequences whose K/V exceed the resident-VMEM cutoff fall back to a
lax.scan-chunked XLA backward (same math, no ``[S, S]`` materialization) —
correct at any length, slower than the kernels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flexdiffuse_tpu.ops.flash_attention import (_FULL_KV_VMEM_BYTES, LOG2E,
                                                 NEG_INF, flash_attention,
                                                 flash_attention_cm)

Array = jax.Array


def _interpret() -> bool:
    """Pallas interpret mode off-TPU; honours a jax.default_device scope
    (utils/params.py target_platform) so a CPU-scoped compile on a
    TPU-attached process interprets instead of crashing."""
    from flexdiffuse_tpu.utils.params import target_platform
    return target_platform() != 'tpu'


# ---------------------------------------------------------------------------
# Forward with lse output (the VJP's fwd pass)


def _fwd_lse_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                    block_k: int):
    """Transposed-operand forward that also writes base-2 lse rows.

    Same math as ops/flash_attention._flash_tt_kernel (sum-fold + exp2);
    kept as a plain fori_loop — the VJP forward runs once per training
    step, not 16× per sampling step, so unroll pressure isn't worth VMEM.
    """
    d, bq = q_ref.shape[1], q_ref.shape[2]
    num_kv = k_ref.shape[2] // block_k
    q = q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)   # [d, bq]

    def body(j, carry):
        acc, m = carry                                        # [d+1,bq],[bq,1]
        kb = k_ref[0, :, pl.ds(j * block_k, block_k)]
        vb = v_ref[0, :, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(q, kb, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        vb = jnp.concatenate([vb, jnp.ones((1, block_k), vb.dtype)], axis=0)
        pv = jax.lax.dot_general(vb, p.astype(vb.dtype),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return acc * alpha.T + pv, m_new

    acc0 = jnp.zeros((d + 1, bq), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    acc, m = jax.lax.fori_loop(0, num_kv, body, (acc0, m0))
    l = acc[d:d + 1]                                          # [1, bq]
    o_ref[0] = (acc[:d] / l).astype(o_ref.dtype)
    lse_ref[0] = (m.T + jnp.log2(l)).astype(jnp.float32)      # [1, bq]


def _tt_forward_lse(q: Array, k: Array, v: Array, scale: float,
                    block_q: int = 512, block_k: int = 512,
                    interpret: bool | None = None):
    """``[B, H, D, S]`` forward returning ``(o, lse[B, H, S])``."""
    b, h, d, sq = q.shape
    skv = k.shape[3]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    while block_q > 128 and sq % block_q:
        block_q //= 2
    while block_k > 128 and skv % block_k:
        block_k //= 2
    if interpret is None:
        interpret = _interpret()
    qf = q.reshape(b * h, d, sq)
    kf = k.reshape(b * h, d, skv)
    vf = v.reshape(b * h, d, skv)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_lse_kernel, scale=scale, block_k=block_k),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            # [bh, 1, sq]: a (1, 1, block) block keeps the sublane dim
            # equal to the array dim (TPU block-shape constraint).
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
            jax.ShapeDtypeStruct((b * h, 1, sq), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return o.reshape(b, h, d, sq), lse.reshape(b, h, sq)


# ---------------------------------------------------------------------------
# Backward kernels


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dq_ref, *,
               scale: float, block_k: int):
    """Per q block: ``dq = Σ_j kb · dsᵀ``; K/V whole-resident."""
    d = q_ref.shape[1]
    num_kv = k_ref.shape[2] // block_k
    q = q_ref[0] * jnp.asarray(scale * LOG2E, q_ref.dtype)    # [d, bq]
    dob = do_ref[0]                                           # [d, bq]
    lse_col = lse_ref[0].T                                    # [bq, 1]
    d_col = dvec_ref[0].T                                     # [bq, 1]

    def body(j, acc):
        kb = k_ref[0, :, pl.ds(j * block_k, block_k)]         # [d, bk]
        vb = v_ref[0, :, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(q, kb, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(s - lse_col)                             # [bq, bk]
        dp = jax.lax.dot_general(dob, vb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - d_col) * scale).astype(kb.dtype)
        return acc + jax.lax.dot_general(
            kb, ds, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [d, bq]

    acc = jax.lax.fori_loop(0, num_kv,
                            body, jnp.zeros((d, q.shape[1]), jnp.float32))
    dq_ref[0] = acc.astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dvec_ref, dk_ref,
                dv_ref, *, scale: float, block_q: int):
    """Per kv block: ``dv = Σ_i dO·p``, ``dk = Σ_i q·ds``; Q/dO resident."""
    d = k_ref.shape[1]
    bk = k_ref.shape[2]
    num_q = q_ref.shape[2] // block_q
    kb_scaled = k_ref[0] * jnp.asarray(scale * LOG2E, k_ref.dtype)  # [d, bk]
    vb = v_ref[0]

    def body(i, carry):
        dk_acc, dv_acc = carry
        qb = q_ref[0, :, pl.ds(i * block_q, block_q)]         # [d, bq]
        dob = do_ref[0, :, pl.ds(i * block_q, block_q)]
        lse_col = lse_ref[0, :, pl.ds(i * block_q, block_q)].T  # [bq, 1]
        d_col = dvec_ref[0, :, pl.ds(i * block_q, block_q)].T
        s = jax.lax.dot_general(qb, kb_scaled, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp2(s - lse_col)                             # [bq, bk]
        dv_acc = dv_acc + jax.lax.dot_general(
            dob, p.astype(dob.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [d, bk]
        dp = jax.lax.dot_general(dob, vb, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - d_col) * scale).astype(qb.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            qb, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [d, bk]
        return dk_acc, dv_acc

    z = jnp.zeros((d, bk), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, body, (z, z))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _tt_backward(q: Array, k: Array, v: Array, o: Array, lse: Array,
                 g: Array, scale: float, block_q: int = 512,
                 block_k: int = 512, interpret: bool | None = None):
    """``[B, H, D, S]`` grads ``(dq, dk, dv)`` from the Pallas kernels."""
    b, h, d, sq = q.shape
    skv = k.shape[3]
    block_q = min(block_q, sq)
    block_k = min(block_k, skv)
    while block_q > 128 and sq % block_q:
        block_q //= 2
    while block_k > 128 and skv % block_k:
        block_k //= 2
    if interpret is None:
        interpret = _interpret()
    qf = q.reshape(b * h, d, sq)
    kf = k.reshape(b * h, d, skv)
    vf = v.reshape(b * h, d, skv)
    of = o.reshape(b * h, d, sq)
    gf = g.reshape(b * h, d, sq)
    lsef = lse.reshape(b * h, 1, sq)
    # D = Σ_d dO ∘ O — one fused elementwise+reduce in XLA.
    dvec = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                   axis=1, keepdims=True)                     # [bh, 1, sq]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, dvec)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q),
        grid=(b * h, skv // block_k),
        in_specs=[
            pl.BlockSpec((1, d, sq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_k), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_k), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, sq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_k), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, block_k), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, skv), k.dtype),
            jax.ShapeDtypeStruct((b * h, d, skv), v.dtype),
        ],
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, dvec)
    return (dq.reshape(b, h, d, sq), dk.reshape(b, h, d, skv),
            dv.reshape(b, h, d, skv))


# ---------------------------------------------------------------------------
# Chunked XLA fallback (non-resident K/V — any length, no [S, S] tensor)


def _chunked_backward(q, k, v, o, lse, g, scale, chunk: int = 1024):
    """lax.scan over kv chunks of the same blockwise math, in plain XLA.
    Operands ``[B, H, D, S]``; used when K/V exceed the VMEM cutoff."""
    qf = q.astype(jnp.float32) * (scale * LOG2E)
    gf = g.astype(jnp.float32)
    of = o.astype(jnp.float32)
    dvec = jnp.sum(gf * of, axis=2)                           # [b, h, sq]
    skv = k.shape[3]
    chunk = min(chunk, skv)
    while skv % chunk:
        chunk //= 2
    nj = skv // chunk
    kc = k.astype(jnp.float32).reshape(*k.shape[:3], nj, chunk)
    vc = v.astype(jnp.float32).reshape(*v.shape[:3], nj, chunk)
    kc = jnp.moveaxis(kc, 3, 0)                               # [nj,b,h,d,c]
    vc = jnp.moveaxis(vc, 3, 0)

    def body(dq_acc, kv):
        kb, vb = kv
        s = jnp.einsum('bhdq,bhdk->bhqk', qf, kb)
        p = jnp.exp2(s - lse[..., None])
        dp = jnp.einsum('bhdq,bhdk->bhqk', gf, vb)
        ds = p * (dp - dvec[..., None]) * scale
        dq_acc = dq_acc + jnp.einsum('bhdk,bhqk->bhdq', kb, ds)
        # dk = q·ds with UNSCALED q — qf carries scale·log2e, divide out.
        dkb = jnp.einsum('bhdq,bhqk->bhdk', qf / (LOG2E * scale), ds)
        dvb = jnp.einsum('bhdq,bhqk->bhdk', gf, p)
        return dq_acc, (dkb, dvb)

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dq, (dks, dvs) = jax.lax.scan(body, dq0, (kc, vc))
    dk = jnp.moveaxis(dks, 0, 3).reshape(k.shape)
    dv = jnp.moveaxis(dvs, 0, 3).reshape(v.shape)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _resident(k: Array) -> bool:
    d, skv = k.shape[2], k.shape[3]
    kv_bytes = 4 * skv * (-(-d // 8) * 8) * jnp.dtype(k.dtype).itemsize
    return d <= 128 and kv_bytes <= _FULL_KV_VMEM_BYTES


# ---------------------------------------------------------------------------
# custom_vjp wrappers (primal = the inference kernels, untouched)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_diff(q: Array, k: Array, v: Array, scale: float):
    """``[B, H, S, D]`` flash attention, differentiable. The primal is
    ops/flash_attention.flash_attention verbatim."""
    return flash_attention(q, k, v, scale)


def _chunked_lse(qt, kt, scale):
    """Base-2 lse rows ``[B, H, Sq]`` computed chunked (non-resident fwd)."""
    qf = qt.astype(jnp.float32) * (scale * LOG2E)
    skv = kt.shape[3]
    chunk = 1024
    while skv % chunk:
        chunk //= 2
    nj = skv // chunk
    kc = jnp.moveaxis(
        kt.astype(jnp.float32).reshape(*kt.shape[:3], nj, chunk), 3, 0)

    def body(m_l, kb):
        m, l = m_l
        s = jnp.einsum('bhdq,bhdk->bhqk', qf, kb)
        m_new = jnp.maximum(m, s.max(axis=-1))
        l = l * jnp.exp2(m - m_new) + jnp.exp2(
            s - m_new[..., None]).sum(axis=-1)
        return (m_new, l), None

    m0 = jnp.full(qt.shape[:2] + (qt.shape[3],), NEG_INF, jnp.float32)
    (m, l), _ = jax.lax.scan(body, (m0, jnp.zeros_like(m0)), kc)
    return m + jnp.log2(l)


def _diff_fwd(q, k, v, scale):
    qt = q.transpose(0, 1, 3, 2)
    kt = k.transpose(0, 1, 3, 2)
    vt = v.transpose(0, 1, 3, 2)
    if _resident(kt):
        o, lse = _tt_forward_lse(qt, kt, vt, scale)
    else:
        # lse recomputed chunked (cheap relative to the step; streaming
        # shapes are not the training hot path).
        o = flash_attention(q, k, v, scale).transpose(0, 1, 3, 2)
        lse = _chunked_lse(qt, kt, scale)
    return o.transpose(0, 1, 3, 2), (qt, kt, vt, o, lse)


def _diff_bwd(scale, res, g):
    qt, kt, vt, o, lse = res
    gt = g.transpose(0, 1, 3, 2)
    if _resident(kt):
        dq, dk, dv = _tt_backward(qt, kt, vt, o, lse, gt, scale)
    else:
        dq, dk, dv = _chunked_backward(qt, kt, vt, o, lse, gt, scale)
    return (dq.transpose(0, 1, 3, 2), dk.transpose(0, 1, 3, 2),
            dv.transpose(0, 1, 3, 2))


flash_attention_diff.defvjp(_diff_fwd, _diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_cm_diff(q: Array, k: Array, v: Array, scale: float):
    """``[H, D, B, S]`` channel-major flash attention, differentiable.
    The primal is ops/flash_attention.flash_attention_cm verbatim."""
    return flash_attention_cm(q, k, v, scale)


def _cm_fwd(q, k, v, scale):
    # [H, D, B, S] → [B, H, D, S]: shared tt forward (the transposes only
    # exist under differentiation; inference runs the primal).
    qt = q.transpose(2, 0, 1, 3)
    kt = k.transpose(2, 0, 1, 3)
    vt = v.transpose(2, 0, 1, 3)
    if _resident(kt):
        o, lse = _tt_forward_lse(qt, kt, vt, scale)
    else:
        o = flash_attention_cm(q, k, v, scale).transpose(2, 0, 1, 3)
        lse = _chunked_lse(qt, kt, scale)
    return o.transpose(1, 2, 0, 3), (qt, kt, vt, o, lse)


def _cm_bwd(scale, res, g):
    qt, kt, vt, o, lse = res
    gt = g.transpose(2, 0, 1, 3)
    if _resident(kt):
        dq, dk, dv = _tt_backward(qt, kt, vt, o, lse, gt, scale)
    else:
        dq, dk, dv = _chunked_backward(qt, kt, vt, o, lse, gt, scale)
    back = lambda x: x.transpose(1, 2, 0, 3)
    return back(dq), back(dk), back(dv)


flash_attention_cm_diff.defvjp(_cm_fwd, _cm_bwd)
