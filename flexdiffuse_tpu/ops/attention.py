"""Attention dispatch: XLA fused path or Pallas flash-attention kernel.

The reference's memory knob is diffusers attention *slicing*
(pipeline/flex.py:85-110) — splitting softmax(QKᵀ)V into sequential slices to
bound peak memory. On TPU that knob is obsolete: the Pallas flash-attention
kernel (ops/flash_attention.py) streams K/V blocks through VMEM and never
materializes the [S, S] score matrix, so it is both the memory fix and the
bandwidth fix. The XLA einsum path remains for tiny sequences (CLIP's 77/257
tokens, low-res UNet levels) where kernel launch overhead outweighs savings
and XLA's own fusion is already fine.
"""
from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Below this q-sequence length the XLA path wins (empirically; the flash
# kernel pays grid setup + padding costs that only amortize at scale).
FLASH_MIN_SEQ = 1024

# Context-local (thread/task-safe — the UI server dispatches generations from
# handler threads, so a process-global would race): 'auto' | 'xla' | 'flash'.
_BACKEND: contextvars.ContextVar = contextvars.ContextVar(
    'attention_backend', default='auto')


def _validate(name: str) -> None:
    if name not in ('auto', 'xla', 'flash'):
        raise ValueError(f'unknown attention backend {name!r}')


def set_backend(name: str) -> None:
    """Force the attention backend for the current context
    ('auto', 'xla', 'flash')."""
    _validate(name)
    _BACKEND.set(name)


@contextlib.contextmanager
def backend(name: str):
    """Scoped attention-backend override: ``with backend('xla'): ...``."""
    _validate(name)
    token = _BACKEND.set(name)
    try:
        yield
    finally:
        _BACKEND.reset(token)


# Sequence-parallel mode: (mesh, axis_name, min_seq). While set, self-
# attention with the token dim sharded over `axis_name` routes through ring
# attention (ops/ring_attention.py) — K/V blocks rotate over ICI instead of
# any chip holding the full sequence. Trace-time state like _BACKEND.
_SP: contextvars.ContextVar = contextvars.ContextVar('attention_sp',
                                                     default=None)


@contextlib.contextmanager
def sp_context(mesh, axis: str, min_seq: int = 4096):
    """Scoped sequence-parallel attention over ``mesh`` axis ``axis``.

    Self-attention (sq == skv) with sequence ≥ ``min_seq`` and divisible by
    the axis size rides the ring; everything else (cross-attention's 77-token
    K/V, small levels) stays on the local path where GSPMD replication is
    cheaper than a ring rotation.
    """
    token = _SP.set((mesh, axis, min_seq))
    try:
        yield
    finally:
        _SP.reset(token)


def _target_platform() -> str:
    """See :func:`flexdiffuse_tpu.utils.params.target_platform` — honours
    a ``jax.default_device(...)`` scope so 'auto' never routes the Pallas
    kernel to a CPU compile on a TPU-attached process."""
    from flexdiffuse_tpu.utils.params import target_platform
    return target_platform()


def xla_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Reference attention: softmax in fp32, inputs any dtype.

    Shapes ``[B, H, S, D]`` for q and ``[B, H, Skv, D]`` for k/v.
    """
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum('bhqk,bhkd->bhqd', probs, v)


def attention(q: Array, k: Array, v: Array,
              scale: Optional[float] = None,
              backend: Optional[str] = None) -> Array:
    """Multi-head attention ``[B, H, Sq, D] × [B, H, Skv, D] -> [B, H, Sq, D]``.

    ``backend`` overrides the context-local setting for this call.
    """
    if scale is None:
        scale = q.shape[-1]**-0.5
    sp = _SP.get()
    if sp is not None and q.ndim == 4:
        mesh, axis, min_seq = sp
        n = mesh.shape[axis]
        sq, skv = q.shape[-2], k.shape[-2]
        if sq == skv and sq >= min_seq and sq % n == 0:
            from flexdiffuse_tpu.ops.ring_attention import ring_attention
            return ring_attention(q, k, v, mesh, axis, scale)
        # Below-threshold / cross attention under SP: the Pallas kernel has
        # no GSPMD partitioning rule (it would force replication); the XLA
        # einsum path partitions cleanly along the sharded q rows.
        return xla_attention(q, k, v, scale)
    if backend is None:
        backend = _BACKEND.get()
    else:
        _validate(backend)
    big = (q.shape[-2] >= FLASH_MIN_SEQ and k.shape[-2] >= FLASH_MIN_SEQ)
    # The kernel halves its blocks down to 128 to fit the sequence; odd
    # resolutions whose token counts don't divide 128 (e.g. 832² → seq
    # 10816 = 128·84.5) fall back to the XLA path instead of failing.
    divisible = (q.shape[-2] % 128 == 0 and k.shape[-2] % 128 == 0)
    # Head dims beyond one lane tile (128) stay on XLA — measured, not
    # assumed: at the VAE's 4096-token single 512-dim head the KV-streaming
    # flash kernel compiles and is exact but *slower* (6.9 vs 5.4 ms/call,
    # tools/bench_vae.py) because a lane-dense wide head already runs the
    # MXU at full tilt and streaming refetches K/V per q block.
    narrow = q.shape[-1] <= 128
    eligible = big and divisible and narrow
    if backend == 'auto':
        backend = ('flash'
                   if _target_platform() == 'tpu' and eligible else 'xla')
    elif backend == 'flash' and not eligible:
        # Forced flash still falls back for ineligible shapes (e.g.
        # cross-attention kv=77): nothing to stream there.
        backend = 'xla'
    if backend == 'flash':
        # The differentiable wrapper's primal IS the inference kernel
        # (ops/flash_backward.py custom_vjp) — identical bytes when not
        # differentiated, Pallas backward kernels under jax.grad.
        from flexdiffuse_tpu.ops.flash_backward import flash_attention_diff
        return flash_attention_diff(q, k, v, scale)
    return xla_attention(q, k, v, scale)


def xla_attention_cm(q: Array, k: Array, v: Array, scale: float) -> Array:
    """XLA attention over channel-major ``[H, D, B, S]`` operands."""
    logits = jnp.einsum('hdbq,hdbk->hbqk', q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum('hbqk,hdbk->hdbq', probs, v)


def attention_cm(q: Array, k: Array, v: Array,
                 scale: Optional[float] = None,
                 backend: Optional[str] = None) -> Array:
    """Multi-head attention over **channel-major** operands:
    ``[H, D, B, Sq] × [H, D, B, Skv] → [H, D, B, Sq]``.

    The layout the channel-major transformer blocks (models/unet.py) keep
    activations in — head-dim outermost, sequence minor — which is exactly
    the flash kernel's native operand layout, so the hot path has no
    relayout on either side of the custom call. Dispatch rules mirror
    :func:`attention`.
    """
    if scale is None:
        scale = q.shape[1]**-0.5
    if _SP.get() is not None:
        # Sequence-parallel generation never builds channel-major blocks
        # (FlexPipeline forces channel_major=False under sp_mesh); if user
        # code lands here anyway, route through the standard path where the
        # ring/GSPMD rules live.
        std = attention(q.transpose(2, 0, 3, 1), k.transpose(2, 0, 3, 1),
                        v.transpose(2, 0, 3, 1), scale, backend)
        return std.transpose(1, 3, 0, 2)
    if backend is None:
        backend = _BACKEND.get()
    else:
        _validate(backend)
    sq, skv = q.shape[-1], k.shape[-1]
    big = sq >= FLASH_MIN_SEQ and skv >= FLASH_MIN_SEQ
    divisible = sq % 128 == 0 and skv % 128 == 0
    narrow = q.shape[1] <= 128
    eligible = big and divisible and narrow
    if backend == 'auto':
        backend = ('flash'
                   if _target_platform() == 'tpu' and eligible else 'xla')
    elif backend == 'flash' and not eligible:
        backend = 'xla'
    if backend == 'flash':
        from flexdiffuse_tpu.ops.flash_backward import \
            flash_attention_cm_diff
        return flash_attention_cm_diff(q, k, v, scale)
    return xla_attention_cm(q, k, v, scale)
