"""Ring attention — sequence-parallel exact attention over a device mesh.

For resolutions where one chip's self-attention stops fitting or scaling
(≥2048²: 65k+ latent tokens), the token dimension shards across chips and
K/V blocks rotate around the ring while each chip accumulates its queries'
online-softmax state — exact attention, communication riding ICI via
``lax.ppermute``, compute and transfer overlapped by XLA's async collectives.

The per-round partial attention uses the same online-softmax recurrence as
the Pallas flash kernel (ops/flash_attention.py); here the accumulator state
``(acc, m, l)`` must cross rounds, so the recurrence lives at the JAX level
and each round's score block is only ``[Sq/d, Skv/d]`` — small by
construction. Rounds run inside ``lax.scan``; the whole thing jits under
``shard_map``.

Reference context: the reference has no attention scaling story beyond
memory slicing (SURVEY.md §5 "long-context: N/A … blockwise attention if
the rebuild targets >512²") — this is that extension, TPU-native.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


def _ring_body(q: Array, scale: float, axis_name: str):
    """One accumulation round: attend q to the resident K/V block."""

    def round_fn(carry, _):
        acc, m, l, kb, vb = carry
        s = jnp.einsum('bhqd,bhkd->bhqk', q, kb,
                       preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum('bhqk,bhkd->bhqd', p.astype(vb.dtype), vb,
                        preferred_element_type=jnp.float32)
        acc = acc * alpha[..., None] + pv
        # Rotate K/V to the next chip (ICI neighbor exchange).
        n = jax.lax.psum(1, axis_name)
        perm = [(i, (i + 1) % n) for i in range(n)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (acc, m_new, l, kb, vb), None

    return round_fn


def _ring_attention_sharded(q: Array, k: Array, v: Array, scale: float,
                            axis_name: str) -> Array:
    """Body under shard_map: all inputs are per-device shards
    ``[B, H, S/d, D]``."""
    num = jax.lax.psum(1, axis_name)
    # Initial state derived from q so shard_map marks it axis-varying
    # (freshly-created constants would be "unvarying" and fail the scan
    # carry type check).
    acc = jnp.zeros_like(q, jnp.float32)
    m = jnp.full_like(q[..., 0], -1e30, jnp.float32)
    l = jnp.zeros_like(q[..., 0], jnp.float32)
    (acc, m, l, _, _), _ = jax.lax.scan(
        _ring_body(q, scale, axis_name), (acc, m, l, k, v), None,
        length=num)
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(q: Array, k: Array, v: Array, mesh: Mesh, axis: str,
                   scale: Optional[float] = None) -> Array:
    """Exact attention with the sequence dim sharded on ``mesh`` axis ``axis``.

    Args:
        q, k, v: ``[B, H, S, D]`` (global shapes; S divisible by the axis
            size). May already be device-put with the sequence sharding.

    Returns:
        ``[B, H, S, D]`` attention output, sequence-sharded the same way.
    """
    if scale is None:
        scale = q.shape[-1]**-0.5
    try:
        from jax import shard_map  # JAX >= 0.8
    except ImportError:  # pragma: no cover - older JAX
        from jax.experimental.shard_map import shard_map
    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(_ring_attention_sharded, scale=scale,
                          axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
