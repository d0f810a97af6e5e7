"""SD v1.x conditional UNet in Flax linen — the denoise-loop workhorse.

TPU-native design decisions (vs. the torch ``UNet2DConditionModel`` the
reference drives through diffusers at pipeline/guide.py:56):

* **NHWC layout** end to end — TPU convs tile natively on channels-last; the
  pipeline transposes once at the latent boundary, never per-op.
* **bf16 compute, fp32 params** (``dtype`` vs ``param_dtype``): matmuls/convs
  hit the MXU in bf16; GroupNorm statistics and softmax run in fp32.
* Self-attention at the 64×64 level (S=4096) routes through the Pallas flash
  kernel via :func:`flexdiffuse_tpu.ops.attention.attention`; cross-attention
  (kv = 77 tokens) stays on the fused XLA path. Attention *slicing*
  (pipeline/flex.py:85-110) is obsolete here — flash attention never builds
  the score matrix.
* Static shapes + pure apply: the whole UNet jits once inside the sampling
  ``lax.scan``.

Geometry matches ``CompVis/stable-diffusion-v1-4``'s UNet (4 levels at
320/640/1280/1280, 2 resnets per level, single-depth transformer blocks with
8 heads, cross-attn dim 768) so HF checkpoints convert by pure renaming.
"""
from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from flexdiffuse_tpu.models.configs import UNetConfig
from flexdiffuse_tpu.ops.attention import attention, attention_cm

Array = jax.Array


# Channel-major interiors engage only where the flash kernel does (the
# relayout economics flip below it — tiny levels stay standard/NHWC).
# The per-architecture threshold lives in ``UNetConfig.cm_min_seq``
# (SD1.x 1024, SDXL 4096 — measured, docs/PERFORMANCE.md); the env var is
# an A/B override (tools/{cmajor_exp,sdxl_exp}.py).
CM_MIN_SEQ = 1024


def _cm_threshold(configured: int) -> int:
    env = os.environ.get('CM_MIN_SEQ')
    return int(env) if env else configured


class DenseCM(nn.Module):
    """``nn.Dense`` over **channel-major** activations ``[C_in, B·S]``.

    The channel-major transformer blocks keep the feature dim outermost and
    batch·sequence flattened minor — the memory layout XLA already picks
    around the flash kernel, but expressed as the logical shape so the dots
    avoid the output-batch-in-lanes emitters (up to 6× slower at SD's
    level-0 shapes, profiled in docs/PERFORMANCE.md). Param names/shapes are
    identical to ``nn.Dense`` (kernel ``[in, out]``, bias ``[out]``) so
    checkpoints, LoRA, and the converters are unaffected.
    """
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (x.shape[0], self.features))
        bias = (self.param('bias', nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        # [o, c] × [c, b·s] → [o, b·s]
        y = jax.lax.dot_general(kernel.T, x, (((1,), (0,)), ((), ())))
        if bias is not None:
            y = y + bias[:, None]
        return y


class Conv1x1CM(nn.Module):
    """1×1 conv as a channel-major boundary dot (the transformer's
    ``proj_in``/``proj_out``). Param names/shapes match ``nn.Conv(f, (1, 1))``
    — kernel ``[1, 1, C_in, C_out]``, bias ``[C_out]``.

    ``to_cm=True``: ``[B·S, C_in] → [C_out, B·S]`` (entry). ``to_cm=False``:
    ``[C_in, B·S] → [B·S, C_out]`` (exit) — computed as a fast channel-major
    dot plus one explicit relayout behind an optimization barrier: the
    barrier stops the simplifier folding the transpose back into the dot
    (which recreates the slow transposed-output emitter this path exists to
    avoid), and the standalone relayout fuses into the consumer-side
    residual add.
    """
    features: int
    to_cm: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1] if self.to_cm else x.shape[0]
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, in_ch, self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        w = kernel.reshape(in_ch, self.features)
        if self.to_cm:
            # [c, o] × [b·s, c] → [o, b·s]
            y = jax.lax.dot_general(w, x, (((0,), (1,)), ((), ())))
            return y + bias[:, None]
        # [o, c] × [c, b·s] → [o, b·s] (fast), then rotate to [b·s, o]
        y = jax.lax.dot_general(w.T, x, (((1,), (0,)), ((), ())))
        y = jax.lax.optimization_barrier(y + bias[:, None])
        return y.T


def timestep_embedding(t: Array, dim: int, max_period: float = 10000.0,
                       flip_sin_to_cos: bool = True,
                       shift: float = 0.0) -> Array:
    """Sinusoidal timestep features ``[B] -> [B, dim]`` (SD: cos|sin order)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / (half - shift))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos],
                          axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        in_ch = x.shape[-1]
        gn = lambda name: nn.GroupNorm(self.norm_groups, epsilon=1e-5,
                                       name=name, dtype=self.norm_dtype)
        conv = lambda name: nn.Conv(self.out_channels, (3, 3), padding=1,
                                    name=name, dtype=self.dtype)
        h = nn.silu(gn('norm1')(x)).astype(self.dtype)
        h = conv('conv1')(h)
        t = nn.Dense(self.out_channels, name='time_emb_proj',
                     dtype=self.dtype)(nn.silu(temb).astype(self.dtype))
        h = h + t[:, None, None, :]
        h = nn.silu(gn('norm2')(h)).astype(self.dtype)
        h = conv('conv2')(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name='conv_shortcut',
                        dtype=self.dtype)(x.astype(self.dtype))
        return x + h


class LayerNormCM(nn.Module):
    """LayerNorm over **channel-major** ``[C, B·S]`` activations with
    MXU-matmul statistics.

    XLA lowers the axis-0 (sublane-tiled) reduction of
    ``nn.LayerNorm(reduction_axes=0)`` to convert+square+tree-reduce VPU
    fusions measured at ~5× memory roofline (71 µs per [1280, 2048] norm —
    12.9 ms/step across SDXL's 180 level-2 norms, tools/profile_scan.py
    SDXL=1). Here the sums ride the MXU instead: ``Σx = 1ᵀ·x`` and
    ``Σx² = 1ᵀ·(x∘x)`` as two [1, C] × [C, B·S] dots with fp32
    accumulation (the elementwise square fuses into the second dot's
    operand), leaving the VPU only the fusable normalize pass. Param
    names/shapes match ``nn.LayerNorm`` ('scale'/'bias', [C]) so the two
    are interchangeable in the checkpoint tree. ``LNCM=xla`` reverts to
    the flax reduction (A/B knob, tools/sdxl_exp.py).

    Measured honestly: on SDXL's level-2 the per-norm win is real in the
    convert_reduce bucket (13.9 → 9.1 ms/step) but XLA moves the
    convert/square passes into the new dot fusions — end-to-end neutral
    there (that level now runs standard orientation anyway, see
    ``UNetConfig.cm_min_seq``); at SD-1.4's final config it is +0.2%
    (59.35 vs 59.21 steps/s, within noise). Kept as the default for the
    marginal edge and because the stat dots expose the LN to the MXU
    scheduler rather than serializing a VPU tree-reduce between dots.
    """
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[0]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        x, scale, bias = nn.dtypes.promote_dtype(x, scale, bias,
                                                 dtype=self.dtype)
        ones = jnp.ones((1, c), x.dtype)
        dims = (((1,), (0,)), ((), ()))
        s1 = jax.lax.dot_general(ones, x, dims,
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(ones, x * x, dims,
                                 preferred_element_type=jnp.float32)
        mean = s1 / c
        var = jnp.maximum(s2 / c - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = (x.astype(jnp.float32) - mean) * inv
        y = y.astype(x.dtype) * scale[:, None] + bias[:, None]
        return y


def _ln_cm(name: str, dtype) -> nn.Module:
    """The channel-major LayerNorm the transformer blocks use — MXU-stat
    (:class:`LayerNormCM`) unless ``LNCM=xla`` asks for the flax axis-0
    reduction."""
    if os.environ.get('LNCM') == 'xla':
        return nn.LayerNorm(epsilon=1e-5, name=name, dtype=dtype,
                            reduction_axes=0, feature_axes=0)
    return LayerNormCM(epsilon=1e-5, name=name, dtype=dtype)


class CrossAttention(nn.Module):
    query_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    # IP-Adapter decoupled image-prompt attention (cross-attention only):
    # extra to_k_ip/to_v_ip projections attend over projected image tokens,
    # added to the text-attention output scaled by ``ip_scale``.
    ip_adapter: bool = False
    # Channel-major mode: x is [C, B·S] and all projections/attention stay
    # in that orientation (see DenseCM). Contexts remain [B, Skv, C_ctx] and
    # rotate once (tiny and loop-invariant). ``batch`` carries B (the head
    # split [H, D, B, S] is a pure bitcast of [C, B·S]).
    channel_major: bool = False

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array],
                 ip_ctx: Optional[Array] = None,
                 ip_scale: Array = 1.0, batch: int = 1,
                 pag_mask: Optional[Array] = None) -> Array:
        """``pag_mask`` (PAG, Ahn et al. 2024 — self-attention only): a
        ``[B]`` 0/1 row selector; rows with 1 replace the attention map
        with identity, whose pre-``to_out`` output is exactly ``v`` — a
        per-row ``where`` on tensors already computed, no extra FLOPs."""
        if self.channel_major:
            return self._call_cm(x, context, ip_ctx, ip_scale, batch,
                                 pag_mask)
        ctx = x if context is None else context.astype(self.dtype)
        d = self.query_dim
        h = self.num_heads
        hd = d // h
        q = nn.Dense(d, use_bias=False, name='to_q', dtype=self.dtype)(x)
        k = nn.Dense(d, use_bias=False, name='to_k', dtype=self.dtype)(ctx)
        v = nn.Dense(d, use_bias=False, name='to_v', dtype=self.dtype)(ctx)
        b, sq, _ = q.shape
        skv = k.shape[1]
        split = lambda t, s: t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        qh = split(q, sq)
        out = attention(qh, split(k, skv), split(v, skv), scale=hd**-0.5)
        if self.ip_adapter and context is not None and ip_ctx is not None:
            ip = ip_ctx.astype(self.dtype)
            k_ip = nn.Dense(d, use_bias=False, name='to_k_ip',
                            dtype=self.dtype)(ip)
            v_ip = nn.Dense(d, use_bias=False, name='to_v_ip',
                            dtype=self.dtype)(ip)
            s_ip = ip.shape[1]
            out_ip = attention(qh, split(k_ip, s_ip), split(v_ip, s_ip),
                               scale=hd**-0.5)
            out = out + jnp.asarray(ip_scale, out.dtype) * out_ip
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, d)
        if pag_mask is not None and context is None:
            out = jnp.where(pag_mask[:, None, None] > 0, v, out)
        return nn.Dense(d, name='to_out', dtype=self.dtype)(out)

    def _call_cm(self, x: Array, context: Optional[Array],
                 ip_ctx: Optional[Array], ip_scale: Array,
                 b: int, pag_mask: Optional[Array] = None) -> Array:
        """Channel-major forward: ``x [C, B·S] → [C, B·S]``; the head
        split/merge to ``[H, D, B, S]`` is a pure bitcast and the flash
        kernel consumes the operands as laid out."""
        d = self.query_dim
        h = self.num_heads
        hd = d // h
        dense = lambda name: DenseCM(d, use_bias=False, name=name,
                                     dtype=self.dtype)
        if context is None:
            src = x
            skv = x.shape[1] // b
        else:
            # [B, Skv, C_ctx] → [C_ctx, B·Skv]: tiny and loop-invariant.
            skv = context.shape[1]
            src = context.astype(self.dtype).transpose(2, 0, 1).reshape(
                context.shape[2], b * skv)
        q = dense('to_q')(x)
        k = dense('to_k')(src)
        v = dense('to_v')(src)
        sq = q.shape[1] // b
        split = lambda t, s: t.reshape(h, hd, b, s)
        qh = split(q, sq)
        out = attention_cm(qh, split(k, skv), split(v, skv), scale=hd**-0.5)
        if self.ip_adapter and context is not None and ip_ctx is not None:
            s_ip = ip_ctx.shape[1]
            ip = ip_ctx.astype(self.dtype).transpose(2, 0, 1).reshape(
                ip_ctx.shape[2], b * s_ip)
            k_ip = DenseCM(d, use_bias=False, name='to_k_ip',
                           dtype=self.dtype)(ip)
            v_ip = DenseCM(d, use_bias=False, name='to_v_ip',
                           dtype=self.dtype)(ip)
            out_ip = attention_cm(qh, split(k_ip, s_ip), split(v_ip, s_ip),
                                  scale=hd**-0.5)
            out = out + jnp.asarray(ip_scale, out.dtype) * out_ip
        out = out.reshape(d, b * sq)
        if pag_mask is not None and context is None:
            # [C, B·S] is b-major minor-flattened: expand the row mask.
            m = jnp.repeat(pag_mask, sq)
            out = jnp.where(m[None, :] > 0, v, out)
        return DenseCM(d, name='to_out', dtype=self.dtype)(out)


class FeedForwardGEGLU(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32
    channel_major: bool = False
    # tanh-approximated gelu: |Δ| ≤ 4.8e-4 absolute vs erf (measured over
    # a dense grid) — about one bf16 ulp of unit-scale activations and ~2 VPU-
    # transcendental passes cheaper. The GEGLU gelu is ~1.3 ms/step of pure
    # VPU time at SD-1.4 512² with erf (profiled); auto-enabled for bf16
    # compute on TPU, exact erf elsewhere (UNet2DCondition.approx_gelu).
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        inner = self.dim * 4
        if self.channel_major:  # x: [C, B·S]; feature dim is axis 0
            proj = DenseCM(inner * 2, name='proj_in', dtype=self.dtype)(x)
            gate, val = jnp.split(proj, 2, axis=0)
            x = gate * nn.gelu(val, approximate=self.approx_gelu)
            return DenseCM(self.dim, name='proj_out', dtype=self.dtype)(x)
        proj = nn.Dense(inner * 2, name='proj_in', dtype=self.dtype)(x)
        gate, val = jnp.split(proj, 2, axis=-1)
        # diffusers GEGLU order: (value, gate) with gelu on the gate half.
        x = gate * nn.gelu(val, approximate=self.approx_gelu)
        return nn.Dense(self.dim, name='proj_out', dtype=self.dtype)(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    ip_adapter: bool = False
    # Channel-major mode: activations flow as [C, B·S] through the whole
    # block (LayerNorm reduces over axis 0; params unchanged — [C] vectors).
    channel_major: bool = False
    approx_gelu: bool = False

    @nn.compact
    def __call__(self, x: Array, context: Array,
                 ip_ctx: Optional[Array] = None,
                 ip_scale: Array = 1.0, batch: int = 1,
                 tome_plan=None, pag_mask: Optional[Array] = None) -> Array:
        cm = self.channel_major
        if cm:
            ln = lambda name: _ln_cm(name, self.dtype)
        else:
            ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name,
                                           dtype=self.dtype)
        attn1 = CrossAttention(self.dim, self.num_heads, name='attn1',
                               dtype=self.dtype, channel_major=cm)
        if tome_plan is None:
            x = x + attn1(ln('norm1')(x), None, batch=batch,
                          pag_mask=pag_mask)
        else:
            # ToMe (ops/tome.py): self-attention runs on the merged token
            # set and the output is copied back — O((S−r)²) instead of
            # O(S²). Cross-attn and the MLP stay full-length (the tomesd
            # default; merging them trades quality for little win).
            from flexdiffuse_tpu.ops import tome as _tome
            xa = ln('norm1')(x)
            if cm:
                xa = _tome.merge_cm(xa, tome_plan, batch)
                x = x + _tome.unmerge_cm(attn1(xa, None, batch=batch,
                                               pag_mask=pag_mask),
                                         tome_plan, batch)
            else:
                xa = _tome.merge(xa, tome_plan)
                x = x + _tome.unmerge(attn1(xa, None, batch=batch,
                                            pag_mask=pag_mask),
                                      tome_plan)
        x = x + CrossAttention(self.dim, self.num_heads, name='attn2',
                               dtype=self.dtype, channel_major=cm,
                               ip_adapter=self.ip_adapter)(
                                   ln('norm2')(x), context, ip_ctx, ip_scale,
                                   batch=batch)
        x = x + FeedForwardGEGLU(self.dim, name='ff', dtype=self.dtype,
                                 channel_major=cm,
                                 approx_gelu=self.approx_gelu)(
                                     ln('norm3')(x))
        return x


class Transformer2D(nn.Module):
    channels: int
    num_heads: int
    depth: int
    norm_groups: int
    dtype: jnp.dtype = jnp.float32
    ip_adapter: bool = False
    # Channel-major interior: rotate into [C, B·S] at proj_in and back at
    # proj_out (the only two boundary rotations), so every dot between
    # them runs the standard MXU emitter and the flash kernel I/O needs no
    # relayout. Param tree identical to the standard path.
    channel_major: bool = False
    approx_gelu: bool = False
    cm_min_seq: int = CM_MIN_SEQ
    # ToMe (ops/tome.py): ``(ratio, min_seq)`` — merge ``ratio`` of the
    # spatial tokens before every self-attention when the grid has at
    # least ``min_seq`` tokens (i.e. only the big, attention-bound
    # levels). None = off. Static, like ``freeu``: toggling recompiles.
    tome: Optional[tuple] = None
    # PAG (Ahn et al. 2024): this transformer applies the perturbed-
    # attention row selector (see CrossAttention.pag_mask). Static — set
    # by the UNet from its ``pag_layers`` name patterns.
    pag: bool = False

    def _tome_plan(self, metric: Array, hh: int, ww: int):
        """Merge plan from the post-proj_in hidden state (shared by all
        ``depth`` blocks — one matching matmul per transformer; tomesd
        rebuilds per block only because it's a monkey-patch)."""
        from flexdiffuse_tpu.ops import tome as _tome
        ratio, min_seq = self.tome
        if hh * ww < max(int(min_seq), 2):
            return None
        r = _tome.resolve_r(hh, ww, float(ratio))
        if r <= 0:
            return None
        return _tome.merge_plan(metric, (hh, ww), r)

    @nn.compact
    def __call__(self, x: Array, context: Array,
                 ip_ctx: Optional[Array] = None,
                 ip_scale: Array = 1.0,
                 pag_mask: Optional[Array] = None) -> Array:
        b, hh, ww, c = x.shape
        pm = pag_mask if self.pag else None
        residual = x
        h = nn.GroupNorm(self.norm_groups, epsilon=1e-6, name='norm',
                         dtype=jnp.float32)(x).astype(self.dtype)
        if self.channel_major and hh * ww >= _cm_threshold(self.cm_min_seq):
            h = Conv1x1CM(self.channels, to_cm=True, name='proj_in',
                          dtype=self.dtype)(h.reshape(b * hh * ww, c))
            plan = None
            if self.tome is not None:
                from flexdiffuse_tpu.ops import tome as _tome
                plan = self._tome_plan(_tome.metric_from_cm(h, b), hh, ww)
            for i in range(self.depth):
                h = BasicTransformerBlock(self.channels, self.num_heads,
                                          name=f'blocks_{i}',
                                          dtype=self.dtype,
                                          channel_major=True,
                                          approx_gelu=self.approx_gelu,
                                          ip_adapter=self.ip_adapter)(
                                              h, context, ip_ctx, ip_scale,
                                              batch=b, tome_plan=plan,
                                              pag_mask=pm)
            h = Conv1x1CM(self.channels, to_cm=False, name='proj_out',
                          dtype=self.dtype)(h)
            return h.reshape(b, hh, ww, c) + residual
        h = nn.Conv(self.channels, (1, 1), name='proj_in',
                    dtype=self.dtype)(h)
        h = h.reshape(b, hh * ww, c)
        plan = self._tome_plan(h, hh, ww) if self.tome is not None else None
        for i in range(self.depth):
            h = BasicTransformerBlock(self.channels, self.num_heads,
                                      name=f'blocks_{i}',
                                      dtype=self.dtype,
                                      approx_gelu=self.approx_gelu,
                                      ip_adapter=self.ip_adapter)(
                                          h, context, ip_ctx, ip_scale,
                                          tome_plan=plan, pag_mask=pm)
        h = h.reshape(b, hh, ww, c)
        h = nn.Conv(self.channels, (1, 1), name='proj_out',
                    dtype=self.dtype)(h)
        return h + residual


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Conv(self.channels, (3, 3), strides=2, padding=1,
                       name='conv', dtype=self.dtype)(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        if os.environ.get('UPSAMPLE') == 'broadcast':  # tools/sdxl_exp.py A/B
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, 2, w, 2, c)).reshape(
                                     b, h * 2, w * 2, c)
        else:
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method='nearest')
        return nn.Conv(self.channels, (3, 3), padding=1, name='conv',
                       dtype=self.dtype)(x)


def fourier_filter(x: Array, threshold: int, scale: float) -> Array:
    """FreeU's low-frequency skip attenuation: 2-D FFT over the spatial
    plane, scale the ``threshold``-radius block around DC by ``scale``,
    inverse FFT (published FreeU formulation, NHWC here). fp32 compute —
    XLA lowers the FFT natively on TPU."""
    x32 = x.astype(jnp.float32)
    _, H, W, _ = x.shape
    xf = jnp.fft.fftshift(jnp.fft.fft2(x32, axes=(1, 2)), axes=(1, 2))
    mask = np.ones((1, H, W, 1), np.float32)
    cr, cc = H // 2, W // 2
    mask[:, max(cr - threshold, 0):cr + threshold,
         max(cc - threshold, 0):cc + threshold] = scale
    xf = xf * jnp.asarray(mask)
    out = jnp.fft.ifft2(jnp.fft.ifftshift(xf, axes=(1, 2)),
                        axes=(1, 2)).real
    return out.astype(x.dtype)


def guidance_scale_embedding(w: Array, dim: int) -> Array:
    """LCM guidance-scale embedding ``[B] -> [B, dim]`` (w is the
    *conditioning* scale, conventionally ``guidance_scale - 1``).

    Matches the diffusers ``get_guidance_scale_embedding`` formula the LCM
    checkpoints were distilled with: scale by 1000, then log-spaced
    sin|cos features (NOT the cos|sin ordering of the timestep sinusoid).
    """
    w = jnp.asarray(w, jnp.float32) * 1000.0
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / (half - 1))
    args = w.reshape(-1, 1) * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def embed_timestep(cfg: UNetConfig, t: Array, added_cond, dtype,
                   timestep_cond: Array = None) -> Array:
    """Timestep (+ SDXL text_time additional) embedding.

    A plain function called inside ``@nn.compact`` scopes — parameters are
    created in the caller's scope under the same names, so the UNet and the
    ControlNet (models/controlnet.py) share conversion rename rules.

    ``timestep_cond`` (LCM guidance embedding, ``[B, time_cond_proj_dim]``):
    projected bias-free and added to the sinusoidal features *before* the
    embedding MLP (HF ``TimestepEmbedding.cond_proj`` semantics).
    """
    ch0 = cfg.block_channels[0]
    temb_dim = ch0 * 4
    temb = timestep_embedding(t, ch0)
    if cfg.time_cond_proj_dim:
        assert timestep_cond is not None, (
            'this UNet config requires timestep_cond (the LCM guidance '
            'embedding, models/unet.py guidance_scale_embedding)')
        temb = temb + nn.Dense(ch0, use_bias=False, name='time_cond_proj',
                               dtype=jnp.float32)(
                                   timestep_cond.astype(jnp.float32))
    temb = nn.Dense(temb_dim, name='time_embed_1',
                    dtype=dtype)(temb.astype(dtype))
    temb = nn.Dense(temb_dim, name='time_embed_2', dtype=dtype)(nn.silu(temb))
    if cfg.addition_embed:
        assert added_cond is not None, (
            'this UNet config requires added_cond (text_embeds, time_ids)')
        b = added_cond['text_embeds'].shape[0]
        tid = added_cond['time_ids'].reshape(-1)
        tid_emb = timestep_embedding(tid, cfg.addition_time_embed_dim)
        tid_emb = tid_emb.reshape(b, -1)
        add = jnp.concatenate(
            [added_cond['text_embeds'].astype(jnp.float32), tid_emb],
            axis=-1).astype(dtype)
        add = nn.Dense(temb_dim, name='add_embed_1', dtype=dtype)(add)
        add = nn.Dense(temb_dim, name='add_embed_2', dtype=dtype)(
            nn.silu(add))
        temb = temb + add
    return temb


def resolve_channel_major(flag) -> bool:
    """``None`` → auto: channel-major transformer interiors on TPU (where
    the relayout economics are measured), standard elsewhere."""
    if flag is None:
        from flexdiffuse_tpu.utils.params import target_platform
        return target_platform() == 'tpu'
    return bool(flag)


def resolve_approx_gelu(flag, dtype) -> bool:
    """``None`` → auto: tanh-gelu for bf16 compute on TPU (|Δ| ≤ 4.8e-4
    absolute — about one bf16 ulp of unit-scale activations; ~1 ms/step of VPU erf time
    at SD-1.4 512², docs/PERFORMANCE.md), exact erf for fp32 / off-TPU."""
    if flag is None:
        from flexdiffuse_tpu.utils.params import target_platform
        return dtype == jnp.bfloat16 and target_platform() == 'tpu'
    return bool(flag)


def pag_selected(pag_layers, name: str) -> bool:
    """Static PAG layer selection: a pattern matches a transformer by name
    prefix — ``'mid'`` hits ``mid_attn``, ``'down_1'`` hits every
    ``down_1_attn_*``, a full name like ``'up_2_attn_1'`` hits exactly one.
    (The diffusers PAG pipelines use the same granularity; ``('mid',)`` is
    the published default.)"""
    return pag_layers is not None and any(
        name.startswith(p) for p in pag_layers)


def run_down_mid(cfg: UNetConfig, h: Array, temb: Array, context: Array,
                 dtype, norm_dtype, ip_ctx=None, ip_scale=1.0,
                 channel_major: bool = False, approx_gelu: bool = False,
                 tome=None, pag_layers=None, pag_mask=None):
    """The UNet's down + mid path; returns ``(h_mid, skip_states)``.

    Shared verbatim (blocks AND names) between :class:`UNet2DCondition` and
    the ControlNet's control branch — a single definition keeps the two from
    drifting and preserves the shared weight-conversion contract.
    """
    skips = [h]
    num_levels = len(cfg.block_channels)
    for i, ch in enumerate(cfg.block_channels):
        for j in range(cfg.layers_per_block):
            h = ResnetBlock(ch, cfg.norm_groups, dtype=dtype,
                            norm_dtype=norm_dtype,
                            name=f'down_{i}_res_{j}')(h, temb)
            if cfg.attention_levels[i]:
                name = f'down_{i}_attn_{j}'
                h = Transformer2D(ch, cfg.heads_for(ch), cfg.depth_at(i),
                                  cfg.norm_groups, dtype=dtype,
                                  ip_adapter=cfg.ip_adapter,
                                  channel_major=channel_major,
                                  approx_gelu=approx_gelu,
                                  cm_min_seq=cfg.cm_min_seq, tome=tome,
                                  pag=pag_selected(pag_layers, name),
                                  name=name)(
                                      h, context, ip_ctx, ip_scale,
                                      pag_mask=pag_mask)
            skips.append(h)
        if i != num_levels - 1:
            h = Downsample(ch, dtype=dtype,
                           name=f'down_{i}_downsample')(h)
            skips.append(h)

    mid_ch = cfg.block_channels[-1]
    h = ResnetBlock(mid_ch, cfg.norm_groups, dtype=dtype,
                    norm_dtype=norm_dtype, name='mid_res_0')(h, temb)
    h = Transformer2D(mid_ch, cfg.heads_for(mid_ch),
                      cfg.depth_mid(), cfg.norm_groups,
                      dtype=dtype, ip_adapter=cfg.ip_adapter,
                      channel_major=channel_major, approx_gelu=approx_gelu,
                      cm_min_seq=cfg.cm_min_seq, tome=tome,
                      pag=pag_selected(pag_layers, 'mid_attn'),
                      name='mid_attn')(h, context, ip_ctx, ip_scale,
                                       pag_mask=pag_mask)
    h = ResnetBlock(mid_ch, cfg.norm_groups, dtype=dtype,
                    norm_dtype=norm_dtype, name='mid_res_1')(h, temb)
    return h, skips


def run_down_shallow(cfg: UNetConfig, h: Array, temb: Array, context: Array,
                     dtype, norm_dtype, ip_ctx=None, ip_scale=1.0,
                     channel_major: bool = False, approx_gelu: bool = False,
                     depth: int = 1, tome=None, pag_layers=None,
                     pag_mask=None):
    """The first ``depth`` encoder levels only — the skip states a
    DeepCache shallow step needs (module names match :func:`run_down_mid`
    so both paths share weights). Level ``depth-1``'s downsample is skipped:
    its skip is consumed by a decoder level the cache replaces."""
    skips = [h]
    for i in range(depth):
        ch = cfg.block_channels[i]
        for j in range(cfg.layers_per_block):
            h = ResnetBlock(ch, cfg.norm_groups, dtype=dtype,
                            norm_dtype=norm_dtype,
                            name=f'down_{i}_res_{j}')(h, temb)
            if cfg.attention_levels[i]:
                name = f'down_{i}_attn_{j}'
                h = Transformer2D(ch, cfg.heads_for(ch), cfg.depth_at(i),
                                  cfg.norm_groups, dtype=dtype,
                                  ip_adapter=cfg.ip_adapter,
                                  channel_major=channel_major,
                                  approx_gelu=approx_gelu,
                                  cm_min_seq=cfg.cm_min_seq, tome=tome,
                                  pag=pag_selected(pag_layers, name),
                                  name=name)(
                                      h, context, ip_ctx, ip_scale,
                                      pag_mask=pag_mask)
            skips.append(h)
        if i < depth - 1:
            h = Downsample(ch, dtype=dtype,
                           name=f'down_{i}_downsample')(h)
            skips.append(h)
    return skips


def run_up(cfg: UNetConfig, h: Array, skips, temb: Array, context: Array,
           dtype, norm_dtype, ip_ctx=None, ip_scale=1.0,
           channel_major: bool = False, approx_gelu: bool = False,
           freeu=None, start_i: int = 0, capture_i=None, tome=None,
           pag_layers=None, pag_mask=None):
    """The UNet's decoder path from up level ``start_i``; optionally
    returns the hidden state entering level ``capture_i`` (i.e. after the
    preceding level's upsample) — the DeepCache splice point."""
    num_levels = len(cfg.block_channels)
    chans = list(reversed(cfg.block_channels))
    captured = None
    for i in range(start_i, num_levels):
        if capture_i is not None and i == capture_i:
            captured = h
        ch = chans[i]
        level = num_levels - 1 - i
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            if freeu is not None and i < 2:
                b, s = freeu[i], freeu[2 + i]
                half = h.shape[-1] // 2
                h = jnp.concatenate([h[..., :half] * b, h[..., half:]],
                                    axis=-1)
                skip = fourier_filter(skip, 1, s)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ResnetBlock(ch, cfg.norm_groups, dtype=dtype,
                            norm_dtype=norm_dtype,
                            name=f'up_{i}_res_{j}')(h, temb)
            if cfg.attention_levels[level]:
                name = f'up_{i}_attn_{j}'
                h = Transformer2D(ch, cfg.heads_for(ch),
                                  cfg.depth_at(level), cfg.norm_groups,
                                  dtype=dtype,
                                  ip_adapter=cfg.ip_adapter,
                                  channel_major=channel_major,
                                  approx_gelu=approx_gelu,
                                  cm_min_seq=cfg.cm_min_seq, tome=tome,
                                  pag=pag_selected(pag_layers, name),
                                  name=name)(
                                      h, context, ip_ctx, ip_scale,
                                      pag_mask=pag_mask)
        if i != num_levels - 1:
            h = Upsample(ch, dtype=dtype, name=f'up_{i}_upsample')(h)
    return h, captured


class UNet2DCondition(nn.Module):
    """``(latents [B,H,W,4], t [B], context [B,T,768]) -> eps [B,H,W,4]``."""

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    # Normalization compute dtype; fp32 by default for stat stability.
    norm_dtype: jnp.dtype = jnp.float32
    # Transformer-interior orientation (see Transformer2D.channel_major):
    # None → auto (channel-major on TPU, standard elsewhere). FlexPipeline
    # forces False under sequence parallelism (the SP GSPMD/ring rules are
    # written for the standard orientation).
    channel_major: Optional[bool] = None
    # GEGLU gelu flavor: None → auto (tanh approximation for bf16-on-TPU,
    # exact erf otherwise); see resolve_approx_gelu.
    approx_gelu: Optional[bool] = None
    # FreeU (b1, b2, s1, s2): amplify the backbone's first half-channels and
    # Fourier-attenuate the skips at the two deepest decoder levels
    # (published FreeU recipe; SD1.x defaults 1.5/1.6/0.9/0.2). None = off.
    # A static module attribute — toggle via Runner.enable_freeu (clone +
    # recompile), keeping the scan body free of dead branches.
    freeu: Optional[tuple] = None
    # ToMe token merging (Bolya & Hoffman 2023, ops/tome.py): ``(ratio,
    # min_seq)`` — before every self-attention on a grid of ≥ min_seq
    # tokens, ``ratio`` of the spatial tokens merge into their most-similar
    # neighbours; attention runs on the reduced set and the output is
    # copied back. A compute approximation (no bit-parity target) for the
    # attention-bound big canvases. Static, like ``freeu``: toggle via
    # Runner.enable_tome (clone + recompile). None = off.
    tome: Optional[tuple] = None
    # PAG perturbed layers (Ahn et al. 2024, "Self-Rectifying Diffusion
    # Sampling with Perturbed-Attention Guidance"): name-prefix patterns
    # (see pag_selected) of the transformers whose self-attention turns
    # into identity on rows where the traced ``pag_mask`` input is 1.
    # ('mid',) is the published default. Static, like ``freeu``: toggle
    # via Runner.enable_pag (clone + recompile). None = off.
    pag_layers: Optional[tuple] = None

    @nn.compact
    def __call__(self, latents: Array, t: Array, context: Array,
                 added_cond=None, control=None, ip_ctx=None,
                 ip_scale=1.0, timestep_cond=None, deep_cache=None,
                 cache_mode: str = 'off', pag_mask: Optional[Array] = None):
        """``added_cond`` (SDXL text_time conditioning): dict with
        ``text_embeds [B, pooled_dim]`` and ``time_ids [B, 6]`` — pooled
        second-encoder embeddings plus size/crop micro-conditioning.
        ``control`` (ControlNet): ``(down_residuals, mid_residual)`` added
        onto the saved skip states and the mid output
        (models/controlnet.py). ``timestep_cond``: LCM guidance embedding
        ``[B, cfg.time_cond_proj_dim]`` (see guidance_scale_embedding).

        DeepCache (Ma et al. 2023 — beyond-reference accelerator):
        ``cache_mode='save'`` runs the full UNet and ALSO returns the
        hidden state entering the shallowest ``cache_depth`` decoder
        levels; ``cache_mode='use'`` takes that state as ``deep_cache``,
        recomputes only the shallow encoder/decoder levels and splices the
        cache in place of the deep path (mid + deep levels skipped). A
        'use' call with a cache saved at the same (latents, t) is
        bit-identical to the full forward — drift comes only from *reusing*
        a cache across steps."""
        cfg = self.config
        cm = resolve_channel_major(self.channel_major)
        ag = resolve_approx_gelu(self.approx_gelu, self.dtype)
        temb = embed_timestep(cfg, t, added_cond, self.dtype, timestep_cond)
        num_levels = len(cfg.block_channels)
        depth = cfg.cache_depth
        if not 1 <= depth < num_levels:
            raise ValueError(f'cache_depth {depth} must be in '
                             f'[1, {num_levels - 1}]')

        x = latents.astype(self.dtype)
        h = nn.Conv(cfg.block_channels[0], (3, 3), padding=1, name='conv_in',
                    dtype=self.dtype)(x)

        if cache_mode == 'use':
            if deep_cache is None:
                raise ValueError("cache_mode='use' requires deep_cache")
            skips = run_down_shallow(cfg, h, temb, context, self.dtype,
                                     self.norm_dtype, ip_ctx, ip_scale,
                                     channel_major=cm, approx_gelu=ag,
                                     depth=depth, tome=self.tome,
                                     pag_layers=self.pag_layers,
                                     pag_mask=pag_mask)
            if control is not None:
                down_res, _ = control
                skips = [s + r.astype(s.dtype)
                         for s, r in zip(skips, down_res)]
            h, _ = run_up(cfg, deep_cache.astype(self.dtype), skips, temb,
                          context, self.dtype, self.norm_dtype, ip_ctx,
                          ip_scale, channel_major=cm, approx_gelu=ag,
                          freeu=self.freeu, start_i=num_levels - depth,
                          tome=self.tome, pag_layers=self.pag_layers,
                          pag_mask=pag_mask)
            captured = deep_cache
        else:
            h, skips = run_down_mid(cfg, h, temb, context, self.dtype,
                                    self.norm_dtype, ip_ctx, ip_scale,
                                    channel_major=cm, approx_gelu=ag,
                                    tome=self.tome,
                                    pag_layers=self.pag_layers,
                                    pag_mask=pag_mask)
            if control is not None:
                down_res, mid_res = control
                if len(down_res) != len(skips):
                    raise ValueError(
                        f'control provides {len(down_res)} down residuals '
                        f'but the UNet has {len(skips)} skip states — '
                        'mismatched ControlNet geometry')
                skips = [s + r.astype(s.dtype)
                         for s, r in zip(skips, down_res)]
                h = h + mid_res.astype(h.dtype)
            h, captured = run_up(cfg, h, skips, temb, context, self.dtype,
                                 self.norm_dtype, ip_ctx, ip_scale,
                                 channel_major=cm, approx_gelu=ag,
                                 freeu=self.freeu, tome=self.tome,
                                 pag_layers=self.pag_layers,
                                 pag_mask=pag_mask,
                                 capture_i=(num_levels - depth
                                            if cache_mode == 'save'
                                            else None))

        h = nn.silu(
            nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name='norm_out',
                         dtype=jnp.float32)(h))
        eps = nn.Conv(cfg.out_channels, (3, 3), padding=1, name='conv_out',
                      dtype=self.dtype)(h.astype(self.dtype)).astype(
                          jnp.float32)
        if cache_mode == 'off':
            return eps
        return eps, captured
