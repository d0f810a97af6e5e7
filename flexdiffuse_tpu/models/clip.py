"""CLIP text + vision towers in Flax linen (TPU-native, weight-compatible
with ``openai/clip-vit-large-patch14``).

Replaces the HF torch ``CLIPModel`` the reference wraps (encode/clip.py:42-100).
Architecture notes:

* pre-LN transformer blocks with quick-GELU MLPs, per OpenAI CLIP;
* the text tower applies a causal mask and a final layer norm — the reference
  consumes ``text_model(...)[0]`` (the post-LN last hidden state,
  encode/clip.py:64-65), which :meth:`CLIPTextModel.__call__` returns;
* the vision tower exposes the reference's *nonstandard* all-patch path
  (encode/clip.py:86-100): embeddings → pre-layernorm → encoder →
  ``post_layernorm`` over **all 257 tokens** → ``visual_projection`` to the
  text width, yielding per-patch embeddings comparable with text tokens.

Attention uses one fused QKV-shaped einsum path sized for the MXU; sequence
lengths here are tiny (77 / 257) so flash attention is unnecessary — XLA
fuses these fine. Param names are chosen 1:1 with HF checkpoints so
``weights/convert.py`` is a pure rename.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from flexdiffuse_tpu.models.configs import CLIPTextConfig, CLIPVisionConfig

Array = jax.Array


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array]) -> Array:
        d = self.hidden_size
        h = self.num_heads
        hd = d // h
        dense = lambda name: nn.Dense(d, name=name, dtype=x.dtype)
        q = dense('q_proj')(x) * (hd**-0.5)
        k = dense('k_proj')(x)
        v = dense('v_proj')(x)
        b, s, _ = x.shape
        split = lambda t: t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, d)
        return dense('out_proj')(out)


class CLIPMLP(nn.Module):
    hidden_size: int
    intermediate_size: int
    activation: str = 'quick_gelu'

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.intermediate_size, name='fc1', dtype=x.dtype)(x)
        x = quick_gelu(x) if self.activation == 'quick_gelu' else nn.gelu(
            x, approximate=False)
        return nn.Dense(self.hidden_size, name='fc2', dtype=x.dtype)(x)


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    activation: str = 'quick_gelu'

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array]) -> Array:
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, name=name, dtype=x.dtype)
        x = x + CLIPAttention(self.hidden_size, self.num_heads,
                              name='self_attn')(ln('layer_norm1')(x), mask)
        x = x + CLIPMLP(self.hidden_size, self.intermediate_size,
                        activation=self.activation,
                        name='mlp')(ln('layer_norm2')(x))
        return x


class CLIPEncoder(nn.Module):
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    activation: str = 'quick_gelu'

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array],
                 stop_at: int = 0) -> "Array | tuple":
        """Runs all layers; also returns the hidden state ``stop_at`` layers
        before the end (the CLIP-skip / penultimate tap SDXL conditions on)
        when ``stop_at > 0``."""
        tapped = None
        for i in range(self.num_layers):
            if stop_at and i == self.num_layers - stop_at:
                tapped = x
            x = CLIPEncoderLayer(self.hidden_size, self.num_heads,
                                 self.intermediate_size,
                                 activation=self.activation,
                                 name=f'layers_{i}')(x, mask)
        if stop_at:
            return x, tapped
        return x


class CLIPTextModel(nn.Module):
    """Text tower; returns the final-LN last hidden state ``[B, T, D]``."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: Array, output: str = 'final'):
        """``output``: 'final' → post-LN last hidden state (SD1.x path,
        reference encode/clip.py:64-65); 'penultimate' → the hidden state one
        layer before the end, un-normalized (SDXL conditioning);
        'penultimate_norm' → the same tapped state with ``final_layer_norm``
        applied — the diffusers/A1111 ``clip_skip`` convention for SD1.x
        checkpoints fine-tuned against normalized penultimate conditioning;
        'penultimate_and_pooled' → ``(penultimate, pooled_projection)`` where
        pooled is the EOS-position final state through ``text_projection``.
        """
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       name='token_embedding', dtype=self.dtype)(input_ids)
        pos = self.param('position_embedding',
                         nn.initializers.normal(0.01),
                         (cfg.max_positions, cfg.hidden_size))
        x = tok + pos[None, :t].astype(self.dtype)
        causal = jnp.triu(
            jnp.full((t, t), jnp.finfo(jnp.float32).min), k=1)[None, None]
        enc = CLIPEncoder(cfg.hidden_size, cfg.num_layers, cfg.num_heads,
                          cfg.intermediate_size, activation=cfg.activation,
                          name='encoder')
        if output == 'final':
            x = enc(x, causal)
            return nn.LayerNorm(epsilon=1e-5, name='final_layer_norm',
                                dtype=self.dtype)(x)
        x, penult = enc(x, causal, stop_at=1)
        if output == 'penultimate':
            return penult
        if output == 'penultimate_norm':
            return nn.LayerNorm(epsilon=1e-5, name='final_layer_norm',
                                dtype=self.dtype)(penult)
        assert output == 'penultimate_and_pooled'
        final = nn.LayerNorm(epsilon=1e-5, name='final_layer_norm',
                             dtype=self.dtype)(x)
        # EOS pooling: first position whose id equals EOS. (HF's original
        # ids.argmax() breaks once textual-inversion tokens are allocated
        # above the EOS id — same fix as transformers' eos-match pooling.)
        eos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = final[jnp.arange(b), eos]
        pooled = nn.Dense(cfg.projection_dim, use_bias=False,
                          name='text_projection', dtype=self.dtype)(pooled)
        return penult, pooled


class CLIPVisionModel(nn.Module):
    """Vision tower with the reference's all-patch projection path.

    ``__call__(pixels [B, H, W, 3]) -> [B, 1+P, projection_dim]`` — NHWC
    (TPU-native layout; the conv patchifier maps onto the MXU).
    """

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: Array, output: str = 'patches') -> Array:
        """``output='patches'``: the reference's all-token post-LN +
        projection path ``[B, 257, proj]``. ``output='pooled'``: the
        standard CLS-pooled projected embedding ``[B, proj]`` (what the
        base IP-Adapter's image encoder produces). ``output='penultimate'``:
        the second-to-last layer's hidden states ``[B, 1+P, hidden]``, no
        post-LN/projection (HF ``hidden_states[-2]`` — what IP-Adapter
        Plus feeds its perceiver Resampler)."""
        cfg = self.config
        b = pixels.shape[0]
        patches = nn.Conv(cfg.hidden_size,
                          kernel_size=(cfg.patch_size, cfg.patch_size),
                          strides=(cfg.patch_size, cfg.patch_size),
                          use_bias=False, name='patch_embedding',
                          dtype=self.dtype)(pixels.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param('class_embedding', nn.initializers.normal(0.01),
                         (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls.astype(self.dtype),
                               (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param('position_embedding', nn.initializers.normal(0.01),
                         (cfg.num_positions, cfg.hidden_size))
        x = x + pos[None].astype(self.dtype)
        # HF spells it 'pre_layrnorm' (sic); we keep a clean name and map it
        # in the weight converter.
        x = nn.LayerNorm(epsilon=1e-5, name='pre_layernorm',
                         dtype=self.dtype)(x)
        encoder = CLIPEncoder(cfg.hidden_size, cfg.num_layers,
                              cfg.num_heads, cfg.intermediate_size,
                              name='encoder')
        if output == 'penultimate':
            _, tapped = encoder(x, None, stop_at=1)
            return tapped
        x = encoder(x, None)
        # Reference quirk (encode/clip.py:96-100): post-LN + projection over
        # ALL tokens, not just the pooled class token.
        x = nn.LayerNorm(epsilon=1e-5, name='post_layernorm',
                         dtype=self.dtype)(x if output == 'patches'
                                           else x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False,
                        name='visual_projection', dtype=self.dtype)(x)
