"""Textual-inversion training — learn new concept tokens from images.

The third classic SD fine-tuning mode (after full and LoRA): only ``n``
new rows of the text encoder's token-embedding table train; the UNet, VAE,
and every existing embedding row are frozen. TPU-native shape:

* the trainable state is just the ``[n, d]`` rows — the step patches them
  into a ``stop_grad`` copy of the full table with one
  ``dynamic_update_slice`` and differentiates through the text encoder
  into the UNet's denoising loss, all inside ONE jitted program;
* prompts come from the published TI template set ("a photo of a {}", …)
  with the placeholder expanded to its ``n`` consecutive ids — token ids
  are precomputed per template, so the loop samples ``(latents, ids)``
  rows with zero host work per step;
* trained rows export in the diffusers single-tensor convention
  (``{placeholder: [n, d]}`` safetensors), loadable straight back through
  ``Runner.load_textual_inversion`` (weights/textual_inversion.py).

Published formulation: Gal et al. 2022, "An Image is Worth One Word".
"""
from __future__ import annotations

import logging
import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.training import train as _train
from flexdiffuse_tpu.training.data import encode_images
from flexdiffuse_tpu.config import LATENT_SCALE

Array = jax.Array
log = logging.getLogger(__name__)

# The "imagenet_templates_small" set the TI paper trains object concepts
# with (style concepts conventionally swap "photo" → "painting in the
# style"; pass templates= to override).
OBJECT_TEMPLATES = (
    'a photo of a {}',
    'a rendering of a {}',
    'a cropped photo of the {}',
    'the photo of a {}',
    'a photo of a clean {}',
    'a photo of a dirty {}',
    'a dark photo of the {}',
    'a photo of my {}',
    'a photo of the cool {}',
    'a close-up photo of a {}',
    'a bright photo of the {}',
    'a cropped photo of a {}',
    'a photo of the {}',
    'a good photo of the {}',
    'a photo of one {}',
    'a close-up photo of the {}',
    'a rendition of the {}',
    'a photo of the clean {}',
    'a rendition of a {}',
    'a photo of a nice {}',
    'a good photo of a {}',
    'a photo of the nice {}',
    'a photo of the small {}',
    'a photo of the weird {}',
    'a photo of the large {}',
    'a photo of a cool {}',
    'a photo of a small {}',
)

STYLE_TEMPLATES = (
    'a painting in the style of {}',
    'a rendering in the style of {}',
    'a cropped painting in the style of {}',
    'the painting in the style of {}',
    'a clean painting in the style of {}',
    'a picture in the style of {}',
    'a cool painting in the style of {}',
    'a close-up painting in the style of {}',
    'a bright painting in the style of {}',
    'a good painting in the style of {}',
    'a rendition in the style of {}',
    'a nice painting in the style of {}',
    'a small painting in the style of {}',
    'a weird painting in the style of {}',
    'a large painting in the style of {}',
)


def init_rows(text_params, tokenizer, initializer_token: Optional[str],
              num_vectors: int, key: Array) -> Array:
    """Initial ``[n, d]`` rows: copies of the initializer token's embedding
    (the paper's coarse-prior init) or 0.01·N(0,1) without one."""
    root = text_params['params'] if 'params' in text_params else text_params
    table = jnp.asarray(root['token_embedding']['embedding'], jnp.float32)
    if initializer_token:
        ids = tokenizer.encode(initializer_token)
        if len(ids) != 1:
            raise ValueError(
                f'initializer_token {initializer_token!r} must be a single '
                f'token (got {len(ids)})')
        return jnp.broadcast_to(table[ids[0]],
                                (num_vectors, table.shape[1]))
    return 0.01 * jax.random.normal(key, (num_vectors, table.shape[1]),
                                    jnp.float32)


def template_ids(tokenizer, placeholder: str,
                 templates: Sequence[str]) -> np.ndarray:
    """``[T, 77]`` token-id rows, one per template with the placeholder
    (already registered via ``tokenizer.add_tokens``) filled in."""
    return np.asarray(tokenizer([t.format(placeholder) for t in templates]))


def make_ti_train_step(text_model, text_params, unet, unet_params,
                       cfg: _train.TrainConfig, row_start: int):
    """``step(rows, opt_state, latents, ids, key) -> (rows, opt_state,
    loss)``: rows are the ``[n, d]`` trainable embedding vectors living at
    table rows ``row_start:row_start+n``; everything else is frozen."""
    tx = _train.make_optimizer(cfg)
    acp = _train._schedule_tables(cfg)
    has_wrapper = 'params' in text_params
    unet_apply = _train._remat_apply(unet.apply, cfg)

    def _patch(tparams, rows):
        root = tparams['params'] if has_wrapper else tparams
        emb = root['token_embedding']['embedding']
        table = jax.lax.dynamic_update_slice(
            emb.astype(jnp.float32), rows.astype(jnp.float32),
            (row_start, 0)).astype(emb.dtype)
        root = dict(root, token_embedding=dict(root['token_embedding'],
                                               embedding=table))
        return {'params': root} if has_wrapper else root

    # Frozen trees ride as jit ARGUMENTS (closed-over device trees are
    # captured as multi-GB module constants at real geometry).
    def step(tparams, uparams, rows, opt_state, latents, ids, key):
        tparams = jax.lax.stop_gradient(tparams)
        uparams = jax.lax.stop_gradient(uparams)

        def loss_fn(r):
            ctx = text_model.apply(_patch(tparams, r), ids)
            return _train.diffusion_loss(
                lambda _p, noisy, t, c: unet_apply(uparams, noisy, t, c),
                None, latents, ctx, key, acp, cfg)

        loss, grads = jax.value_and_grad(loss_fn)(rows)
        updates, opt_state = tx.update(grads, opt_state, rows)
        rows = jax.tree_util.tree_map(lambda a, b: a + b, rows, updates)
        return rows, opt_state, loss

    jitted = jax.jit(step, donate_argnums=(2, 3) if cfg.donate else ())

    def public_step(rows, opt_state, latents, ids, key):
        return jitted(text_params, unet_params, rows, opt_state, latents,
                      ids, key)

    return public_step, tx


def train_textual_inversion(
        text_model, text_params, tokenizer, unet, unet_params, vae,
        vae_params, image_paths: Sequence[str], placeholder: str,
        initializer_token: Optional[str] = None, num_vectors: int = 1,
        templates: Sequence[str] = OBJECT_TEMPLATES,
        cfg: Optional[_train.TrainConfig] = None, steps: int = 1000,
        batch_size: int = 4, resolution: int = 512,
        key: Optional[Array] = None, save_path: Optional[str] = None,
        log_every: int = 25) -> Tuple[np.ndarray, List[float]]:
    """End-to-end TI run: registers ``placeholder`` (mutates the tokenizer),
    encodes the images once, trains the rows, optionally saves the
    embedding. Returns ``(rows [n, d], loss_history)``.

    Note the text model must be rebuilt for the grown vocab to USE the
    result at inference — ``Runner.load_textual_inversion(save_path)``
    does exactly that.
    """
    cfg = cfg or _train.TrainConfig(learning_rate=5e-4, weight_decay=0.0)
    key = key if key is not None else jax.random.PRNGKey(0)
    init_key, data_key, step_key = jax.random.split(key, 3)

    root = text_params['params'] if 'params' in text_params else text_params
    row_start = int(root['token_embedding']['embedding'].shape[0])
    ids_new = tokenizer.add_tokens(placeholder, num_vectors=num_vectors)
    if ids_new[0] != row_start:
        raise ValueError(f'tokenizer id space ({ids_new[0]}) out of sync '
                         f'with the embedding table ({row_start} rows)')
    rows = init_rows(text_params, tokenizer, initializer_token, num_vectors,
                     init_key)
    # Grow the FROZEN table by the initial rows so the new ids resolve;
    # the step overwrites those rows with the live ones each call.
    import dataclasses
    has_wrapper = 'params' in text_params
    tree = jax.tree_util.tree_map(lambda x: x, text_params)  # shallow copy
    troot = dict(tree['params'] if has_wrapper else tree)
    emb = np.asarray(troot['token_embedding']['embedding'])
    troot['token_embedding'] = dict(
        troot['token_embedding'],
        embedding=np.concatenate([emb, np.asarray(rows, emb.dtype)]))
    text_params = {'params': troot} if has_wrapper else troot
    text_model = type(text_model)(
        dataclasses.replace(text_model.config,
                            vocab_size=row_start + num_vectors),
        dtype=text_model.dtype)

    mean, logvar = encode_images(image_paths, vae, vae_params, resolution)
    tmpl = jnp.asarray(template_ids(tokenizer, placeholder, templates))

    step_fn, tx = make_ti_train_step(text_model, text_params, unet,
                                     unet_params, cfg, row_start)
    opt_state = tx.init(rows)

    sample = jax.jit(
        lambda ii, ti, k: (
            (jnp.take(mean, ii, axis=0) +
             jnp.exp(0.5 * jnp.take(logvar, ii, axis=0)) *
             jax.random.normal(k, (ii.shape[0],) + mean.shape[1:],
                               jnp.float32)) * LATENT_SCALE,
            jnp.take(tmpl, ti, axis=0)))

    n_img, n_tmpl = mean.shape[0], tmpl.shape[0]
    losses: List[float] = []
    t0 = time.monotonic()
    log.info('textual inversion %r: %d vector(s), %d images, %d steps',
             placeholder, num_vectors, n_img, steps)
    for i in range(steps):
        data_key, ki, kt, kn = jax.random.split(data_key, 4)
        ii = jax.random.randint(ki, (batch_size,), 0, n_img)
        ti = jax.random.randint(kt, (batch_size,), 0, n_tmpl)
        latents, ids = sample(ii, ti, kn)
        step_key, k = jax.random.split(step_key)
        rows, opt_state, loss = step_fn(rows, opt_state, latents, ids, k)
        if log_every and (i % log_every == 0 or i == steps - 1):
            val = float(loss)
            losses.append(val)
            log.info('step %d/%d  loss %.5f  (%.2f steps/s)', i + 1, steps,
                     val, (i + 1) / max(time.monotonic() - t0, 1e-6))
    rows_np = np.asarray(rows, np.float32)
    if save_path:
        from safetensors.numpy import save_file
        # Single-tensor diffusers convention keyed by the placeholder —
        # weights/textual_inversion.extract_embedding recovers both.
        save_file({placeholder: rows_np}, save_path)
        log.info('wrote %d-vector embedding %r to %s', num_vectors,
                 placeholder, save_path)
    return rows_np, losses
