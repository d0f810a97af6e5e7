"""Training data: folder-of-images datasets, precomputed on-device encodings.

TPU-native shape of the problem: the hot loop must be one jitted step over
static shapes, so ALL encoding happens up front — images are VAE-encoded
(posterior mean/logvar kept, fresh samples drawn per batch) and captions
CLIP-encoded once, in jitted batches, and the training loop just gathers
shuffled rows out of two device arrays. No host↔device traffic per step.

Dataset layout (kohya/diffusers folder conventions):

* ``<dir>/*.png|jpg|jpeg|webp|bmp`` with a same-stem ``.txt`` caption
  sidecar, OR
* ``<dir>/metadata.jsonl`` lines ``{"file_name": ..., "text": ...}``, OR
* no captions at all → every image uses ``default_caption`` (DreamBooth
  single-concept style).
"""
from __future__ import annotations

import json
import logging
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from flexdiffuse_tpu.config import LATENT_SCALE

Array = jax.Array
log = logging.getLogger(__name__)

IMAGE_EXTS = ('.png', '.jpg', '.jpeg', '.webp', '.bmp')


def find_items(data_dir: str,
               default_caption: str = '') -> List[Tuple[str, str]]:
    """``[(image_path, caption)]`` for a dataset folder (see module doc)."""
    if not os.path.isdir(data_dir):
        raise ValueError(f'not a dataset directory: {data_dir!r}')
    meta = {}
    meta_path = os.path.join(data_dir, 'metadata.jsonl')
    if os.path.exists(meta_path):
        with open(meta_path, encoding='utf-8') as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                meta[row['file_name']] = row.get('text', default_caption)
    items: List[Tuple[str, str]] = []
    for name in sorted(os.listdir(data_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in IMAGE_EXTS:
            continue
        path = os.path.join(data_dir, name)
        txt = os.path.join(data_dir, stem + '.txt')
        if name in meta:
            caption = meta[name]
        elif os.path.exists(txt):
            with open(txt, encoding='utf-8') as f:
                caption = f.read().strip()
        else:
            caption = default_caption
        items.append((path, caption))
    if not items:
        raise ValueError(f'no images found under {data_dir!r} '
                         f'(looked for {", ".join(IMAGE_EXTS)})')
    return items


def load_pixels(path: str, resolution: int) -> np.ndarray:
    """Image file → ``[H, W, 3]`` float32 in [-1, 1], center-cropped to a
    square and resized to ``resolution`` (the standard SD training crop)."""
    img = Image.open(path).convert('RGB')
    w, h = img.size
    side = min(w, h)
    img = img.crop(((w - side) // 2, (h - side) // 2,
                    (w - side) // 2 + side, (h - side) // 2 + side))
    img = img.resize((resolution, resolution), Image.LANCZOS)
    return np.asarray(img, np.float32) / 127.5 - 1.0


class EncodedDataset:
    """Precomputed VAE posteriors + text contexts, resident on device.

    ``mean``/``logvar``: ``[N, h, w, 4]`` fp32 (pre-scale); ``context``:
    ``[N, 77·k, D]`` fp32. ``batches`` draws shuffled rows and samples the
    posterior fresh each time (the latent-caching convention that doesn't
    bake one noise draw into the whole run), pre-scaled by ``LATENT_SCALE``
    — ready for :func:`flexdiffuse_tpu.training.diffusion_loss`.
    """

    def __init__(self, mean: Array, logvar: Array, context: Array,
                 captions: Sequence[str], pooled: Optional[Array] = None,
                 time_ids: Optional[Array] = None):
        if not (mean.shape[0] == logvar.shape[0] == context.shape[0]):
            raise ValueError('row-count mismatch between latents and context')
        if pooled is not None and pooled.shape[0] != mean.shape[0]:
            raise ValueError('row-count mismatch on pooled embeds')
        self.mean = mean
        self.logvar = logvar
        self.context = context
        self.captions = list(captions)
        # SDXL conditioning: per-row pooled second-encoder embeds plus the
        # dataset-constant micro-conditioning ids ([1, 6], models/sdxl.py
        # time_ids). When set, batches yield a third element — the
        # ``added_cond`` dict the SDXL UNet takes.
        self.pooled = pooled
        self.time_ids = time_ids

    def __len__(self) -> int:
        return int(self.mean.shape[0])

    def batches(self, batch_size: int, key: Array,
                skip: int = 0) -> Iterator[Tuple[Array, ...]]:
        """Infinite shuffled ``(latents, context[, added_cond])`` batches
        (drop-last; datasets smaller than ``batch_size`` sample with
        replacement). The third element appears only for SDXL datasets
        (``pooled`` set): ``{'text_embeds': [B, D], 'time_ids': [B, 6]}``.

        ``skip`` fast-forwards the stream past its first ``skip`` batches
        (checkpoint resume, training/checkpoint.py): the stream is a pure
        function of ``key``, so whole skipped epochs replay only the
        key-split chain (one jitted ``fori_loop``, no sample compute) and
        ``batches(bs, k, skip=s)`` yields exactly what the ``s``-th
        ``next()`` of ``batches(bs, k)`` would.
        """
        n = len(self)
        sdxl = self.pooled is not None

        def _sample(idx, k):
            lat = ((jnp.take(self.mean, idx, axis=0) +
                    jnp.exp(0.5 * jnp.take(self.logvar, idx, axis=0)) *
                    jax.random.normal(
                        k, (idx.shape[0],) + self.mean.shape[1:],
                        jnp.float32)) * LATENT_SCALE)
            ctx = jnp.take(self.context, idx, axis=0)
            if not sdxl:
                return lat, ctx
            added = {
                'text_embeds': jnp.take(self.pooled, idx, axis=0),
                'time_ids': jnp.broadcast_to(
                    self.time_ids, (idx.shape[0], self.time_ids.shape[-1])),
            }
            return lat, ctx, added

        sample = jax.jit(_sample)
        order_len = batch_size if n < batch_size else n
        per_epoch = len(range(0, max(order_len - batch_size + 1, 1),
                              batch_size))
        full_epochs, rem = divmod(max(skip, 0), per_epoch)
        epoch_key = key
        if full_epochs:
            # Each epoch consumes 1 (perm) + per_epoch (draws) splits.
            epoch_key = jax.jit(lambda k: jax.lax.fori_loop(
                0, full_epochs * (1 + per_epoch),
                lambda _, c: jax.random.split(c)[0], k))(epoch_key)
        while True:
            epoch_key, perm_key = jax.random.split(epoch_key)
            if n < batch_size:
                order = np.asarray(jax.random.randint(
                    perm_key, (batch_size,), 0, n))
            else:
                order = np.asarray(jax.random.permutation(perm_key, n))
            for i in range(0, max(len(order) - batch_size + 1, 1),
                           batch_size):
                epoch_key, draw = jax.random.split(epoch_key)
                if rem:  # partial-epoch resume: replay splits only
                    rem -= 1
                    continue
                idx = jnp.asarray(order[i:i + batch_size], jnp.int32)
                yield sample(idx, draw)


def encode_images(paths: Sequence[str], vae, vae_params,
                  resolution: int = 512,
                  encode_batch: int = 8) -> Tuple[Array, Array]:
    """Image files → VAE posterior ``(mean, logvar)`` ``[N, h, w, 4]``,
    encoded in jitted fixed-shape batches with tail padding."""
    enc = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))
    means, logvars = [], []
    for i in range(0, len(paths), encode_batch):
        chunk = paths[i:i + encode_batch]
        px = np.stack([load_pixels(p, resolution) for p in chunk])
        if len(chunk) < encode_batch:  # pad to the compiled batch shape
            px = np.concatenate(
                [px, np.zeros((encode_batch - len(chunk),) + px.shape[1:],
                              np.float32)])
        m, lv = enc(vae_params, jnp.asarray(px))
        means.append(m[:len(chunk)])
        logvars.append(lv[:len(chunk)])
    return jnp.concatenate(means), jnp.concatenate(logvars)


def encode_dataset(items: Sequence[Tuple[str, str]], vae, vae_params,
                   encoder, resolution: int = 512,
                   encode_batch: int = 8) -> EncodedDataset:
    """Encode a dataset folder once: images through the VAE encoder (jitted,
    fixed-shape batches with tail padding) and captions through the CLIP
    text tower (``encoder.prompt``, already jitted)."""
    mean, logvar = encode_images([p for p, _ in items], vae, vae_params,
                                 resolution, encode_batch)
    captions = [c for _, c in items]
    # One tokenizer/text-encoder pass over the unique captions, gathered
    # back per row (folders repeat captions heavily in concept training).
    uniq = sorted(set(captions))
    ctx_u = encoder.prompt(uniq)
    by_cap = {c: i for i, c in enumerate(uniq)}
    ctx = jnp.take(ctx_u, jnp.asarray([by_cap[c] for c in captions]), axis=0)
    ds = EncodedDataset(mean, logvar, ctx, captions)
    log.info('encoded %d images (%d unique captions) at %dx%d -> latents %s',
             len(items), len(uniq), resolution, resolution, ds.mean.shape)
    return ds


def encode_dataset_sdxl(items: Sequence[Tuple[str, str]], vae, vae_params,
                        encoder, resolution: int = 1024,
                        encode_batch: int = 4) -> EncodedDataset:
    """SDXL variant: ``encoder`` is a :class:`~flexdiffuse_tpu.models.sdxl.
    SDXLTextEncoder` — captions encode to (dual-tower context, pooled) and
    the dataset carries the micro-conditioning ids for its resolution
    (original = target = train resolution, no crop: the standard
    fine-tuning conditioning)."""
    from flexdiffuse_tpu.models.sdxl import time_ids as _time_ids
    mean, logvar = encode_images([p for p, _ in items], vae, vae_params,
                                 resolution, encode_batch)
    captions = [c for _, c in items]
    uniq = sorted(set(captions))
    ctx_u, pooled_u = encoder.encode(uniq)
    by_cap = {c: i for i, c in enumerate(uniq)}
    rows = jnp.asarray([by_cap[c] for c in captions])
    ds = EncodedDataset(
        mean, logvar, jnp.take(ctx_u, rows, axis=0), captions,
        pooled=jnp.take(pooled_u, rows, axis=0),
        time_ids=_time_ids(original_size=(resolution, resolution),
                           target_size=(resolution, resolution)))
    log.info('encoded %d SDXL images (%d unique captions) at %dx%d',
             len(items), len(uniq), resolution, resolution)
    return ds
