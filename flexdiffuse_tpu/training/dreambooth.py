"""DreamBooth — subject-driven fine-tuning with prior preservation.

Ruiz et al. 2022: fine-tune on a handful of instance images captioned with
a rare identifier ("a photo of sks dog") while ALSO training on
model-generated *class* images ("a photo of a dog") so the class prior
survives. Loss = L_instance + w·L_prior.

TPU-native shape: every step's batch is the CONCATENATION of an instance
half and a class half — one UNet forward for both, with a fixed per-row
weight vector ``[1,…,1, w,…,w]`` folded into the loss
(training/train.py ``sample_weights``). Both halves come from
device-resident :class:`~flexdiffuse_tpu.training.data.EncodedDataset`
pools, so the hot loop stays a single jitted program over static shapes.

Class images are conventionally pre-generated with the base model itself
(``generate_class_images`` drives the product Runner); any folder of
class-representative images works.
"""
from __future__ import annotations

import logging
import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flexdiffuse_tpu.training import train as _train
from flexdiffuse_tpu.training.data import EncodedDataset

Array = jax.Array
log = logging.getLogger(__name__)


def generate_class_images(runner, class_prompt: str, out_dir: str,
                          count: int = 50, steps: int = 30,
                          seed: int = 0) -> List[str]:
    """Pre-generate prior-preservation images with the product Runner
    (``cli generate``'s engine). Returns the written paths; skips work
    already on disk (re-runs are incremental)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    have = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.lower().endswith('.png'))
    i = len(have)
    paths = list(have)
    while len(paths) < count:
        n = min(4, count - len(paths))
        imgs, _ = runner.gen(prompt=class_prompt, samples=n, steps=steps,
                             seed=seed + i, save=False)
        for img in imgs:
            p = os.path.join(out_dir, f'class_{i:05d}.png')
            img.save(p)
            paths.append(p)
            i += 1
    return paths[:count]


def train_dreambooth(unet, params, instance_ds: EncodedDataset,
                     class_ds: EncodedDataset,
                     cfg: Optional[_train.TrainConfig] = None,
                     prior_weight: float = 1.0, mode: str = 'lora',
                     rank: int = 8, steps: int = 800, batch_size: int = 2,
                     key: Optional[Array] = None, mesh=None,
                     save_path: Optional[str] = None, log_every: int = 10,
                     on_step: Optional[Callable[[int, float], None]] = None,
                     ) -> Tuple[dict, List[float]]:
    """DreamBooth fine-tune: ``batch_size`` instance rows + ``batch_size``
    class rows per step, class half weighted by ``prior_weight``.

    ``mode``: 'lora' (returns factors, saves kohya safetensors) or 'full'
    (returns params, saves msgpack). The weight vector makes the mean loss
    ``(L_inst + w·L_prior) / 2`` — the published objective up to the
    constant 2, which the learning rate absorbs.
    """
    cfg = cfg or _train.TrainConfig(learning_rate=(1e-4 if mode == 'lora'
                                                   else 2e-6),
                                    weight_decay=0.0)
    key = key if key is not None else jax.random.PRNGKey(0)
    weights = np.concatenate([np.ones(batch_size, np.float32),
                              np.full(batch_size, prior_weight, np.float32)])
    if mode == 'lora':
        init_key, key = jax.random.split(key)
        tree = _train.init_lora(params, rank=rank, key=init_key)
        step_fn, tx = _train.make_lora_train_step(
            unet, params, cfg, mesh=mesh, sample_weights=weights)
    elif mode == 'full':
        tree = params
        step_fn, tx = _train.make_train_step(unet, cfg, mesh=mesh,
                                             sample_weights=weights)
    else:
        raise ValueError(f'unknown mode {mode!r}')
    opt_state = tx.init(tree)

    data_key, step_key = jax.random.split(key)
    inst_it = instance_ds.batches(batch_size, jax.random.fold_in(data_key, 0))
    cls_it = class_ds.batches(batch_size, jax.random.fold_in(data_key, 1))
    if mesh is not None:
        from flexdiffuse_tpu.parallel.mesh import shard_batch
    losses: List[float] = []
    t0 = time.monotonic()
    log.info('dreambooth (%s): %d instance + %d class images, %d steps, '
             'prior weight %.2f', mode, len(instance_ds), len(class_ds),
             steps, prior_weight)
    cat = jax.jit(lambda a, b: (jnp.concatenate([a[0], b[0]]),
                                jnp.concatenate([a[1], b[1]])))
    for i in range(steps):
        latents, context = cat(next(inst_it), next(cls_it))
        if mesh is not None:
            latents, context = shard_batch((latents, context), mesh)
        step_key, k = jax.random.split(step_key)
        tree, opt_state, loss = step_fn(tree, opt_state, latents, context, k)
        if log_every and (i % log_every == 0 or i == steps - 1):
            val = float(loss)
            losses.append(val)
            log.info('step %d/%d  loss %.5f  (%.2f steps/s)', i + 1, steps,
                     val, (i + 1) / max(time.monotonic() - t0, 1e-6))
            if on_step is not None:
                on_step(i, val)
    if save_path:
        if mode == 'lora':
            n = _train.export_lora_safetensors(tree, save_path)
            log.info('wrote %d LoRA modules to %s', n, save_path)
        else:
            from flax import serialization
            with open(save_path, 'wb') as f:
                f.write(serialization.msgpack_serialize(
                    jax.tree_util.tree_map(lambda x: jax.device_get(x),
                                           tree)))
            log.info('wrote trained params to %s', save_path)
    return tree, losses
