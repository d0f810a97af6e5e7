"""Training loop driver: steps × batches → trained params / LoRA adapter.

One function per mode, both shaped the same way: build the jitted step
(training/train.py), pull shuffled batches off the device-resident
:class:`~flexdiffuse_tpu.training.data.EncodedDataset`, log loss at a
cadence, return the trained tree plus the loss history. ``mesh`` (a
``(data, model)`` Mesh from parallel/mesh.py) shards each batch on the
data axis — the step itself is identical.
"""
from __future__ import annotations

import logging
import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from flexdiffuse_tpu.training import train as _train
from flexdiffuse_tpu.training.data import EncodedDataset

Array = jax.Array
log = logging.getLogger(__name__)


def _run(step_fn, tree, opt_state, dataset: EncodedDataset, steps: int,
         batch_size: int, key: Array, mesh, log_every: int,
         on_step: Optional[Callable[[int, float], None]],
         ema_decay: float = 0.0, ckpt=None):
    if mesh is not None:
        from flexdiffuse_tpu.parallel.mesh import shard_batch
    data_key, step_key = jax.random.split(key)
    losses: List[float] = []
    start = 0
    # EMA needs its own buffers: the train step donates its param argument,
    # so aliasing the initial tree would leave ema pointing at freed memory.
    ema = (jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))(tree)
           if ema_decay > 0 else None)
    ema_fn = (jax.jit(lambda e, p: _train.ema_update(e, p, ema_decay),
                      donate_argnums=(0,))
              if ema_decay > 0 else None)
    if ckpt is not None:
        template = {'tree': tree, 'opt_state': opt_state,
                    'data_key': data_key, 'step_key': step_key}
        if ema is not None:
            template['ema'] = ema
        restored = ckpt.restore_latest(template)
        if restored is not None:
            state, start, losses = restored
            tree, opt_state = state['tree'], state['opt_state']
            data_key, step_key = state['data_key'], state['step_key']
            ema = state.get('ema', ema)
    it = dataset.batches(batch_size, data_key, skip=start)
    t0 = time.monotonic()
    try:
        for i in range(start, steps):
            batch = next(it)
            extra = batch[2] if len(batch) == 3 else None  # SDXL added_cond
            latents, context = batch[0], batch[1]
            if mesh is not None:
                latents, context, extra = shard_batch(
                    (latents, context, extra), mesh)
            step_key, k = jax.random.split(step_key)
            tree, opt_state, loss = step_fn(tree, opt_state, latents,
                                            context, k, extra)
            if ema_fn is not None:
                ema = ema_fn(ema, tree)
            if log_every and (i % log_every == 0 or i == steps - 1):
                # The fetch synchronizes — keep the cadence coarse on TPU.
                val = float(loss)
                losses.append(val)
                log.info('step %d/%d  loss %.5f  (%.2f steps/s)', i + 1,
                         steps, val,
                         (i + 1 - start) / max(time.monotonic() - t0, 1e-6))
                if on_step is not None:
                    on_step(i, val)
            if ckpt is not None and ckpt.should_save(i, steps):
                state = {'tree': tree, 'opt_state': opt_state,
                         'data_key': data_key, 'step_key': step_key}
                if ema is not None:
                    state['ema'] = ema
                ckpt.save(i + 1, state, losses)
    finally:
        if ckpt is not None:
            ckpt.close()
    return (ema if ema is not None else tree), losses


def train_lora(unet, base_params, dataset: EncodedDataset,
               cfg: Optional[_train.TrainConfig] = None, rank: int = 8,
               steps: int = 500, batch_size: int = 4,
               key: Optional[Array] = None, mesh=None,
               save_path: Optional[str] = None, log_every: int = 10,
               include_ff: bool = True,
               on_step: Optional[Callable[[int, float], None]] = None,
               checkpoint_dir: Optional[str] = None,
               checkpoint_every: int = 100,
               ) -> Tuple[dict, List[float]]:
    """LoRA fine-tune: returns ``(factors, loss_history)``; ``save_path``
    additionally writes a kohya safetensors adapter loadable by
    ``Runner.apply_lora`` / any kohya-compatible tool.

    ``checkpoint_dir`` enables orbax checkpoints every
    ``checkpoint_every`` steps; when the directory already holds one,
    training resumes from it bit-exactly (training/checkpoint.py)."""
    cfg = cfg or _train.TrainConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    init_key, run_key = jax.random.split(key)
    factors = _train.init_lora(base_params, rank=rank, key=init_key,
                               include_ff=include_ff)
    step_fn, tx = _train.make_lora_train_step(unet, base_params, cfg,
                                              mesh=mesh)
    opt_state = tx.init(factors)
    log.info('LoRA training: %d modules at rank %d, %d steps, batch %d',
             len(factors), rank, steps, batch_size)
    factors, losses = _run(step_fn, factors, opt_state, dataset, steps,
                           batch_size, run_key, mesh, log_every, on_step,
                           ema_decay=cfg.ema_decay,
                           ckpt=_ckpt(checkpoint_dir, checkpoint_every))
    if save_path:
        n = _train.export_lora_safetensors(factors, save_path)
        log.info('wrote %d LoRA modules to %s', n, save_path)
    return factors, losses


def _ckpt(checkpoint_dir: Optional[str], checkpoint_every: int):
    if not checkpoint_dir:
        return None
    from flexdiffuse_tpu.training.checkpoint import TrainCheckpointer
    return TrainCheckpointer(checkpoint_dir, every=checkpoint_every)


def train_full(unet, params, dataset: EncodedDataset,
               cfg: Optional[_train.TrainConfig] = None, steps: int = 500,
               batch_size: int = 4, key: Optional[Array] = None, mesh=None,
               save_path: Optional[str] = None, log_every: int = 10,
               on_step: Optional[Callable[[int, float], None]] = None,
               checkpoint_dir: Optional[str] = None,
               checkpoint_every: int = 100,
               ) -> Tuple[dict, List[float]]:
    """Full-model fine-tune: returns ``(params, loss_history)``;
    ``save_path`` writes the trained tree as msgpack (the same format the
    weight-loading cache uses — point ``weights.load`` at it or hand it to
    ``Runner.from_models``). With ``cfg.ema_decay > 0`` the returned/saved
    tree is the EMA of the trajectory (the diffusers convention for the
    shipped checkpoint). ``checkpoint_dir`` as in :func:`train_lora`."""
    cfg = cfg or _train.TrainConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    step_fn, tx = _train.make_train_step(unet, cfg, mesh=mesh)
    opt_state = tx.init(params)
    log.info('full fine-tune: %d steps, batch %d', steps, batch_size)
    params, losses = _run(step_fn, params, opt_state, dataset, steps,
                          batch_size, key, mesh, log_every, on_step,
                          ema_decay=cfg.ema_decay,
                          ckpt=_ckpt(checkpoint_dir, checkpoint_every))
    if save_path:
        from flax import serialization
        with open(save_path, 'wb') as f:
            f.write(serialization.msgpack_serialize(
                jax.tree_util.tree_map(lambda x: jax.device_get(x), params)))
        log.info('wrote trained params to %s', save_path)
    return params, losses
