"""Diffusion training: noise-prediction loss, optax train step, DP/TP mesh.

Beyond-reference capability (the reference is inference-only): fine-tune a
UNet — fully or through LoRA factors — against the standard denoising
objective, TPU-native:

* the whole step (forward, loss, backward, optimizer) is ONE jitted
  program; with a ``(data, model)`` mesh (parallel/mesh.py) the batch
  shards on the data axis and the global-mean loss makes XLA insert the
  gradient all-reduce on ICI (the scaling-book recipe — no hand-written
  collectives);
* LoRA training differentiates through the *merge*: effective kernels are
  ``stop_grad(base) + (α/r)·(up@down)ᵀ`` rebuilt inside the step, so the
  UNet modules need no adapter branches and inference stays byte-identical
  (weights/lora.py merges the saved factors the same way);
* trained factors export as kohya-format safetensors, loadable straight
  back through ``Runner.apply_lora`` / ``weights.lora``.

Losses follow the published SD training objective: ε-prediction MSE (or
v-prediction for SD2.x-style models), uniform timestep sampling, optional
min-SNR-γ weighting.
"""
from __future__ import annotations

import dataclasses
import zlib
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flexdiffuse_tpu import schedulers

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    # 'epsilon' (SD1.x) or 'v_prediction' (SD2.x 768-v).
    prediction_type: str = 'epsilon'
    # min-SNR-γ loss weighting (Hang et al. 2023); 0 → uniform.
    snr_gamma: float = 0.0
    num_train_timesteps: int = 1000
    # AdamW betas (diffusers defaults).
    b1: float = 0.9
    b2: float = 0.999
    # Rematerialization: 'none' saves all activations; 'full' saves only
    # the step inputs and recomputes the forward during the backward pass
    # (~⅓ more FLOPs, activation memory ~O(1) — the standard trade for
    # real-geometry training on one chip); 'dots' keeps matmul/conv
    # outputs (cheap to hold, expensive to recompute) and recomputes the
    # bandwidth-bound rest.
    remat: str = 'none'
    # Gradient accumulation: the optimizer applies every k-th step
    # (optax.MultiSteps) — effective batch = k × micro-batch with no
    # activation-memory growth.
    grad_accum: int = 1
    # EMA of the trained params (0 → off). Applied by the loop driver
    # (training/loop.py), not inside the jitted step.
    ema_decay: float = 0.0
    # Donate the trainable tree + optimizer state to the step (the update
    # aliases their buffers instead of allocating fresh trees — required
    # for 860M-param Adam to fit on one 16 GB chip). Donated inputs are
    # DELETED after the call: keep False when reusing a tree across calls
    # (exactness tests, sweeps over one base).
    donate: bool = True
    # Attention backend for the training forward/backward: 'auto' rides
    # the flash kernels (differentiable via ops/flash_backward.py Pallas
    # VJP — ~2× the XLA path at SD's d=40 heads); 'xla' forces the fused
    # XLA path (the pre-VJP behavior, kept for A/B and debugging).
    attention_backend: str = 'auto'


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(cfg.learning_rate, b1=cfg.b1, b2=cfg.b2,
                    weight_decay=cfg.weight_decay),
    )
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def _remat_apply(apply_fn: Callable, cfg: TrainConfig) -> Callable:
    """Training-path apply: attention backend scope (flash is
    differentiable through the Pallas VJP, ops/flash_backward.py; 'xla'
    forces the fused path) plus the configured rematerialization."""
    from flexdiffuse_tpu.ops import attention as _attn

    def scoped_apply(*args, **kwargs):
        # The backend contextvar is read at trace time inside the wrapped
        # trace, so the scope covers every attention site in the model.
        with _attn.backend(cfg.attention_backend):
            return apply_fn(*args, **kwargs)

    if cfg.remat == 'none':
        return scoped_apply
    if cfg.remat == 'full':
        return jax.checkpoint(scoped_apply)
    if cfg.remat == 'dots':
        return jax.checkpoint(
            scoped_apply,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f'unknown remat mode {cfg.remat!r}')


def ema_update(ema_params, params, decay: float):
    """One EMA step ``ema ← decay·ema + (1−decay)·params`` (fp32 math,
    cast back to each leaf's dtype)."""
    return jax.tree_util.tree_map(
        lambda e, p: (decay * e.astype(jnp.float32) +
                      (1.0 - decay) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params, params)


def _schedule_tables(cfg: TrainConfig) -> Array:
    sc = schedulers.SchedulerConfig(
        num_train_timesteps=cfg.num_train_timesteps)
    return jnp.asarray(schedulers.alphas_cumprod(sc), jnp.float32)


def diffusion_loss(apply_fn: Callable, params, latents: Array,
                   context: Array, key: Array, acp: Array,
                   cfg: TrainConfig, sample_weights: Optional[Array] = None,
                   **apply_kwargs) -> Array:
    """Mean denoising loss over a batch of clean (pre-scaled) latents.

    ``apply_fn(params, noisy, t, context, **apply_kwargs) -> prediction``.
    ``sample_weights`` ``[B]`` scales per-sample losses (DreamBooth prior
    preservation: 1 for instance rows, ``prior_weight`` for class rows).
    """
    b = latents.shape[0]
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (b,), 0, cfg.num_train_timesteps)
    noise = jax.random.normal(k_n, latents.shape, jnp.float32)
    ap = acp[t][:, None, None, None]
    lat32 = latents.astype(jnp.float32)
    noisy = jnp.sqrt(ap) * lat32 + jnp.sqrt(1.0 - ap) * noise
    pred = apply_fn(params, noisy.astype(latents.dtype),
                    t.astype(jnp.float32), context,
                    **apply_kwargs).astype(jnp.float32)
    if cfg.prediction_type == 'v_prediction':
        target = jnp.sqrt(ap) * noise - jnp.sqrt(1.0 - ap) * lat32
    elif cfg.prediction_type == 'epsilon':
        target = noise
    else:
        raise ValueError(f'unknown prediction_type {cfg.prediction_type!r}')
    per = jnp.mean(jnp.square(pred - target), axis=(1, 2, 3))
    if cfg.snr_gamma > 0:
        snr = ap[:, 0, 0, 0] / (1.0 - ap[:, 0, 0, 0])
        w = jnp.minimum(snr, cfg.snr_gamma) / jnp.maximum(snr, 1e-8)
        if cfg.prediction_type == 'v_prediction':
            w = jnp.minimum(snr, cfg.snr_gamma) / (snr + 1.0)
        per = per * w
    if sample_weights is not None:
        per = per * sample_weights.astype(jnp.float32)
    return jnp.mean(per)


# ---------------------------------------------------------------------------
# Full-model training


def make_train_step(unet, cfg: TrainConfig, mesh=None,
                    sample_weights=None):
    """``step(params, opt_state, latents, context, key) ->
    (params, opt_state, loss)`` — one jitted update.

    With ``mesh`` (a ``(data, model)`` Mesh from parallel/mesh.py), params
    ride the tensor-parallel layout and the batch shards on the data axis;
    the global-mean loss makes GSPMD reduce gradients across chips.
    ``sample_weights`` ``[B]`` fixes per-row loss weights (DreamBooth
    prior preservation — training/dreambooth.py builds the batches).
    """
    tx = make_optimizer(cfg)
    acp = _schedule_tables(cfg)
    apply_fn = _remat_apply(unet.apply, cfg)
    sw = None if sample_weights is None else jnp.asarray(
        sample_weights, jnp.float32)

    def step(params, opt_state, latents, context, key, extra):
        kw = {} if extra is None else {'added_cond': extra}

        def loss_fn(p):
            return diffusion_loss(apply_fn, p, latents, context, key,
                                  acp, cfg, sample_weights=sw, **kw)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # params/opt_state are donated: the update aliases their buffers in
    # place of allocating fresh 3.44 GB trees — what lets the 860M-param
    # Adam state + grads fit next to activations on one 16 GB chip. (The
    # CPU backend ignores donation; callers there may reuse the inputs.)
    don = (0, 1) if cfg.donate else ()
    if mesh is None:
        jitted = jax.jit(step, donate_argnums=don)
    else:
        # GSPMD infers grad/opt-state layouts from the param placement
        # (parallel/mesh.py shard_params); only the batch needs a
        # constraint.
        from flexdiffuse_tpu.parallel.mesh import batch_sharding
        bsh = batch_sharding(mesh)

        def sharded_step(params, opt_state, latents, context, key, extra):
            latents = jax.lax.with_sharding_constraint(latents, bsh)
            context = jax.lax.with_sharding_constraint(context, bsh)
            return step(params, opt_state, latents, context, key, extra)

        jitted = jax.jit(sharded_step, donate_argnums=don)

    def public_step(params, opt_state, latents, context, key, extra=None):
        # ``extra`` (SDXL added_cond {'text_embeds', 'time_ids'}) rides as
        # an optional trailing pytree — None compiles the plain signature.
        return jitted(params, opt_state, latents, context, key, extra)

    return public_step, tx


# ---------------------------------------------------------------------------
# LoRA training

LORA_ATTN_TARGETS = ('to_q', 'to_k', 'to_v', 'to_out')
LORA_FF_TARGETS = ('proj_in', 'proj_out')


def _is_lora_target(path: Tuple[str, ...], include_ff: bool) -> bool:
    leaf = path[-1]
    if leaf in LORA_ATTN_TARGETS:
        return True
    return include_ff and leaf in LORA_FF_TARGETS and 'ff' in path


def init_lora(params, rank: int = 8, key: Optional[Array] = None,
              include_ff: bool = True) -> Dict[str, dict]:
    """LoRA factor tree for a UNet param pytree: ``{'/'.join(path):
    {'down': [r, in], 'up': [out, r]}}`` over the attention (and
    optionally GEGLU) projections. ``up`` starts at zero (standard LoRA
    init: the merge is an exact no-op at step 0)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    root = params['params'] if 'params' in params else params
    factors: Dict[str, dict] = {}

    def walk(node, path):
        for name, child in node.items():
            p = path + (name,)
            if isinstance(child, dict) and 'kernel' in child and \
                    _is_lora_target(p, include_ff):
                kern = child['kernel']
                if kern.ndim != 2:
                    continue
                d_in, d_out = kern.shape
                sub = jax.random.fold_in(
                    key, zlib.crc32('/'.join(p).encode()) & 0x7fffffff)
                factors['/'.join(p)] = {
                    'down': (jax.random.normal(sub, (rank, d_in),
                                               jnp.float32) / rank),
                    'up': jnp.zeros((d_out, rank), jnp.float32),
                }
            elif isinstance(child, dict):
                walk(child, p)

    walk(root, ())
    if not factors:
        raise ValueError('no LoRA targets found in the param tree')
    return factors


def merge_lora_params(params, factors: Dict[str, dict],
                      scale: float = 1.0):
    """Effective params: ``stop_grad(base) + scale·(up@down)ᵀ`` at each
    factored kernel (differentiable in the factors)."""
    has_wrapper = 'params' in params
    root = params['params'] if has_wrapper else params

    def apply_path(node, parts, fac):
        name = parts[0]
        if len(parts) == 1:
            leaf = dict(node[name])
            base = jax.lax.stop_gradient(leaf['kernel'])
            delta = (fac['up'] @ fac['down']).T * scale
            leaf['kernel'] = (base.astype(jnp.float32) + delta).astype(
                base.dtype)
            return dict(node, **{name: leaf})
        return dict(node, **{name: apply_path(node[name], parts[1:], fac)})

    out = jax.lax.stop_gradient(root)
    out = jax.tree_util.tree_map(lambda x: x, out)  # shallow rebuild
    out = dict(out)
    for path_str, fac in factors.items():
        out = apply_path(out, path_str.split('/'), fac)
    return {'params': out} if has_wrapper else out


def make_lora_train_step(unet, base_params, cfg: TrainConfig,
                         scale: float = 1.0, mesh=None,
                         sample_weights=None):
    """``step(factors, opt_state, latents, context, key) ->
    (factors, opt_state, loss)`` — LoRA-only update; the base tree is a
    closed-over constant (donated weights stay untouched)."""
    tx = make_optimizer(cfg)
    acp = _schedule_tables(cfg)
    apply_fn = _remat_apply(unet.apply, cfg)
    sw = None if sample_weights is None else jnp.asarray(
        sample_weights, jnp.float32)

    # base_params ride as a jit ARGUMENT (not a closure): closed-over
    # device trees are baked into the lowered module as constants — 3.44 GB
    # of captured bytes at SD-1.4 geometry, duplicated per executable.
    def step(base, factors, opt_state, latents, context, key, extra):
        kw = {} if extra is None else {'added_cond': extra}

        def loss_fn(f):
            eff = merge_lora_params(base, f, scale)
            return diffusion_loss(apply_fn, eff, latents, context, key,
                                  acp, cfg, sample_weights=sw, **kw)

        loss, grads = jax.value_and_grad(loss_fn)(factors)
        updates, opt_state = tx.update(grads, opt_state, factors)
        factors = optax.apply_updates(factors, updates)
        return factors, opt_state, loss

    don = (1, 2) if cfg.donate else ()
    if mesh is None:
        jitted = jax.jit(step, donate_argnums=don)
    else:
        from flexdiffuse_tpu.parallel.mesh import batch_sharding
        bsh = batch_sharding(mesh)

        def sharded_step(base, factors, opt_state, latents, context, key,
                         extra):
            latents = jax.lax.with_sharding_constraint(latents, bsh)
            context = jax.lax.with_sharding_constraint(context, bsh)
            return step(base, factors, opt_state, latents, context, key,
                        extra)

        jitted = jax.jit(sharded_step, donate_argnums=don)

    def public_step(factors, opt_state, latents, context, key, extra=None):
        return jitted(base_params, factors, opt_state, latents, context,
                      key, extra)

    return public_step, tx


# ---------------------------------------------------------------------------
# Export: trained factors → kohya safetensors (round-trips through
# weights/lora.py and any kohya-compatible tool).

_KOHYA_HEADS = {'attn1': 'attn1', 'attn2': 'attn2'}


def _kohya_module_name(path: Tuple[str, ...]) -> Optional[str]:
    """Our param path → kohya ``lora_unet_*`` module name (inverse of
    weights/lora.py ``_unet_path``/``_leaf_path``)."""
    head = path[0]
    import re
    m = re.match(r'^(down|up)_(\d+)_attn_(\d+)$', head)
    if m:
        side, i, j = m.groups()
        prefix = f'lora_unet_{side}_blocks_{i}_attentions_{j}'
    elif head == 'mid_attn':
        prefix = 'lora_unet_mid_block_attentions_0'
    else:
        return None
    if len(path) == 2 and path[1] in ('proj_in', 'proj_out'):
        return f'{prefix}_{path[1]}'
    if len(path) == 4 and path[1].startswith('blocks_'):
        d = path[1][len('blocks_'):]
        mid, leaf = path[2], path[3]
        if mid in ('attn1', 'attn2'):
            suffix = 'to_out_0' if leaf == 'to_out' else leaf
            return (f'{prefix}_transformer_blocks_{d}_{mid}_{suffix}')
        if mid == 'ff':
            net = 'net_0_proj' if leaf == 'proj_in' else 'net_2'
            return f'{prefix}_transformer_blocks_{d}_ff_{net}'
    return None


def export_lora_safetensors(factors: Dict[str, dict], path: str,
                            alpha: Optional[float] = None) -> int:
    """Write trained factors as a kohya safetensors adapter; returns the
    module count. Loadable by ``weights.lora.apply_lora`` and by the wider
    kohya ecosystem."""
    from safetensors.numpy import save_file
    out = {}
    count = 0
    for path_str, fac in factors.items():
        parts = tuple(path_str.split('/'))
        mod = _kohya_module_name(parts)
        if mod is None:
            raise ValueError(f'no kohya name for LoRA path {path_str!r}')
        down = np.asarray(fac['down'], np.float32)
        up = np.asarray(fac['up'], np.float32)
        out[f'{mod}.lora_down.weight'] = down
        out[f'{mod}.lora_up.weight'] = up
        out[f'{mod}.alpha'] = np.asarray(
            alpha if alpha is not None else down.shape[0], np.float32)
        count += 1
    save_file(out, path)
    return count
