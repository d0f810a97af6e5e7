"""LoRA loading/merging — kohya ("a1111") safetensors adapters.

Beyond-reference capability: the SD ecosystem distributes fine-tunes as
low-rank adapters (``lora_unet_*`` / ``lora_te_*`` keys with
``lora_down.weight`` [r, in], ``lora_up.weight`` [out, r] and a per-module
``alpha``). TPU-native design: adapters are **merged into the param pytree
once on host** (``W ← W + scale·(alpha/r)·up@down``) rather than adding
runtime adapter branches — the compiled UNet/scan is byte-identical with or
without LoRAs, and stacking N adapters costs zero step time.

Covers the modules standard LoRA trains: transformer attention projections
(to_q/k/v/out), the GEGLU feed-forward, the transformer proj_in/out
(Linear or 1×1 conv — both layouts appear in the wild), and the CLIP text
encoder's attention/MLP. Unknown keys (LoCon conv adapters etc.) are
reported, not silently dropped.

SDXL LoRAs use kohya's SGM naming (``lora_unet_input_blocks_{n}_1_*`` /
``middle_block_1`` / ``output_blocks_{n}_1``, plus ``lora_te1_``/
``lora_te2_`` for the dual encoders); the SGM block index → module mapping
is derived from the UNet config's block structure, so it works for the real
SDXL geometry and the tiny test variant alike.
"""
from __future__ import annotations

import logging
import re
from typing import Dict, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_BLOCK = re.compile(
    r'^(down|up)_blocks_(\d+)_attentions_(\d+)_(.*)$')
_MID = re.compile(r'^mid_block_attentions_0_(.*)$')
_TE = re.compile(
    r'^text_model_encoder_layers_(\d+)_(self_attn|mlp)_(.*)$')


def _leaf_path(rest: str) -> Optional[Tuple[str, ...]]:
    """Transformer2D-relative kohya suffix → our param path."""
    m = re.match(r'^transformer_blocks_(\d+)_(.*)$', rest)
    if m:
        d, leaf = m.group(1), m.group(2)
        for attn in ('attn1', 'attn2'):
            if leaf == f'{attn}_to_out_0':
                return (f'blocks_{d}', attn, 'to_out')
            pm = re.match(f'^{attn}_to_([qkv])$', leaf)
            if pm:
                return (f'blocks_{d}', attn, f'to_{pm.group(1)}')
        if leaf == 'ff_net_0_proj':
            return (f'blocks_{d}', 'ff', 'proj_in')
        if leaf == 'ff_net_2':
            return (f'blocks_{d}', 'ff', 'proj_out')
        return None
    if rest in ('proj_in', 'proj_out'):
        return (rest,)
    return None


def _unet_path(module: str) -> Optional[Tuple[str, ...]]:
    m = _BLOCK.match(module)
    if m:
        side, i, j, rest = m.groups()
        head = f'down_{i}_attn_{j}' if side == 'down' else f'up_{i}_attn_{j}'
        leaf = _leaf_path(rest)
        return (head,) + leaf if leaf else None
    m = _MID.match(module)
    if m:
        leaf = _leaf_path(m.group(1))
        return ('mid_attn',) + leaf if leaf else None
    return None


def sgm_block_map(config) -> Dict[str, str]:
    """SGM (kohya SDXL) attention-module name → our UNet tree head.

    Enumerates the SGM block list the way the SGM UNet builds it: input
    blocks are [conv_in, (res[, attn]) × layers, downsample] per level;
    output blocks are (layers+1) per level innermost-first; ``_1`` suffixes
    select the attention submodule within a block.
    """
    mapping = {}
    n = len(config.block_channels)
    blk = 1
    for i in range(n):
        for j in range(config.layers_per_block):
            if config.attention_levels[i]:
                mapping[f'input_blocks_{blk}_1'] = f'down_{i}_attn_{j}'
            blk += 1
        if i != n - 1:
            blk += 1                            # downsample block
    mapping['middle_block_1'] = 'mid_attn'
    blk = 0
    for i in range(n):
        level = n - 1 - i
        for j in range(config.layers_per_block + 1):
            if config.attention_levels[level]:
                mapping[f'output_blocks_{blk}_1'] = f'up_{i}_attn_{j}'
            blk += 1
    return mapping


_SGM = re.compile(r'^((?:input|output)_blocks_\d+_\d+|middle_block_\d+)_(.*)$')


def _sgm_unet_path(module: str, block_map: Dict[str, str]) \
        -> Optional[Tuple[str, ...]]:
    m = _SGM.match(module)
    if not m:
        return None
    head = block_map.get(m.group(1))
    if head is None:
        return None
    leaf = _leaf_path(m.group(2))
    return (head,) + leaf if leaf else None


def _te_path(module: str) -> Optional[Tuple[str, ...]]:
    m = _TE.match(module)
    if not m:
        return None
    layer, kind, leaf = m.groups()
    if kind == 'self_attn' and leaf in ('q_proj', 'k_proj', 'v_proj',
                                        'out_proj'):
        return ('encoder', f'layers_{layer}', 'self_attn', leaf)
    if kind == 'mlp' and leaf in ('fc1', 'fc2'):
        return ('encoder', f'layers_{layer}', 'mlp', leaf)
    return None


def parse_spec(spec: str):
    """'path[:scale]' CLI/UI spec → (path, scale)."""
    path, _, s_part = spec.rpartition(':')
    if path:
        try:
            return path, float(s_part)
        except ValueError:
            pass
    return spec, 1.0


def parse_lora(sd: Dict[str, np.ndarray], unet_config=None):
    """Group a kohya state dict into ``{(target, path): (down, up, alpha)}``.

    ``target`` is 'unet', 'te' (CLIP-L / SD1.x text) or 'te2' (SDXL's
    second encoder); ``path`` indexes the corresponding param tree.
    ``unet_config`` drives the SGM block mapping for SDXL-named modules
    (defaults to the SDXL-base geometry when such keys appear). Returns
    ``(modules, unmapped_keys)``.
    """
    sgm_map = None

    def sgm(module):
        nonlocal sgm_map
        if sgm_map is None:
            from flexdiffuse_tpu.models.configs import SDXL_UNET
            sgm_map = sgm_block_map(unet_config or SDXL_UNET)
        return _sgm_unet_path(module, sgm_map)
    groups: dict = {}
    for key, val in sd.items():
        base, _, part = key.rpartition('.')
        if part == 'weight':
            base, _, part = base.rpartition('.')
        if part not in ('lora_down', 'lora_up', 'alpha'):
            continue
        groups.setdefault(base, {})[part] = np.asarray(val)

    modules = {}
    unmapped = []
    for base, parts in groups.items():
        if 'lora_down' not in parts or 'lora_up' not in parts:
            unmapped.append(base)
            continue
        if base.startswith('lora_unet_'):
            module = base[len('lora_unet_'):]
            path = _unet_path(module) or sgm(module)
            target = 'unet'
        elif base.startswith('lora_te_') or base.startswith('lora_te1_'):
            prefix = 'lora_te1_' if base.startswith('lora_te1_') else \
                'lora_te_'
            path = _te_path(base[len(prefix):])
            target = 'te'
        elif base.startswith('lora_te2_'):
            path = _te_path(base[len('lora_te2_'):])
            target = 'te2'
        else:
            path, target = None, None
        if path is None:
            unmapped.append(base)
            continue
        down = parts['lora_down']
        up = parts['lora_up']
        if down.ndim == 4:                     # conv-layout [r, in, 1, 1]
            down = down[:, :, 0, 0]
        if up.ndim == 4:
            up = up[:, :, 0, 0]
        rank = down.shape[0]
        alpha = float(parts.get('alpha', rank))
        modules[(target, path)] = (down, up, alpha / rank)
    return modules, unmapped


def apply_lora(unet_params, text_params, lora_sd: Dict[str, np.ndarray],
               scale: float = 1.0, text2_params=None, unet_config=None):
    """Merge a LoRA into (copies of) the UNet / text-encoder param trees.

    Any tree may be ``None`` to skip its part (``text2_params``: SDXL's
    second encoder, for ``lora_te2_*`` modules). Raises on a LoRA module
    whose target param doesn't exist (wrong base model); logs and skips
    key patterns outside the supported coverage.

    Returns ``(unet_params, text_params)`` — or a 3-tuple including the
    merged second-encoder tree when ``text2_params`` is given.
    """
    import jax

    modules, unmapped = parse_lora(lora_sd, unet_config)
    if unmapped:
        log.warning('LoRA: %d unsupported module(s) skipped (e.g. %s)',
                    len(unmapped), unmapped[0])
    if not modules:
        raise ValueError('no applicable LoRA modules found')
    provided = {'unet': unet_params is not None, 'te': text_params is not None,
                'te2': text2_params is not None}
    dropped = sorted({t for (t, _) in modules if not provided[t]})
    if dropped:
        log.warning(
            'LoRA: modules targeting %s skipped — no such param tree was '
            'passed (partial application)', '/'.join(dropped))

    def merge(tree, target):
        if tree is None:
            return None
        if hasattr(tree, 'unfreeze'):          # flax FrozenDict input
            tree = tree.unfreeze()
        # tree_map rebuilds every dict level, so in-place edits below only
        # touch the copy.
        params = jax.tree_util.tree_map(lambda x: x, tree)

        root = params['params'] if 'params' in params else params
        for (tgt, path), (down, up, a) in modules.items():
            if tgt != target:
                continue
            node = root
            for part in path[:-1]:
                if part not in node:
                    node = None
                    break
                node = node[part]
            leaf = path[-1]
            if node is None or leaf not in node or 'kernel' not in node[leaf]:
                raise KeyError(
                    f'LoRA targets missing param {"/".join(path)} — adapter '
                    'does not match this base model')
            kernel = np.asarray(node[leaf]['kernel'])
            # Merge in fp32 regardless of storage dtype (product trees hold
            # bf16 matmul kernels — utils/params.py), then cast back so the
            # tree's dtype policy survives the merge.
            orig_dtype = kernel.dtype
            delta = (up.astype(np.float64) @ down.astype(np.float64))
            delta = (scale * a * delta).astype(np.float32)
            kernel = kernel.astype(np.float32)
            if kernel.ndim == 2:               # Dense [in, out]
                kernel = kernel + delta.T
            elif kernel.ndim == 4:             # 1×1 conv [1, 1, in, out]
                kernel = kernel + delta.T[None, None]
            else:
                raise ValueError(
                    f'unsupported kernel rank at {"/".join(path)}')
            node[leaf] = dict(node[leaf], kernel=kernel.astype(orig_dtype))
        return params

    if text2_params is not None:
        return (merge(unet_params, 'unet'), merge(text_params, 'te'),
                merge(text2_params, 'te2'))
    return merge(unet_params, 'unet'), merge(text_params, 'te')
