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
encoder's attention/MLP. The **diffusers/PEFT naming** (dotted module
paths with ``lora_A``/``lora_B``, the format LCM-LoRA ships in) is also
accepted, including its k×k *conv* adapters (resnet conv1/conv2/shortcut,
up/downsamplers, time_emb_proj). Unknown keys are reported, not silently
dropped.

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


# ---------------------------------------------------------------------------
# diffusers/PEFT naming (dotted module paths + lora_A/lora_B) — the format
# LCM-LoRA and other diffusers-trained adapters ship in, e.g.
# ``unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q`` or
# ``unet.up_blocks.1.resnets.0.conv1`` (conv adapters: lora_A [r, in, k, k]).

_D_ATTN = re.compile(
    r'^(down|up)_blocks\.(\d+)\.attentions\.(\d+)\.(.*)$')
_D_RES = re.compile(r'^(down|up)_blocks\.(\d+)\.resnets\.(\d+)\.(\w+)$')
_D_SAMPLER = re.compile(
    r'^(down|up)_blocks\.(\d+)\.(down|up)samplers\.0\.conv$')
_D_TE = re.compile(
    r'^text_model\.encoder\.layers\.(\d+)\.(self_attn|mlp)\.(\w+)$')


def _diffusers_attn_leaf(rest: str) -> Optional[Tuple[str, ...]]:
    m = re.match(r'^transformer_blocks\.(\d+)\.(.*)$', rest)
    if m:
        d, leaf = m.group(1), m.group(2)
        for attn in ('attn1', 'attn2'):
            if leaf == f'{attn}.to_out.0':
                return (f'blocks_{d}', attn, 'to_out')
            pm = re.match(f'^{attn}\\.to_([qkv])$', leaf)
            if pm:
                return (f'blocks_{d}', attn, f'to_{pm.group(1)}')
        if leaf == 'ff.net.0.proj':
            return (f'blocks_{d}', 'ff', 'proj_in')
        if leaf == 'ff.net.2':
            return (f'blocks_{d}', 'ff', 'proj_out')
        return None
    if rest in ('proj_in', 'proj_out'):
        return (rest,)
    return None


_RES_LEAVES = ('conv1', 'conv2', 'conv_shortcut', 'time_emb_proj')


def _diffusers_unet_path(module: str) -> Optional[Tuple[str, ...]]:
    m = _D_ATTN.match(module)
    if m:
        side, i, j, rest = m.groups()
        leaf = _diffusers_attn_leaf(rest)
        return (f'{side}_{i}_attn_{j}',) + leaf if leaf else None
    m = _D_RES.match(module)
    if m:
        side, i, j, leaf = m.groups()
        return (f'{side}_{i}_res_{j}', leaf) if leaf in _RES_LEAVES else None
    m = _D_SAMPLER.match(module)
    if m:
        side = m.group(1)
        return (f'{side}_{m.group(2)}_{side}sample', 'conv')
    if module.startswith('mid_block.attentions.0.'):
        leaf = _diffusers_attn_leaf(module[len('mid_block.attentions.0.'):])
        return ('mid_attn',) + leaf if leaf else None
    m = re.match(r'^mid_block\.resnets\.(\d+)\.(\w+)$', module)
    if m and m.group(2) in _RES_LEAVES:
        return (f'mid_res_{m.group(1)}', m.group(2))
    if module == 'time_embedding.linear_1':
        return ('time_embed_1',)
    if module == 'time_embedding.linear_2':
        return ('time_embed_2',)
    return None


def _diffusers_te_path(module: str) -> Optional[Tuple[str, ...]]:
    m = _D_TE.match(module)
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
        # kohya: lora_down/lora_up/alpha; diffusers-PEFT: lora_A/lora_B;
        # older diffusers: <module>.lora.down / <module>.lora.up.
        if part in ('lora_A', 'lora_B'):
            part = 'lora_down' if part == 'lora_A' else 'lora_up'
        elif part in ('down', 'up') and base.endswith('.lora'):
            base = base[:-len('.lora')]
            part = f'lora_{part}'
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
        elif base.startswith('unet.'):          # diffusers/PEFT naming
            path = _diffusers_unet_path(base[len('unet.'):])
            target = 'unet'
        elif base.startswith('text_encoder.'):
            path = _diffusers_te_path(base[len('text_encoder.'):])
            target = 'te'
        elif base.startswith('text_encoder_2.'):
            path = _diffusers_te_path(base[len('text_encoder_2.'):])
            target = 'te2'
        else:
            path, target = None, None
        if path is None:
            unmapped.append(base)
            continue
        down = parts['lora_down']
        up = parts['lora_up']
        if down.ndim == 4 and down.shape[2:] == (1, 1):  # 1×1 conv layout
            down = down[:, :, 0, 0]
        if up.ndim == 4 and up.shape[2:] == (1, 1):
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
            if down.ndim == 4:
                # k×k conv adapter (diffusers conv LoRA: lora_A is a k×k
                # conv [r, in, kh, kw], lora_B a 1×1 [out, r] — their
                # composition is ΔW[o,i,kh,kw] = Σ_r up[o,r]·down[r,i,·,·]).
                delta4 = np.einsum('or,rihw->hwio', up.astype(np.float64),
                                   down.astype(np.float64))
                delta4 = (scale * a * delta4).astype(np.float32)
                if kernel.ndim != 4 or kernel.shape != delta4.shape:
                    raise ValueError(
                        f'conv LoRA shape {delta4.shape} does not match '
                        f'kernel {kernel.shape} at {"/".join(path)}')
                kernel = kernel.astype(np.float32) + delta4
                node[leaf] = dict(node[leaf],
                                  kernel=kernel.astype(orig_dtype))
                continue
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
