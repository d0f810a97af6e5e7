"""Textual-inversion embeddings — learned concept tokens.

Beyond-reference capability: the SD ecosystem's second adapter format.
An embedding file carries ``[n, d]`` learned vectors for a placeholder
token; loading it (a) registers the literal token with the tokenizer
(multi-vector concepts expand to n consecutive ids) and (b) appends the
vectors as new rows of the text encoder's ``token_embedding`` table.

TPU-native design like LoRA: the table is extended host-side once — the
text model's ``nn.Embed`` reads its row count from the params, so the same
compiled program serves any number of added concepts (the first addition
recompiles for the new table shape; further additions of the same total
row count do not).

Supported file layouts: A1111 ``.pt`` (``{'string_to_param': {'*': T}}``),
safetensors with ``emb_params``, and single-tensor dicts keyed by the
token name (diffusers convention).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np


def extract_embedding(sd: Dict[str, np.ndarray],
                      token: Optional[str] = None
                      ) -> Tuple[Optional[str], np.ndarray]:
    """State dict → (token name or None, ``[n, d]`` vector table)."""
    if 'string_to_param' in sd:                       # A1111 .pt (flattened)
        table = sd['string_to_param']
        if isinstance(table, dict):
            table = next(iter(table.values()))
    elif any(k.startswith('string_to_param.') for k in sd):
        key = next(k for k in sd if k.startswith('string_to_param.'))
        table = sd[key]
    elif 'emb_params' in sd:
        table = sd['emb_params']
    else:
        tensors = {k: v for k, v in sd.items()
                   if hasattr(v, 'ndim') and v.ndim in (1, 2)}
        if len(tensors) != 1:
            raise ValueError(
                f'cannot locate the embedding tensor (keys: {list(sd)})')
        key, table = next(iter(tensors.items()))
        token = token or key
    table = np.asarray(table, np.float32)
    if table.ndim == 1:
        table = table[None]
    if table.ndim != 2:
        raise ValueError(f'embedding table has rank {table.ndim}, expected 2')
    return token, table


def add_textual_inversion(tokenizer, text_params, name: str,
                          table: np.ndarray):
    """Register ``name`` with the tokenizer and append ``table`` rows to the
    token-embedding matrix. Returns the new text params (copy)."""
    import jax

    d_table = table.shape[1]
    tree = text_params
    if hasattr(tree, 'unfreeze'):
        tree = tree.unfreeze()
    params = jax.tree_util.tree_map(lambda x: x, tree)
    root = params['params'] if 'params' in params else params
    emb = np.asarray(root['token_embedding']['embedding'])
    if emb.shape[1] != d_table:
        raise ValueError(
            f'embedding width {d_table} does not match the text encoder '
            f'({emb.shape[1]}) — wrong base model for this inversion')
    ids = tokenizer.add_tokens(name, num_vectors=table.shape[0])
    if ids[0] != emb.shape[0]:
        raise ValueError(
            f'tokenizer id space ({ids[0]}) out of sync with the embedding '
            f'table ({emb.shape[0]} rows)')
    root['token_embedding'] = dict(
        root['token_embedding'],
        embedding=np.concatenate([emb, table.astype(emb.dtype)]))
    return params
