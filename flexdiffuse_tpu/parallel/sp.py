"""Sequence-parallel generation — the ≥1024² multi-chip mode.

The reference's only long-sequence story is memory-saving attention slicing
(reference pipeline/flex.py:85-110); its quadratic compute still lands on one
GPU. TPU-native replacement (SURVEY.md §5 long-context): shard the *latent
rows* over a 1-D ``('seq',)`` mesh —

* convs / GroupNorms partition via GSPMD (XLA inserts halo exchanges for the
  3×3 windows and psums for the norm statistics, riding ICI);
* self-attention at ≥ ``sp_min_seq`` tokens runs exact ring attention
  (:mod:`flexdiffuse_tpu.ops.ring_attention`): K/V blocks rotate around the
  ring while each chip accumulates its queries' online softmax;
* cross-attention (77-token K/V) and small levels stay local per shard.

Usage::

    mesh = make_sp_mesh()                       # all visible devices
    pipe = sp_pipeline(unet, unet_params, vae, vae_params, mesh=mesh)
    out = pipe(guide, steps=30, init_size=(2048, 2048))

Each pipeline instance owns its compiled programs, so SP and single-chip
pipelines coexist without cache collisions.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

SEQ_AXIS = 'seq'


def make_sp_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D sequence-parallel mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


def sp_pipeline(unet, unet_params, vae, vae_params,
                mesh: Optional[Mesh] = None, sp_min_seq: int = 4096, **kw):
    """Build a sequence-parallel :class:`FlexPipeline` over ``mesh``."""
    from flexdiffuse_tpu.pipeline.flex import FlexPipeline
    mesh = mesh if mesh is not None else make_sp_mesh()
    return FlexPipeline(unet, unet_params, vae, vae_params, sp_mesh=mesh,
                        sp_axis=SEQ_AXIS, sp_min_seq=sp_min_seq, **kw)
