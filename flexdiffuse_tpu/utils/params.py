"""Parameter-tree dtype policy: pre-cast matmul/conv params to the compute
dtype.

Every Dense/Conv in the model zoo runs with ``dtype=bfloat16`` in the
product configuration — flax's ``promote_dtype`` casts the fp32 kernel to
bf16 at every use, which under ``lax.scan`` means the cast (or the doubled
fp32 HBM read where XLA fuses it into the consumer) recurs every denoise
step. Pre-casting all ndim>=2 params once at pipeline construction is
**bit-identical** to the per-use cast (fp32→bf16 rounding is the same
single rounding either way) and halves resident weight HBM: SD-1.x UNet
3.44 GB → 1.72 GB, SDXL 10.3 GB → 5.2 GB. 1-D params (GroupNorm/LayerNorm
scale+bias, per-channel biases) stay fp32 — the norms compute fp32 stats.

Measured on the v5e (tools/param_dtype_exp.py): +0.7 steps/s on the SD-1.4
512² CFG scan, max|Δ| = 0 vs the fp32-param path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU compiler options for the product executables (swept on the real v5e,
# tools/xla_opts_exp.py): a 64 MB scoped-VMEM budget lets XLA pipeline the
# UNet's conv/GN fusions deeper — +2.3% on the SD-1.4 CFG scan (49.1 → 50.2
# steps/s); 96 MB regresses (starves the double-buffered weight prefetch),
# the aggressive-layout / nested-fusion / scheduler toggles are neutral.
# Unknown options fail the compile loudly, so an accepted option applied.
TPU_COMPILER_OPTIONS = {'xla_tpu_scoped_vmem_limit_kib': '65536'}


def target_platform() -> str:
    """Platform the computation will actually run on: honours a
    ``jax.default_device(...)`` scope — on a TPU-attached process,
    ``jax.default_backend()`` still reports 'tpu' inside such a scope,
    which would route Pallas kernels and TPU-only compiler flags to a
    CPU compile (validate_reference's CPU fp32 cross-check)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def product_compiler_options():
    """Compiler options for product jits — TPU only (other backends reject
    TPU flags)."""
    return (TPU_COMPILER_OPTIONS
            if target_platform() == 'tpu' else None)


def cast_matmul_params(tree, dtype=jnp.bfloat16):
    """Cast every ndim>=2 leaf (matmul/conv/embedding kernels) to ``dtype``;
    leave 1-D/scalar leaves (norm scales, biases) untouched."""
    if tree is None:
        return None
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if getattr(a, 'ndim', 0) >= 2 else a, tree)


def cast_for_module(tree, module):
    """Apply :func:`cast_matmul_params` iff ``module`` computes in a
    sub-fp32 dtype (the cast is only bit-identical when ``promote_dtype``
    would round the kernel at use anyway — fp32-compute modules, e.g. the
    tiny CPU test models, must keep fp32 params)."""
    dt = getattr(module, 'dtype', jnp.float32)
    if tree is None or dt == jnp.float32:
        return tree
    return cast_matmul_params(tree, dt)
