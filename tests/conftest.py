"""Test configuration: force an 8-device virtual CPU platform.

TPU meshes are SPMD-simulable on CPU (SURVEY.md §4); every test runs against
8 virtual CPU devices so sharding paths are exercised without hardware.

Note: the environment's axon sitecustomize registers the TPU backend and
pins ``jax_platforms`` at interpreter start, so the JAX_PLATFORMS env var is
ineffective — we must override the jax config directly (before any backend
initialization, i.e. before the first ``jax.devices()``).
"""
import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)

# Persistent compilation cache for the CPU test platform: the suite is
# compile-bound on this 1-CPU box (42 min cold, round-4 postmortem), and
# most of that is re-compiling the same tiny-model programs every run.
# A warm cache cuts repeat full-suite runs to a fraction — cheap enough
# to run before every snapshot (the round-4 process failure).
_cache_dir = os.path.join(os.path.dirname(__file__), '.jax_cache_cpu')
jax.config.update('jax_compilation_cache_dir', _cache_dir)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

assert jax.devices()[0].platform == 'cpu'

# ---------------------------------------------------------------------------
# Smoke tier (VERDICT r4 #5): `pytest -m smoke` runs one fast,
# representative slice per subsystem in <5 min — the pre-commit gate when
# the full suite doesn't fit. Curated centrally here (not per-file
# decorators) so the tier stays visible and editable in one place.

_SMOKE_FILES = {
    # whole fast files: core math + cheap surfaces
    'test_guidance.py', 'test_schedulers.py', 'test_image_utils.py',
    'test_attention_dispatch.py', 'test_cfg_rescale.py',
}
_SMOKE_NODES = {
    # one representative node per heavier subsystem
    'test_pipeline.py::test_txt2img_end_to_end',          # pipeline e2e
    'test_models.py::test_unet_shapes_jit',               # models
    'test_serving.py::test_batcher_fuses_same_group',     # serving batcher
    'test_parallel.py::test_dp_sweep_matches_single_device',  # parallel
    'test_weights.py::test_text_tower_parity',            # weights/convert
    'test_training.py::test_loss_matches_hand_formula',   # training
    'test_deepcache.py::test_use_mode_requires_cache',    # deepcache
    'test_pipeline.py::test_schema_json_roundtrip',       # composition
    'test_tokenizer_and_runner.py::test_runner_gen_text_only',  # runner
}


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'smoke: fast per-subsystem tier (pytest -m smoke)')


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        fname = os.path.basename(item.fspath.strpath)
        node = f'{fname}::{item.originalname}' \
            if hasattr(item, 'originalname') else f'{fname}::{item.name}'
        if fname in _SMOKE_FILES or node in _SMOKE_NODES:
            item.add_marker(pytest.mark.smoke)
