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
