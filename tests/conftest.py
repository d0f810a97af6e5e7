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

assert jax.devices()[0].platform == 'cpu'
