"""Persistent XLA compilation cache: module behavior + CLI wiring.

No reference equivalent (the reference has no compile step; its cold-start
is HF download + CUDA warmup, `/root/reference/utils.py:61-71`). The cache
is the TPU-native answer: a second process deserializes the scan executable
instead of recompiling (measured in docs/PERFORMANCE.md).
"""
import os
import subprocess
import sys

import jax
import pytest

from flexdiffuse_tpu.utils.compile_cache import (default_cache_dir,
                                                 enable_compilation_cache)


@pytest.fixture
def restore_jax_cache_config():
    old = jax.config.jax_compilation_cache_dir
    try:
        yield
    finally:
        jax.config.update('jax_compilation_cache_dir', old)


def test_enable_points_jax_at_dir(tmp_path, restore_jax_cache_config,
                                  monkeypatch):
    monkeypatch.delenv('FLEXDIFFUSE_NO_COMPILE_CACHE', raising=False)
    target = tmp_path / 'xla-cache'
    used = enable_compilation_cache(str(target))
    assert used == str(target)
    assert target.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(target)


def test_env_opt_out(monkeypatch, restore_jax_cache_config):
    before = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv('FLEXDIFFUSE_NO_COMPILE_CACHE', '1')
    assert enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


def test_env_dir_override(monkeypatch):
    monkeypatch.setenv('FLEXDIFFUSE_COMPILE_CACHE', '/tmp/somewhere-else')
    assert default_cache_dir() == '/tmp/somewhere-else'
    monkeypatch.delenv('FLEXDIFFUSE_COMPILE_CACHE')
    assert '.cache' in default_cache_dir()


def _cli(*args, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run([sys.executable, '-m', 'flexdiffuse_tpu.cli',
                           *args], capture_output=True, text=True,
                          cwd='/root/repo', env=e)


def test_cli_has_cache_flags():
    r = _cli('--help')
    assert r.returncode == 0
    assert '--compile-cache' in r.stdout
    assert '--no-compile-cache' in r.stdout


def test_cli_enables_cache_before_dispatch(tmp_path):
    """The cache dir is created even when the subcommand itself fails —
    enablement happens before dispatch, so serve/generate/train all get
    it without per-command wiring."""
    cache = tmp_path / 'cli-cache'
    r = _cli('--compile-cache', str(cache), 'convert',
             '--models', '/nonexistent')
    assert r.returncode != 0  # convert fails on the missing models dir
    assert cache.is_dir()


def test_cli_no_compile_cache_skips(tmp_path):
    cache = tmp_path / 'untouched'
    r = _cli('--no-compile-cache', 'convert', '--models', '/nonexistent',
             env={'FLEXDIFFUSE_COMPILE_CACHE': str(cache)})
    assert r.returncode != 0
    assert not cache.exists()
