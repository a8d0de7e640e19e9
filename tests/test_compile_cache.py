"""Persistent XLA compilation cache (utils/compile_cache.py).

The CLI processes pay minutes of XLA compilation per invocation without
it (PERF.md); these tests pin that enabling the cache actually writes
executable entries to disk, that the env kill-switch works, and that the
cli package turns it on at import.
"""

import importlib
import os

import jax
import jax.numpy as jnp
import pytest

from kidney_diffusion_tpu.utils.compile_cache import (
    default_cache_dir,
    enable_compilation_cache,
    host_fingerprint,
)


@pytest.fixture()
def restore_cache_config():
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    prev_env = os.environ.get("KDT_COMPILE_CACHE")
    yield
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)
    if prev_env is None:
        os.environ.pop("KDT_COMPILE_CACHE", None)
    else:
        os.environ["KDT_COMPILE_CACHE"] = prev_env
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.reset_cache()


def test_disabled_by_env(restore_cache_config, tmp_path):
    os.environ["KDT_COMPILE_CACHE"] = "off"
    assert enable_compilation_cache(str(tmp_path / "c")) is None


def test_env_var_supplies_directory(restore_cache_config, tmp_path):
    target = str(tmp_path / "from_env")
    os.environ["KDT_COMPILE_CACHE"] = target
    # the per-host fingerprint is appended even to explicit base dirs:
    # XLA:CPU cache entries are host-machine-code and must never be
    # shared across machines (MULTICHIP_r04 failure mode)
    expect = os.path.join(target, host_fingerprint())
    assert enable_compilation_cache() == expect
    assert os.path.isdir(expect)
    assert jax.config.jax_compilation_cache_dir == expect


def test_host_fingerprint_covers_cpu_features(monkeypatch):
    """The fingerprint must move when the host CPU feature set moves —
    that delta is exactly what poisoned the round-4 driver run."""
    base = host_fingerprint()
    assert len(base) == 16 and base == host_fingerprint()  # stable
    import kidney_diffusion_tpu.utils.compile_cache as cc_mod

    real_open = open

    def fake_open(path, *a, **k):
        if path == "/proc/cpuinfo":
            import io

            return io.StringIO("flags\t\t: fpu sse sse2 someother\n")
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", fake_open)
    cc_mod.host_fingerprint.cache_clear()
    try:
        assert cc_mod.host_fingerprint() != base
    finally:
        monkeypatch.undo()
        cc_mod.host_fingerprint.cache_clear()
        assert cc_mod.host_fingerprint() == base


def test_default_dir_used(restore_cache_config, tmp_path, monkeypatch):
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    os.environ["KDT_COMPILE_CACHE"] = "1"
    got = enable_compilation_cache()
    assert got == default_cache_dir()
    assert str(tmp_path) in got


def test_compile_writes_cache_entries(restore_cache_config, tmp_path):
    os.environ.pop("KDT_COMPILE_CACHE", None)
    cache_dir = enable_compilation_cache(
        str(tmp_path / "xla"), min_compile_time_secs=0.0
    )
    from jax.experimental.compilation_cache import compilation_cache as cc

    cc.reset_cache()  # pick up the new dir

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x

    f(jnp.ones((17, 17))).block_until_ready()
    entries = os.listdir(cache_dir)
    assert entries, "compilation produced no persistent cache entries"


def test_cli_package_import_enables_cache(restore_cache_config, tmp_path):
    target = str(tmp_path / "cli_cache")
    os.environ["KDT_COMPILE_CACHE"] = target
    import kidney_diffusion_tpu.cli as cli

    importlib.reload(cli)
    assert jax.config.jax_compilation_cache_dir == os.path.join(
        target, host_fingerprint()
    )
