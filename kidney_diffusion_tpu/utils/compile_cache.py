"""Persistent XLA compilation cache for the CLI entry points.

The dominant interactive cost on this backend is XLA compilation of the
big per-stage `lax.scan` programs — ~1-2 min for the 1024² stage over
the remote tunnel (PERF.md), paid again by EVERY process because JAX's
in-memory executable cache dies with it. (The torch reference has no
analogue: its per-process warmup is cudnn autotune at millisecond
scale, /root/reference/sample_ultra_res.py:213 just pays kernel-launch
costs.) JAX ships a persistent on-disk compilation cache that
serializes compiled executables keyed by (HLO, compile options,
backend); enabling it makes the second `sample_ultra_res` /
`train_patch` process start in seconds.

Enabled automatically for every `python -m kidney_diffusion_tpu.cli.*`
process (see cli/__init__.py). Controls:

  KDT_COMPILE_CACHE=off        disable
  KDT_COMPILE_CACHE=<path>     cache directory (default
                               ~/.cache/kidney_diffusion_tpu/xla)
"""

from __future__ import annotations

import os
from typing import Optional

_DISABLE_VALUES = ("0", "off", "none", "false", "disable", "disabled")


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "kidney_diffusion_tpu", "xla")


def enable_compilation_cache(
    cache_dir: Optional[str] = None,
    *,
    min_compile_time_secs: float = 1.0,
) -> Optional[str]:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Idempotent; safe before or after backend initialisation (the config
    flags are read at compile time). Executables whose compile took
    longer than `min_compile_time_secs` are written to disk and reused
    by later processes. Returns the cache dir, or None when disabled
    via KDT_COMPILE_CACHE / an unwritable directory.
    """
    env = os.environ.get("KDT_COMPILE_CACHE", "")
    if env.lower() in _DISABLE_VALUES:
        return None
    if cache_dir is None:
        cache_dir = env if env and env.lower() not in ("1", "on", "true") else None
    cache_dir = cache_dir or default_cache_dir()
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None  # read-only home etc. — silently run uncached

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )
    # cache regardless of executable size (the stage-3 scan is large)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
