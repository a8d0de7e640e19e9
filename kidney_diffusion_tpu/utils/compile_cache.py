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
  KDT_COMPILE_CACHE=<path>     cache base directory (default
                               ~/.cache/kidney_diffusion_tpu/xla)

The actual directory handed to JAX is `<base>/<host_fingerprint()>`:
XLA:CPU entries are ahead-of-time MACHINE CODE compiled for the exact
CPU features of the compiling host, and the cache key JAX uses
(HLO + compile options + backend) does NOT include those features. A
cache shared across machines (network home dir) therefore poisons any
host whose CPU differs — the loader spams "Machine type used for
XLA:CPU compilation doesn't match the machine type for execution" and
the run is effectively cold or worse (this exact failure produced
MULTICHIP_r04.json rc=124). Fingerprinting the directory per host makes
cross-machine reuse structurally impossible while keeping same-host
reuse intact.
"""

from __future__ import annotations

import functools
import hashlib
import os
import platform
from typing import Optional

_DISABLE_VALUES = ("0", "off", "none", "false", "disable", "disabled")


@functools.lru_cache(maxsize=1)
def host_fingerprint() -> str:
    """Digest of the compile-relevant identity of THIS host: arch/OS,
    jax+jaxlib versions (serialization format), and the CPU feature
    flags (XLA:CPU AOT code is specialized to them — see module
    docstring). Two machines share a cache subdir only when executables
    are actually interchangeable between them."""
    parts = [platform.machine(), platform.system()]
    for mod in ("jax", "jaxlib"):
        try:
            parts.append(f"{mod}={__import__(mod).__version__}")
        except Exception:  # pragma: no cover - jaxlib always importable here
            parts.append(f"{mod}=?")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:  # non-Linux: arch+versions still partition correctly
        pass
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "kidney_diffusion_tpu", "xla", host_fingerprint())


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
    if cache_dir is None:
        cache_dir = default_cache_dir()
    else:
        # explicit dirs get the per-host subdir too: the AOT-poisoning
        # hazard (module docstring) doesn't care how the base was chosen
        cache_dir = os.path.join(cache_dir, host_fingerprint())
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
