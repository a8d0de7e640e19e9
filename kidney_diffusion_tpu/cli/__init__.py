"""CLI entry points (python -m kidney_diffusion_tpu.cli.<name>).

Importing this package turns on the persistent XLA compilation cache
(utils/compile_cache.py) so repeated CLI invocations skip the multi-
minute stage compiles. Library imports of `kidney_diffusion_tpu` itself
stay side-effect free; opt out with KDT_COMPILE_CACHE=off.

KDT_CPU=1 forces the CPU backend for every CLI. The env var
JAX_PLATFORMS alone is NOT enough on this deployment — a site hook
re-imposes the TPU platform at interpreter startup, so subprocess
smoke runs that only set the env var silently land on the shared TPU
chip (and contend with whatever is running there). This hook runs
before any backend is initialized, where jax.config.update still wins.
"""

import os

from ..utils.compile_cache import enable_compilation_cache

if os.environ.get("KDT_CPU", "") in ("1", "true", "on"):
    import jax

    jax.config.update("jax_platforms", "cpu")

enable_compilation_cache()
