"""CLI entry points (python -m kidney_diffusion_tpu.cli.<name>).

Importing this package turns on the persistent XLA compilation cache
(utils/compile_cache.py) so repeated CLI invocations skip the multi-
minute stage compiles. Library imports of `kidney_diffusion_tpu` itself
stay side-effect free; opt out with KDT_COMPILE_CACHE=off.
"""

from ..utils.compile_cache import enable_compilation_cache

enable_compilation_cache()
