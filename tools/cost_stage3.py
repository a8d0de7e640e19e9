"""Print XLA cost analysis (bytes accessed, FLOPs) for the flagship
stage-3 forward under a given UNetConfig.storage_dtype.

Usage: /opt/venv/bin/python tools/cost_stage3.py [none|float8_e4m3fn] [none|int8]
Env: KDT_COST_RES (default 1024), KDT_COST_CHUNKS (default config).
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kidney_diffusion_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main():
    from kidney_diffusion_tpu.models.configs import ultra_res
    from kidney_diffusion_tpu.models.unet import EfficientUNet

    storage = sys.argv[1] if len(sys.argv) > 1 else "none"
    storage = None if storage in ("none", "None", "") else storage
    quant = sys.argv[2] if len(sys.argv) > 2 else None
    quant = None if quant in ("none", "None", "") else quant
    res = int(os.environ.get("KDT_COST_RES", "1024"))
    chunks = os.environ.get("KDT_COST_CHUNKS")

    cfg = ultra_res(0, "v_param").stages[2].unet
    cfg = dataclasses.replace(
        cfg,
        storage_dtype=storage,
        quant_conv=quant,
        **({"spatial_chunks": int(chunks)} if chunks else {}),
    )
    model = EfficientUNet(cfg)

    def fwd(params, x, t, lowres):
        return model.apply(params, x, t, lowres_cond_img=lowres)

    x = jax.ShapeDtypeStruct((1, res, res, 3), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.float32)
    lr = jax.ShapeDtypeStruct((1, res, res, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 64, 3)),
            jnp.zeros((1,)),
            lowres_cond_img=jnp.zeros((1, 64, 64, 3)),
        )
    )
    params = jax.tree.map(lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), shapes)
    compiled = jax.jit(fwd).lower(params, x, t, lr).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(
        json.dumps(
            {
                "storage_dtype": storage or "bf16 (none)",
                "quant_conv": quant or "none",
                "res": res,
                "spatial_chunks": cfg.spatial_chunks,
                "bytes_accessed_GB": round(ca.get("bytes accessed", 0) / 1e9, 2),
                "flops_TF": round(ca.get("flops", 0) / 1e12, 2),
                "out_bytes_GB": round(ca.get("bytes accessed output", 0) / 1e9, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
