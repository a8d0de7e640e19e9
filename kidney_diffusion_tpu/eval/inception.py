"""InceptionV3 (FID variant) in Flax.

The reference computes FID with pytorch-fid's InceptionV3 pool3
activations (/root/reference/evaluation.py:55-68,96-152). This is the
same graph re-implemented NHWC in Flax, including pytorch-fid's
deviations from stock torchvision:

  * avg-pool branches use count_include_pad=False semantics
  * Mixed_7c's pool branch uses MAX pooling (FIDInceptionE_2)
  * input is normalised x*2-1 at 299²; features are the 2048-dim
    global-average pool ("pool3")

Parameter names mirror the torch state dict (converted to .npz with
eval/fid.py:convert_torch_fid_weights) so the standard FID weights load
directly; without a weights file the net is deterministically
random-initialised (flagged loudly by the caller).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def avg_pool_exc(x: Array, window: int = 3) -> Array:
    """3x3 stride-1 avg pool, count_include_pad=False."""
    pad = window // 2
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        (1, window, window, 1), (1, 1, 1, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return summed / counts


def max_pool(x: Array, window: int = 3, stride: int = 2, pad: int = 0) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )


class BasicConv2d(nn.Module):
    out: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.out, self.kernel, strides=self.stride,
            padding=(self.padding, self.padding) if isinstance(self.padding, int)
            else tuple((p, p) for p in self.padding),
            use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=0.001, name="bn"
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = avg_pool_exc(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(self.c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(self.c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(self.c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(self.c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(self.c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(self.c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = avg_pool_exc(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # "max" for Mixed_7c (FIDInceptionE_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.pool_mode == "max":
            bp = max_pool(x, 3, 1, 1)
        else:
            bp = avg_pool_exc(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """pool3 feature extractor: (B, 299, 299, 3) [0,1] -> (B, 2048)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.astype(jnp.float32) * 2.0 - 1.0  # pytorch-fid normalize_input
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # pool3


def load_params(model: InceptionV3, weights_npz: Optional[str], *, strict: bool = False):
    """Init params; overwrite from a converted torch state dict when given.

    strict=True raises if ANY model leaf is absent from the weights file —
    the completeness half of the FID-weights assertion chain
    (tools/convert_fid_weights.py)."""
    init = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32)
    )
    if weights_npz is None:
        return init

    state = dict(np.load(weights_npz))
    flat, treedef = jax.tree_util.tree_flatten_with_path(init)
    out = []
    missing = []
    for path, leaf in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        # flax path: ('params'|'batch_stats', Module..., 'conv', 'kernel')
        collection, *mods, leafname = keys
        torch_name = ".".join(mods) + "." + {
            "kernel": "weight",
            "scale": "weight",
            "bias": "bias",
            "mean": "running_mean",
            "var": "running_var",
        }[leafname]
        if torch_name not in state:
            missing.append(torch_name)
            out.append(leaf)
            continue
        w = state[torch_name]
        if leafname == "kernel":  # OIHW -> HWIO
            w = np.transpose(w, (2, 3, 1, 0))
        assert w.shape == leaf.shape, (torch_name, w.shape, leaf.shape)
        out.append(jnp.asarray(w, leaf.dtype))
    if missing:
        if strict:
            raise ValueError(
                f"{len(missing)} model leaves missing from {weights_npz}: "
                f"{missing[:8]}{'...' if len(missing) > 8 else ''}"
            )
        print(f"[inception] {len(missing)} leaves missing from weights file, "
              f"kept random init: {missing[:4]}...")
    return jax.tree_util.tree_unflatten(treedef, out)
