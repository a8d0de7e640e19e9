"""Torch reference for the FID InceptionV3 graph + deterministic weights.

pytorch-fid (vendored by /root/reference/evaluation.py:96-152) runs a
torchvision InceptionV3 with three behavioral patches (FIDInceptionA/C/E:
count_include_pad=False avg pools; Mixed_7c max-pool branch). The real
pretrained checkpoint cannot be fetched in this zero-egress image, so
parity is proven structurally instead:

  * `TorchFIDInception` — the same graph written in pure torch with the
    exact pytorch-fid state_dict key layout;
  * `synthetic_state_dict` — deterministic per-key random weights that
    both the torch model and (via eval/fid.py:convert_torch_fid_weights)
    the Flax graph load;
  * tests/fixtures/inception_pool3.npz — golden pool3 activations from
    the torch model under those weights, so the Flax graph stays pinned
    to the torch semantics even where torch is unavailable.

The day the standard pt_inception-2015-12-05 weights arrive, the same
converter path loads them — these tests prove that path end to end.
"""

from __future__ import annotations

import zlib

import numpy as np


def _key_rng(name: str) -> np.random.RandomState:
    return np.random.RandomState(zlib.crc32(name.encode()) & 0x7FFFFFFF)


def synthetic_value(name: str, shape) -> np.ndarray:
    """Deterministic, magnitude-sane value for one state_dict entry.
    Conv kernels get He-scaled gaussians; BN stats stay near identity so
    activations neither explode nor vanish over ~94 layers."""
    rng = _key_rng(name)
    shape = tuple(int(s) for s in shape)
    if name.endswith("conv.weight"):
        fan_in = int(np.prod(shape[1:]))  # OIHW
        return (rng.randn(*shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)
    if name.endswith("bn.weight"):
        return rng.uniform(0.8, 1.2, shape).astype(np.float32)
    if name.endswith("bn.bias"):
        return (rng.randn(*shape) * 0.05).astype(np.float32)
    if name.endswith("running_mean"):
        return (rng.randn(*shape) * 0.05).astype(np.float32)
    if name.endswith("running_var"):
        return rng.uniform(0.8, 1.2, shape).astype(np.float32)
    return (rng.randn(*shape) * 0.02).astype(np.float32)


def synthetic_state_dict(shapes: dict) -> dict:
    """{torch_name: array} for the given {torch_name: OIHW/flat shape}."""
    return {k: synthetic_value(k, s) for k, s in shapes.items()}


def flax_torch_shapes() -> dict:
    """Derive the torch state_dict (name -> OIHW shape) from the Flax
    graph's init tree using the same name mapping load_params applies —
    the torch-free way to enumerate the checkpoint layout."""
    import jax
    import jax.numpy as jnp

    from kidney_diffusion_tpu.eval.inception import InceptionV3

    model = InceptionV3()
    init = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    )
    flat, _ = jax.tree_util.tree_flatten_with_path(init)
    shapes = {}
    for path, leaf in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        _, *mods, leafname = keys
        torch_name = ".".join(mods) + "." + {
            "kernel": "weight",
            "scale": "weight",
            "bias": "bias",
            "mean": "running_mean",
            "var": "running_var",
        }[leafname]
        shape = tuple(leaf.shape)
        if leafname == "kernel":  # HWIO -> OIHW
            shape = (shape[3], shape[2], shape[0], shape[1])
        shapes[torch_name] = shape
    return shapes


def fixture_input(batch: int = 2) -> np.ndarray:
    """The pinned [0,1] NHWC input for golden activations."""
    rng = np.random.RandomState(0)
    return rng.rand(batch, 299, 299, 3).astype(np.float32)


# ---------------------------------------------------------------------------
# torch graph (only imported by torch-marked tests)
# ---------------------------------------------------------------------------


def build_torch_model():
    """TorchFIDInception with pytorch-fid's module/key layout."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)), inplace=True)

    def avg_exc(x):
        # FIDInception patch: count_include_pad=False
        return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)

    class InceptionA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(avg_exc(x))
            return torch.cat([b1, b5, bd, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, bd, bp], 1)

    class InceptionC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(
                self.branch7x7dbl_4(
                    self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
                )
            )
            bp = self.branch_pool(avg_exc(x))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(
                self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
            )
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, b7, bp], 1)

    class InceptionE(nn.Module):
        def __init__(self, cin, pool_mode):
            super().__init__()
            self.pool_mode = pool_mode
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            if self.pool_mode == "max":  # FIDInceptionE_2 (Mixed_7c)
                bp = F.max_pool2d(x, 3, stride=1, padding=1)
            else:  # FIDInceptionE_1 (Mixed_7b)
                bp = avg_exc(x)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class TorchFIDInception(nn.Module):
        """(B, 3, 299, 299) in [0,1] -> (B, 2048) pool3 features."""

        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, 32)
            self.Mixed_5c = InceptionA(256, 64)
            self.Mixed_5d = InceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, 128)
            self.Mixed_6c = InceptionC(768, 160)
            self.Mixed_6d = InceptionC(768, 160)
            self.Mixed_6e = InceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280, "avg")
            self.Mixed_7c = InceptionE(2048, "max")

        def forward(self, x):
            x = x * 2 - 1  # pytorch-fid normalize_input
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Mixed_5b(x)
            x = self.Mixed_5c(x)
            x = self.Mixed_5d(x)
            x = self.Mixed_6a(x)
            x = self.Mixed_6b(x)
            x = self.Mixed_6c(x)
            x = self.Mixed_6d(x)
            x = self.Mixed_6e(x)
            x = self.Mixed_7a(x)
            x = self.Mixed_7b(x)
            x = self.Mixed_7c(x)
            x = F.adaptive_avg_pool2d(x, (1, 1))
            return torch.flatten(x, 1)

    return TorchFIDInception()
