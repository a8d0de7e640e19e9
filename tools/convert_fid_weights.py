#!/usr/bin/env python
"""Convert the pytorch-fid InceptionV3 checkpoint for this framework,
with a checksum + parity assertion chain.

The reference computes FID with pytorch-fid's pretrained pool3 weights
(/root/reference/evaluation.py:55-68). That checkpoint is published at

  https://github.com/mseitzer/pytorch-fid/releases/download/
      fid_weights/pt_inception-2015-12-05-6726825d.pth

where `6726825d` is, per the torch.hub convention, the first 8 hex chars
of the file's sha256 — verified here before conversion. This tool was
written in a zero-egress environment: the download itself could not be
run, but every step after it executes live (torch is present) and the
same converter + model graph are pinned to a committed golden fixture by
tests/test_inception_parity.py, so a passing run of this script is the
full chain: published file -> checksum -> .npz -> Flax pool3 == torch
pool3.

Usage:
  python tools/convert_fid_weights.py pt_inception-2015-12-05-6726825d.pth \
      weights/inception_fid.npz

Then pass the .npz to eval CLIs via --inception_weights (eval/fid.py).
"""

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# Force the CPU backend BEFORE any jax array is created (load_params
# calls model.init): the site hook pins JAX_PLATFORMS=axon, and on the
# TPU backend default conv precision is reduced (bf16 passes) — over
# InceptionV3's 94 layers that drifts pool3 by ~1e-1, two orders past
# the parity tolerance. Conversion validation is a deterministic fp32
# CPU job; it must also never contend with a training process for the
# one-process-at-a-time TPU tunnel (CLAUDE.md).
import jax

jax.config.update("jax_platforms", "cpu")

# torch.hub-style checksum prefix embedded in the published filename
EXPECTED_SHA256_PREFIX = "6726825d"


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pt_path", help="pt_inception-2015-12-05-6726825d.pth")
    ap.add_argument("out_npz", help="output .npz for eval/inception.py")
    ap.add_argument(
        "--skip-checksum", action="store_true",
        help="allow a checkpoint whose sha256 prefix doesn't match "
             "(e.g. a re-export); parity is still asserted",
    )
    args = ap.parse_args()

    sha = hashlib.sha256(open(args.pt_path, "rb").read()).hexdigest()
    print(f"sha256({os.path.basename(args.pt_path)}) = {sha}")
    if not sha.startswith(EXPECTED_SHA256_PREFIX):
        msg = (
            f"checksum prefix {sha[:8]} != expected {EXPECTED_SHA256_PREFIX} "
            f"(published pt_inception-2015-12-05 checkpoint)"
        )
        if not args.skip_checksum:
            raise SystemExit(f"FAIL: {msg}; pass --skip-checksum to override")
        print(f"WARNING: {msg}")

    # 1. torch state dict -> npz (OIHW kept; load_params transposes)
    from kidney_diffusion_tpu.eval.fid import convert_torch_fid_weights

    os.makedirs(os.path.dirname(os.path.abspath(args.out_npz)), exist_ok=True)
    convert_torch_fid_weights(args.pt_path, args.out_npz)
    n_arrays = len(dict(np.load(args.out_npz)))
    print(f"converted {n_arrays} tensors -> {args.out_npz}")

    # 2. completeness: every Flax leaf must be present (strict load)
    from kidney_diffusion_tpu.eval.inception import InceptionV3, load_params

    model = InceptionV3()
    variables = load_params(model, args.out_npz, strict=True)
    print("strict load OK: all model leaves found in the checkpoint")

    # 3. numerical parity: torch pool3 vs Flax pool3 on deterministic input
    import torch

    from tests.inception_ref import build_torch_model, fixture_input

    # the pinned input the golden-fixture tests use: with synthetic (He)
    # weights, arbitrary inputs can sit on ReLU boundaries that chaos-
    # amplify fp32 reorderings over 94 layers; real pretrained weights
    # are stable, but the sanity path must work for both
    x = fixture_input(batch=2)

    tm = build_torch_model()
    state = torch.load(args.pt_path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    res = tm.load_state_dict(
        {k: v for k, v in state.items() if not k.startswith("fc.")}, strict=False
    )
    missing = [k for k in res.missing_keys if not k.startswith("fc.")]
    assert not missing, f"torch model keys absent from checkpoint: {missing[:8]}"
    tm.eval()
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    got = np.asarray(jax.jit(model.apply)(variables, x))
    max_diff = float(np.abs(got - ref).max())
    tol = 1e-3 * float(ref.std())  # same relative bound the parity tests pin
    print(f"pool3 parity: max |flax - torch| = {max_diff:.2e} (tol {tol:.2e})")
    assert max_diff < tol, "parity failed — conversion is wrong, do not use"

    record = {
        "source_sha256": sha,
        "tensors": n_arrays,
        "pool3_max_abs_diff_vs_torch": max_diff,
        "sample_pool3_mean": float(got.mean()),
        "sample_pool3_checksum": float(np.abs(got).sum()),
    }
    with open(args.out_npz + ".provenance.json", "w") as f:
        json.dump(record, f, indent=2)
    print("OK:", json.dumps(record))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
