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

STANDING OBLIGATION (--verify): two serving defaults were gated on
RELATIVE FID with synthetic-weight Inception features — int8+fp8 quant
as the gigapixel stage-3 default (artifacts/r3_quant: 0.136 bf16 vs
0.158 quant) and the distilled ddim-4 student as the shipped stage-3
operating point (artifacts/r3_distill_flagship: student 0.225 vs
ancestral anchor 0.270). The moment real pool3 weights exist, those
decisions must be re-validated against REAL features. `--verify`
re-runs the A/B harnesses with this converted checkpoint and compares
the outcome to the committed conclusions:

  python tools/convert_fid_weights.py pt_inception-....pth \
      weights/inception_fid.npz --verify \
      [--distill-from /path/to/flagship_ckpt] \
      [--verify-out artifacts/real_weights_reval] [--verify-steps 3000]

The quant A/B trains its own stage-3 on-chip (~30 min); the distill leg
additionally needs a trained flagship teacher checkpoint
(tools/sustained_flagship.py) and is skipped with a loud notice when
--distill-from is absent. Pass --verify-smoke for a CPU plumbing check.
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
    ap.add_argument(
        "--verify", action="store_true",
        help="after conversion, re-run the serving-default FID A/Bs "
             "with the REAL pool3 features and compare to the committed "
             "relative-FID conclusions (see module docstring)",
    )
    ap.add_argument("--verify-out", default="artifacts/real_weights_reval")
    ap.add_argument("--verify-steps", type=int, default=3000,
                    help="stage-3 training depth for the quant A/B "
                         "(match artifacts/r3_quant's 3000)")
    ap.add_argument("--distill-from", default=None,
                    help="trained flagship stage-3 checkpoint for the "
                         "distilled-student leg (tools/sustained_flagship.py)")
    ap.add_argument("--verify-smoke", action="store_true",
                    help="CPU plumbing check of the --verify orchestration")
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
    if args.verify:
        return run_verify(args)
    return 0


def run_verify(args) -> int:
    """Re-validate the serving defaults against REAL pool3 features.

    Each leg re-runs its committed A/B harness with --inception_weights
    pointed at the freshly converted checkpoint, then checks that the
    committed conclusion still holds under real features:

      * quant leg (artifacts/r3_quant): int8+fp8 stage-3 serving is the
        gigapixel default because its FID matched bf16. PASS iff
        fid_quant - fid_bf16 <= max(0.20 * fid_bf16, 0.05) — the same
        "matched" margin the synthetic-feature decision used (delta was
        0.022 on a 0.136 base, i.e. 16%).
      * distill leg (artifacts/r3_distill_flagship): the ddim-4 student
        ships because it matched the 256-step ancestral anchor. PASS iff
        fid_student_ddim4 <= 1.25 * fid_teacher_ancestral + 0.05.

    A FAIL prints the regression and exits nonzero — the serving default
    must then be revisited (flip --quant none / serve the teacher path)
    rather than silently resting on synthetic-feature evidence.
    """
    import subprocess

    tools = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(args.verify_out, exist_ok=True)
    weights = os.path.abspath(args.out_npz)
    verdict = {"inception_weights": weights, "legs": {}}

    def run_leg(name, cmd, result_file, check):
        print(f"[verify] {name}: {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd)
        if proc.returncode != 0:
            verdict["legs"][name] = {"ok": False, "error": f"rc={proc.returncode}"}
            return False
        with open(result_file) as f:
            res = json.load(f)
        ok, detail = check(res)
        verdict["legs"][name] = {"ok": ok, **detail}
        print(f"[verify] {name}: {'PASS' if ok else 'FAIL'} {detail}", flush=True)
        return ok

    smoke = ["--smoke", "--cpu"] if args.verify_smoke else []

    # ---- leg 1: quantized serving default --------------------------------
    qdir = os.path.join(args.verify_out, "quant")
    def check_quant(res):
        bf16, quant = res["fid_bf16"], [
            v for k, v in res.items()
            if k.startswith("fid_") and k != "fid_bf16"
        ][0]
        margin = max(0.20 * bf16, 0.05)
        return quant - bf16 <= margin, {
            "fid_bf16": bf16, "fid_quant": quant, "margin": margin,
        }
    ok = run_leg(
        "quant_serving_default",
        [sys.executable, os.path.join(tools, "quant_fid_ab.py"),
         "--out", qdir, "--steps", str(args.verify_steps),
         "--inception_weights", weights] + smoke,
        os.path.join(qdir, "fid_ab.json"),
        check_quant,
    )

    # ---- leg 2: distilled ddim-4 student ----------------------------------
    if args.distill_from:
        ddir = os.path.join(args.verify_out, "distill")
        def check_distill(res):
            anchor = res["fid_teacher_ancestral"]
            student = res["fid_student_ddim4"]
            bound = 1.25 * anchor + 0.05
            return student <= bound, {
                "fid_teacher_ancestral": anchor,
                "fid_student_ddim4": student, "bound": bound,
            }
        ok = run_leg(
            "distilled_s3_ddim4",
            [sys.executable, os.path.join(tools, "distill_flagship.py"),
             "--from", args.distill_from, "--out", ddir,
             "--phases", "32", "16", "8", "4", "--student-steps", "4",
             "--inception-weights", weights] + smoke,
            os.path.join(ddir, "distill.json"),
            check_distill,
        ) and ok
    else:
        verdict["legs"]["distilled_s3_ddim4"] = {
            "ok": None,
            "skipped": "needs --distill-from <trained flagship stage-3 "
                       "checkpoint> (tools/sustained_flagship.py)",
        }
        print("[verify] distilled_s3_ddim4: SKIPPED — pass --distill-from "
              "a trained flagship checkpoint to run this leg", flush=True)

    verdict["ok"] = bool(ok)
    with open(os.path.join(args.verify_out, "verdict.json"), "w") as f:
        json.dump(verdict, f, indent=2)
    print(("VERIFY PASS" if ok else "VERIFY FAIL — serving defaults need "
           "re-evaluation under real features") + ":",
          json.dumps(verdict), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
