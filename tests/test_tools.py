"""Tests for the operational tools (tools/).

The sustained-training harness (tools/sustained_train.py) is the
round-3 artifact runner for the reference's kill-and-resume operating
model (/root/reference/train.py:188): these tests pin its resume and
logging semantics at toy scale so the on-TPU run only exercises scale,
not logic.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "sustained_train.py")
FLAGSHIP = os.path.join(REPO, "tools", "sustained_flagship.py")


def _run_train(out, steps, extra=()):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, TOOL, "train", "--out", out, "--steps", str(steps),
         "--ckpt-every", "2", "--sample-every", "0", "--cpu", *extra],
        env=env, capture_output=True, text=True, timeout=1200,
    )


@pytest.mark.slow
def test_sustained_train_resume(tmp_path):
    out = str(tmp_path / "run")

    r1 = _run_train(out, 2)
    assert r1.returncode == 0, r1.stderr[-2000:]
    lines = [json.loads(l) for l in open(os.path.join(out, "loss.jsonl"))]
    assert lines[0]["event"] == "start" and not lines[0]["resumed"]
    assert any(l.get("event") == "checkpoint" for l in lines)
    assert os.path.isdir(os.path.join(out, "ckpt_step2"))

    # relaunch with a higher target: must RESUME (restored counters > 0),
    # not restart — the kill-and-resume contract
    r2 = _run_train(out, 4)
    assert r2.returncode == 0, r2.stderr[-2000:]
    lines = [json.loads(l) for l in open(os.path.join(out, "loss.jsonl"))]
    starts = [l for l in lines if l.get("event") == "start"]
    assert len(starts) == 2
    assert starts[1]["resumed"] and starts[1]["restored_steps"]["1"] == 2
    # stage-1 losses continue from step 3, no repeat of steps 1-2
    s1_steps = [l["step"] for l in lines if l.get("stage") == 1]
    assert s1_steps.count(1) == 1 and 4 in s1_steps
    assert os.path.isdir(os.path.join(out, "ckpt_step4"))


def _run_flagship(out, steps, cache_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # isolate the persistent compile cache (the tool enables it so a
    # kill->resume doesn't re-pay the 631M-step compile on the TPU)
    env["KDT_COMPILE_CACHE"] = cache_dir
    return subprocess.run(
        [sys.executable, FLAGSHIP, "train", "--out", out, "--steps", str(steps),
         "--batch", "1", "--pool", "1", "--ckpt-every", "2",
         "--sample-every", "0", "--cpu", "--smoke"],
        env=env, capture_output=True, text=True, timeout=1800,
    )


@pytest.mark.slow
def test_sustained_flagship_resume(tmp_path):
    """Flagship-harness analogue of the resume contract above: same
    stage-3 topology (lowres cond + in-loss random crop + chunked
    execution) at smoke scale, single rolling ckpt_latest."""
    out = str(tmp_path / "run")
    cache = str(tmp_path / "xla-cache")

    r1 = _run_flagship(out, 2, cache)
    assert r1.returncode == 0, r1.stderr[-2000:]
    lines = [json.loads(l) for l in open(os.path.join(out, "loss.jsonl"))]
    assert lines[0]["event"] == "start" and not lines[0]["resumed"]
    assert os.path.isdir(os.path.join(out, "ckpt_latest"))
    # the slow compile must have populated the persistent cache
    assert os.path.isdir(cache) and os.listdir(cache)

    r2 = _run_flagship(out, 4, cache)
    assert r2.returncode == 0, r2.stderr[-2000:]
    lines = [json.loads(l) for l in open(os.path.join(out, "loss.jsonl"))]
    starts = [l for l in lines if l.get("event") == "start"]
    assert len(starts) == 2
    assert starts[1]["resumed"] and starts[1]["restored_steps"]["3"] == 2
    steps = [l["step"] for l in lines if l.get("stage") == 3]
    assert steps.count(1) == 1 and 4 in steps
    assert os.path.isdir(os.path.join(out, "ckpt_step4"))

    # eval leg: relative FID between fresh init and the trained ckpt
    # (4 smoke steps won't learn -> --allow-regress; the contract under
    # test is the two-checkpoint sample->FID pipeline itself)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["KDT_COMPILE_CACHE"] = cache
    r3 = subprocess.run(
        [sys.executable, FLAGSHIP, "eval", "--out", out,
         "--ckpt-a", "init", "--ckpt-b", "ckpt_latest",
         "--patches", "2", "--sample-steps", "2",
         "--allow-regress", "--cpu", "--smoke"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    fid = json.load(open(os.path.join(out, "fid.json")))
    import math

    assert math.isfinite(fid["fid_init"]) and math.isfinite(fid["fid_ckpt_latest"])
    assert fid["fid_init"] != fid["fid_ckpt_latest"]

    # snapshot-fallback leg: lose ckpt_latest (the kill-inside-the-swap
    # window case) -> training must resume from the newest ckpt_step{N}
    # snapshot, not restart from 0
    import shutil

    shutil.rmtree(os.path.join(out, "ckpt_latest"))
    r4 = _run_flagship(out, 6, cache)
    assert r4.returncode == 0, r4.stderr[-2000:]
    lines = [json.loads(l) for l in open(os.path.join(out, "loss.jsonl"))]
    starts = [l for l in lines if l.get("event") == "start"]
    assert starts[-1]["resumed"] and starts[-1]["restored_steps"]["3"] == 4
    steps = [l["step"] for l in lines if l.get("stage") == 3]
    assert 6 in steps and steps.count(5) == 1


DISTILL_FLAGSHIP = os.path.join(REPO, "tools", "distill_flagship.py")


@pytest.mark.slow
def test_distill_flagship_smoke(tmp_path):
    """Flagship progressive-distillation harness at smoke scale: teacher
    from a short sustained_flagship run, two halving phases, teacher/
    ablation/student FID sets all recorded in distill.json."""
    import math

    teach = str(tmp_path / "teach")
    out = str(tmp_path / "dist")
    cache = str(tmp_path / "xla-cache")

    r1 = _run_flagship(teach, 2, cache)
    assert r1.returncode == 0, r1.stderr[-2000:]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["KDT_COMPILE_CACHE"] = cache
    r = subprocess.run(
        [sys.executable, DISTILL_FLAGSHIP, "run", "--from", teach, "--out", out,
         "--phases", "4", "2", "--phase-steps", "2", "--batch", "1",
         "--pool", "1", "--patches", "2", "--student-steps", "2",
         "--cpu", "--smoke"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.load(open(os.path.join(out, "distill.json")))
    for tag in ("teacher_ancestral", "teacher_dpmpp25", "teacher_ddim2",
                "teacher_dpmpp2", "student_ddim2"):
        assert math.isfinite(res[f"fid_{tag}"]), res
        assert res[f"sec_per_patch_{tag}"] > 0
    lines = [json.loads(l) for l in open(os.path.join(out, "distill.jsonl"))]
    phases = [l["phase"] for l in lines if l.get("event") == "phase_done"]
    assert phases == [4, 2]


DISTILL_GUIDED = os.path.join(REPO, "tools", "distill_guided.py")


@pytest.mark.slow
def test_distill_guided_smoke(tmp_path):
    """Guidance-distillation harness at smoke scale: text-conditioned
    toy teacher, CFG folded into the unguided student, four FID sets +
    class-fidelity probes recorded."""
    import math

    out = str(tmp_path / "guided")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["KDT_COMPILE_CACHE"] = str(tmp_path / "xla-cache")
    r = subprocess.run(
        [sys.executable, DISTILL_GUIDED, "run", "--out", out,
         "--smoke", "--cpu", "--patches", "2", "--train-steps", "2",
         "--phase-steps", "2", "--phases", "4", "2", "--student-steps", "2",
         "--anchor-steps", "3", "--pool", "1", "--batch", "2"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.load(open(os.path.join(out, "guided_distill.json")))
    for tag in ("teacher_guided_dpmpp", "teacher_unguided_dpmpp",
                "teacher_guided_ddim_few", "student_unguided_ddim_few"):
        assert math.isfinite(res[f"fid_{tag}"]), res
        assert 0.0 <= res[f"class_acc_{tag}"] <= 1.0
        assert res[f"sec_per_img_{tag}"] > 0


DISTILL_CASCADE = os.path.join(REPO, "tools", "distill_cascade.py")


@pytest.mark.slow
def test_distill_cascade_smoke(tmp_path):
    """Full-cascade distillation harness at smoke scale: stages 1/2
    trained + distilled in-process, three cascade-level FID sets
    (dpmpp anchor, undistilled few-step, student few-step) recorded."""
    import math

    out = str(tmp_path / "casc")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["KDT_COMPILE_CACHE"] = str(tmp_path / "xla-cache")
    r = subprocess.run(
        [sys.executable, DISTILL_CASCADE, "run", "--out", out,
         "--smoke", "--cpu", "--patches", "2", "--train-steps", "2",
         "--phase-steps", "2", "--phases1", "2", "--phases2", "2",
         "--eval-steps", "2", "2", "2", "--anchor-steps", "3",
         "--pool", "1", "--batch", "1", "--serving-mix"],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    res = json.load(open(os.path.join(out, "cascade_distill.json")))
    for tag in ("teacher_dpmpp", "teacher_ddim_few", "student_ddim_few",
                "serving_mix"):
        assert math.isfinite(res[f"fid_{tag}"]), res
        assert res[f"sec_per_patch_{tag}"] > 0
    lines = [json.loads(l) for l in open(os.path.join(out, "cascade_distill.jsonl"))]
    done = [(l["stage"], l["phase"]) for l in lines if l.get("event") == "phase_done"]
    assert done == [(1, 2), (2, 2)]
