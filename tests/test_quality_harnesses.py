"""Smoke coverage for the cascade quality harnesses (tools/).

Each tool owns an on-chip artifact protocol (artifacts/r4_kumar,
artifacts/r4_cond_patch); these tests pin the CPU plumbing — fixture
generation, both training stages, all three FID eval points, result
schema — so a tool regression surfaces in the suite instead of 30
minutes into a TPU run.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(tmp_path, tool, extra=()):
    out = tmp_path / "out"
    cmd = [
        sys.executable, os.path.join(REPO, "tools", tool),
        "--out", str(out), "--smoke", "--cpu", *extra,
    ]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        cmd, env=env, cwd=REPO, capture_output=True, text=True, timeout=900
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out / "fid.json") as f:
        return json.load(f)


@pytest.mark.slow
def test_kumar_cascade_smoke(tmp_path):
    res = _run_tool(
        tmp_path, "kumar_cascade.py", ("--data", str(tmp_path / "data"))
    )
    assert set(res) >= {"fid_init", "fid_mid", "fid_final", "fid_trend"}
    assert all(isinstance(v, float) for v in res["fid_trend"])
    # fixture marker guards against stale-geometry reuse (r4 gotcha)
    with open(tmp_path / "data" / "fixture.json") as f:
        assert json.load(f) == {"n": 10, "size": 64}


@pytest.mark.slow
def test_cond_patch_smoke(tmp_path):
    res = _run_tool(tmp_path, "cond_patch.py")
    assert set(res) >= {
        "fid_init", "fid_mid", "fid_final",
        "fidelity_init", "fidelity_mid", "fidelity_final",
    }
    assert 0.0 <= res["fidelity_final"] <= 1.0
