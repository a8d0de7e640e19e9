"""On-chip proof that the CLI training path holds flat host RES.

Round-4 gotcha: per-step numpy batch uploads leak tunnel-client host
RAM (~RES grows with cumulative upload bytes) and wedge multi-hour runs
near step ~1800 (two runs died at RES 82/104 GB). Round 5 moved the fix
into the PRODUCT path (`Trainer.add_train_dataset(device_pool=...)`,
CLI `--device_pool/--pool_refresh`). This harness runs the REAL
`cli.train_kumar` entry point for >2000 steps with the pool enabled,
polls this process tree's RES the whole time, and writes the trace +
summary to the artifact dir.

    nohup /opt/venv/bin/python tools/cli_leak_proof.py \
        --out artifacts/r5_cli_leak_proof > /tmp/leak.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rss_gb(pid: int) -> float:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 2**20
    except (OSError, ValueError):
        pass
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/r5_cli_leak_proof")
    ap.add_argument("--data", default="/tmp/kumar_cli_data")
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--device_pool", type=int, default=24)
    ap.add_argument("--pool_refresh", type=int, default=100)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        # plumbing-only: the REAL kumar stage at batch 16 with accum
        # chunks compiles pathologically on one CPU core (observed
        # ~19 GB RES, >30 min) — smoke uses batch 2 (chunks=1)
        args.steps, args.batch, args.device_pool = 6, 2, 3

    os.makedirs(args.out, exist_ok=True)

    # fixture data (same learnable synthetic TCGA layout as the quality
    # harness; geometry marker prevents stale reuse)
    from tools.kumar_cascade import write_kumar_fixture

    marker = os.path.join(args.data, "fixture.json")
    want = {"n": 72, "size": 64 if args.smoke else 400}
    have = None
    if os.path.exists(marker):
        with open(marker) as f:
            have = json.load(f)
    if have != want:
        import shutil

        if os.path.isdir(args.data):
            shutil.rmtree(args.data)
        write_kumar_fixture(args.data, want["n"], size=want["size"])
        with open(marker, "w") as f:
            json.dump(want, f)

    workdir = os.path.join(args.out, "run")
    os.makedirs(workdir, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cmd = [
        sys.executable, "-m", "kidney_diffusion_tpu.cli.train_kumar",
        "--unet_number", "1", "--data_path", args.data,
        "--batch_size", str(args.batch),
        "--max_steps", str(args.steps),
        "--sample_freq", str(max(args.steps, 1000)),  # no mid-run sampling
        "--device_pool", str(args.device_pool),
        "--pool_refresh", str(args.pool_refresh),
        "--max_batch_size", str(min(4, args.batch)),
        "--no_wandb", "--num_workers", "2",
        "--checkpoint", os.path.join(workdir, "ckpt"),
    ]
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    if args.smoke:
        # KDT_CPU (cli/__init__.py) — JAX_PLATFORMS alone is re-imposed
        # to the TPU by a site hook, which would put this smoke child on
        # the shared chip
        env["KDT_CPU"] = "1"
    log_path = os.path.join(args.out, "train.log")
    trace_path = os.path.join(args.out, "res_trace.jsonl")
    t0 = time.time()
    with open(log_path, "w") as log_f, open(trace_path, "w") as tr_f:
        proc = subprocess.Popen(cmd, cwd=workdir, env=env,
                                stdout=log_f, stderr=subprocess.STDOUT)
        trace = []
        while proc.poll() is None:
            rec = {"t": round(time.time() - t0, 1), "rss_gb": round(rss_gb(proc.pid), 3)}
            trace.append(rec)
            tr_f.write(json.dumps(rec) + "\n")
            tr_f.flush()
            time.sleep(5.0)
    rc = proc.returncode

    summary = summarize(trace, args, rc, round(time.time() - t0, 1),
                        " ".join(cmd))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("RESULT:", json.dumps(summary), flush=True)
    sys.exit(0 if summary["flat"] else 1)


def summarize(trace, args, rc, wall_s, cmd_str):
    """Flatness = RES drift RATE during the steady training phase
    (25-75% of the timeline: past compile/pool warmup, before the final
    checkpoint save whose Orbax host-gather is a known one-time spike).
    The r4 leak trajectory was ~43 GB per 1000 steps (wedge at ~1800
    steps); the bar is < 2 GB per 1000 steps — an >20x reduction that
    puts the ~80 GB wedge zone beyond any realistic single-process run
    of the reference's kill-and-resume loop."""
    t_end = trace[-1]["t"] if trace else 0.0
    mid = [r for r in trace if 0.25 * t_end <= r["t"] <= 0.75 * t_end]
    drift = (mid[-1]["rss_gb"] - mid[0]["rss_gb"]) if len(mid) > 1 else 0.0
    frac = 0.5 if len(mid) > 1 else 1.0
    rate = drift / max(args.steps * frac, 1) * 1000.0
    return {
        "cmd": cmd_str,
        "rc": rc,
        "steps": args.steps,
        "device_pool": args.device_pool,
        "pool_refresh": args.pool_refresh,
        "wall_s": wall_s,
        "samples": len(trace),
        "rss_gb_peak": max((r["rss_gb"] for r in trace), default=float("nan")),
        "rss_gb_final": trace[-1]["rss_gb"] if trace else float("nan"),
        "rss_gb_train_phase_start": mid[0]["rss_gb"] if mid else float("nan"),
        "rss_gb_train_phase_end": mid[-1]["rss_gb"] if mid else float("nan"),
        "train_phase_drift_gb": round(drift, 3),
        "train_phase_gb_per_1000_steps": round(rate, 3),
        "r4_baseline_gb_per_1000_steps": 43.0,
        "flat": bool(rc == 0 and rate < 2.0),
    }


if __name__ == "__main__":
    main()
