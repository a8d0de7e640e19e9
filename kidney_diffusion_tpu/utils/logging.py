"""Metrics logging + profiling.

The reference logs loss/val_loss/step and sample images to wandb
(/root/reference/train.py:114-118,203,242). wandb is optional here: if
installed (and not disabled) it is used with the same field names;
otherwise metrics append to a JSONL file so runs are always inspectable.

Profiling: the reference has none beyond CUDA memory prints (SURVEY §5).
`profile_trace` wraps jax.profiler for on-demand TPU traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid
from typing import Optional


def generate_run_id() -> str:
    return uuid.uuid4().hex[:8]


class MetricsLogger:
    def __init__(
        self,
        project: str,
        *,
        run_id: Optional[str] = None,
        resume: bool = False,
        log_dir: str = "logs",
        use_wandb: bool = True,
        enabled: bool = True,
    ):
        """`enabled=False` makes every method a no-op — non-main hosts in
        a multi-host run (the reference's rank-0-only wandb logging,
        train.py:114-118)."""
        self.project = project
        self.run_id = run_id or generate_run_id()
        self.enabled = enabled
        self._wandb = None
        self._file = None
        if not enabled:
            return
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, resume=resume, id=self.run_id)
                self._wandb = wandb
            except Exception:
                self._wandb = None
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{project}-{self.run_id}.jsonl")
        self._file = open(self._path, "a")

    def log(self, step: int, **metrics):
        if self._file is None:
            return
        if self._wandb is not None:
            self._wandb.log({"step": step, **metrics})
        self._file.write(json.dumps({"step": step, "ts": time.time(), **metrics}) + "\n")
        self._file.flush()

    def log_image(self, step: int, name: str, image=None, path: Optional[str] = None) -> None:
        """Record a sample image (reference: wandb.Image logging at the
        sample cadence, /root/reference/train.py:240-242). Logged to
        wandb when available; always recorded in the JSONL stream (by
        path, not pixels) so headless runs keep an auditable trail."""
        if image is None and path is None:
            raise ValueError("log_image needs `image` or `path`")
        if self._file is None:
            return
        if self._wandb is not None:
            payload = image if image is not None else path
            self._wandb.log({name: self._wandb.Image(payload), "step": step})
        rec = {"step": step, "ts": time.time(), "image": name}
        if path is not None:
            rec["path"] = path
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def close(self):
        if self._file is not None:
            self._file.close()


def save_image(image, path: str) -> None:
    """Save an HWC [0,1] float or uint8 array as PNG/JPG."""
    import numpy as np
    from PIL import Image

    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
    if arr.ndim == 4:
        arr = arr[0]
    Image.fromarray(arr).save(path)


_PREVIEW_COLORS = (  # Tubuli, Vein/Vessel, Artery, Glomerui
    (0.90, 0.15, 0.15),
    (0.15, 0.80, 0.20),
    (0.20, 0.35, 0.95),
    (0.95, 0.85, 0.10),
)


def save_labelmap_preview(patch, path: str, labelmap=None) -> None:
    """Headless equivalent of the reference's pre-training dataset
    preview (/root/reference/train.py:165-172, train_kumar.py:107-113):
    the patch with each labelmap channel alpha-blended in a fixed
    distinct colour (the reference used random colormaps + plt.show;
    here deterministic colours, written to disk)."""
    import numpy as np

    img = np.array(patch, np.float32, copy=True)
    if labelmap is not None:
        lm = np.asarray(labelmap)
        for c in range(lm.shape[-1]):
            mask = lm[..., c] > 0
            color = np.asarray(_PREVIEW_COLORS[c % len(_PREVIEW_COLORS)], np.float32)
            img[mask] = 0.5 * img[mask] + 0.5 * color
    save_image(img, path)


def print_memory_usage(prefix: str = "") -> None:
    """Per-device HBM usage (parity with the reference's CUDA memory
    print, /root/reference/sample_ultra_res.py:68-72)."""
    import jax

    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            used = stats.get("bytes_in_use", 0) / 2**30
            limit = stats.get("bytes_limit", 0) / 2**30
            print(f"{prefix}{d}: {used:.2f} / {limit:.2f} GiB in use", flush=True)
        else:
            print(f"{prefix}{d}: memory stats unavailable", flush=True)


def host_rss_gb() -> float:
    """This process's resident set size in GiB (Linux /proc; NaN
    elsewhere). The tunnel-client RAM-leak watchdog reads this."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 2**20  # kB -> GiB
    except (OSError, ValueError, IndexError):
        pass
    return float("nan")


def host_mem_total_gb() -> float:
    """Total host RAM in GiB (Linux /proc/meminfo; NaN elsewhere)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) / 2**20
    except (OSError, ValueError, IndexError):
        pass
    return float("nan")


class ResWatchdog:
    """Warns (once per threshold) when host RES approaches the wedge.

    Round-4 failure mode: per-step numpy batch uploads leak RAM in the
    TPU tunnel client until the process stalls at 0% CPU with a stale
    log — around RES 80-100 GB on a 126 GB host, i.e. well before the
    OOM killer would make the failure loud. This watchdog makes it
    loud EARLY and names the fix (--device_pool)."""

    def __init__(self, warn_fractions=(0.3, 0.5, 0.7), print_fn=None):
        if print_fn is None:
            print_fn = lambda *a: print(*a, flush=True)  # noqa: E731
        self._total = host_mem_total_gb()
        self._pending = sorted(warn_fractions, reverse=True)
        self._print = print_fn

    def check(self) -> float:
        """Returns current RES in GiB; prints at most one new warning."""
        rss = host_rss_gb()
        if self._total and rss and self._pending and not (
            rss != rss or self._total != self._total  # NaN guards
        ):
            frac = rss / self._total
            while self._pending and frac >= self._pending[-1]:
                level = self._pending.pop()
                self._print(
                    f"WARNING: host RES {rss:.1f} GiB = {frac:.0%} of "
                    f"{self._total:.0f} GiB (threshold {level:.0%}). "
                    f"Per-step batch uploads leak tunnel-client RAM on "
                    f"this backend and wedge the process near 65-80% "
                    f"(CLAUDE.md round 4); long runs should stage "
                    f"batches with --device_pool."
                )
        return rss


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
