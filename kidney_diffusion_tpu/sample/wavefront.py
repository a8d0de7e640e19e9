"""Wavefront scheduling for the gigapixel patch grid (pure functions).

The reference schedules patches dynamically: every GPU worker pops a
patch from a queue and re-enqueues it if its neighbours (above, next-to
in the chosen orientation, and the diagonal between them) aren't
generated yet (/root/reference/sample_ultra_res.py:92-143,403-412).

TPU-first redesign: the dependency order is a static property of the
patch set, so the whole schedule is computed UP FRONT as a list of
*waves*. Every patch in wave k depends only on patches in waves < k, so
each wave can be generated as ONE batched, device-resident denoise scan
— no queues, no processes, no spin-waiting. Wave sizes are padded to a
small set of buckets so XLA compiles a handful of batch shapes, not one
per wave.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

Pos = Tuple[int, int]


def deps(pos: Pos, orientation: int) -> Tuple[Pos, Pos, Pos]:
    """The three neighbours a patch waits for
    (/root/reference/sample_ultra_res.py:99-104)."""
    i, j = pos
    return (i - 1, j), (i, j + orientation), (i - 1, j + orientation)


def ready_patches(
    remaining: Sequence[Pos], orientation: int
) -> Tuple[List[Pos], List[Pos]]:
    """Split `remaining` into (ready, waiting): a patch is ready when none
    of its dependencies are still in `remaining`
    (the reference's `get_next_patches`, sample_ultra_res.py:403-412)."""
    remaining_set = set(remaining)
    ready, waiting = [], []
    for pos in remaining:
        if any(d in remaining_set for d in deps(pos, orientation)):
            waiting.append(pos)
        else:
            ready.append(pos)
    return ready, waiting


def choose_orientation(patch_pos: Sequence[Pos]) -> int:
    """Pick the sweep direction whose first wave is larger
    (/root/reference/sample_ultra_res.py:423-426)."""
    left = len(ready_patches(patch_pos, -1)[0])
    right = len(ready_patches(patch_pos, 1)[0])
    return -1 if left > right else 1


def plan_waves(patch_pos: Sequence[Pos], orientation: int) -> List[List[Pos]]:
    """Static wavefront schedule: list of waves, each a list of positions.

    Invariant (property-tested): every patch's dependencies lie in
    strictly earlier waves; the union of all waves is `patch_pos`.
    """
    remaining = list(patch_pos)
    waves: List[List[Pos]] = []
    while remaining:
        ready, remaining = ready_patches(remaining, orientation)
        if not ready:
            raise RuntimeError(
                f"wavefront deadlock with {len(remaining)} patches; "
                "dependency graph must be acyclic for grid patches"
            )
        waves.append(ready)
    return waves


def bucket_size(n: int, buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128)) -> int:
    """Smallest bucket >= n (recompilation guard for variable wave sizes)."""
    for b in buckets:
        if n <= b:
            return b
    return ((n + buckets[-1] - 1) // buckets[-1]) * buckets[-1]


def full_grid(num_patches_width: int) -> List[Pos]:
    """All positions of an N×N grid (outpainting / coarse mag levels,
    /root/reference/outpainting.py:179-180, sample_ultra_res.py:354)."""
    return [(i, j) for i in range(num_patches_width) for j in range(num_patches_width)]
