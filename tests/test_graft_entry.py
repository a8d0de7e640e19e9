"""Driver-facing entry points: the multichip dryrun must pass even when
the calling process has already initialized a 1-device backend (the exact
failure mode of round 1's MULTICHIP_r01.json)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_survives_initialized_backend():
    # Parent initializes a single-CPU-device backend BEFORE calling
    # dryrun_multichip — jax.config.update can no longer switch platforms
    # in that process, so the dryrun must re-exec itself.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        f"import sys; sys.path.insert(0, {REPO!r}); "
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8); "
        "print('DRYRUN_OK')"
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # parent has only 1 device
    env.pop("_KDT_DRYRUN_CHILD", None)
    # this test pins the re-exec/backend behavior; the flagship 631M
    # section takes ~35 min on one time-sliced core and is exercised by
    # the driver's real dryrun (its config preconditions are pinned fast
    # in test_flagship_dry_config below)
    env["KDT_DRYRUN_FLAGSHIP"] = "0"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "DRYRUN_OK" in proc.stdout


def test_flagship_dry_config():
    """Fast drift tripwire: if the production ultra_res v_param config
    moves away from what dryrun_multichip's flagship section assumes
    (chunked-spatial stage 3, 256² crops, crop/chunk divisibility), this
    fails in the fast suite instead of at driver time — round 3's
    spatial_chunks 8->16 default change broke the driver dryrun exactly
    this way."""
    import sys

    sys.path.insert(0, REPO)
    import __graft_entry__

    cfg = __graft_entry__.flagship_dry_config()
    st3 = cfg.stages[2]
    assert st3.random_crop_size == 32 and st3.unet.spatial_chunks == 2
    # the dry crop must keep the chunked path active at every level
    assert st3.random_crop_size % (2 * 2 ** st3.unet.num_levels) == 0


@pytest.mark.slow
def test_entry_returns_jittable():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # compile-check only (lowering is cheap on CPU; execution isn't needed)
    jax.jit(fn).lower(*args)
