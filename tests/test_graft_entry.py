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


@pytest.mark.slow
def test_entry_returns_jittable():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # compile-check only (lowering is cheap on CPU; execution isn't needed)
    jax.jit(fn).lower(*args)
