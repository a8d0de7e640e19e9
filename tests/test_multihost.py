"""Multi-host semantics under simulated process topology.

The reference trains multi-GPU via `accelerate launch` DDP
(/root/reference/train.py:124-128) where each rank sees a different
shard of the data and only the main process logs/saves. Here the
equivalents are `shard_by_process` striping in the loader and
`Trainer.is_main` gating; both are asserted under monkeypatched
`jax.process_index/process_count` (a real multi-process run needs a
pod; the striping/gating logic is process-count-generic).
"""

import numpy as np
import jax
import pytest

from kidney_diffusion_tpu.data.pipeline import make_loader


class _IndexDataset:
    """Each item is its own index -> batches reveal exactly which
    indices a process consumed."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2,), i, np.int32)


def _epoch_indices(proc, nproc, *, n=32, bs=4, monkeypatch):
    monkeypatch.setattr(jax, "process_index", lambda: proc)
    monkeypatch.setattr(jax, "process_count", lambda: nproc)
    with make_loader(
        _IndexDataset(n), batch_size=bs, shuffle=True, seed=7,
        num_workers=2, shard_by_process=True,
    ) as it:
        per_proc = n // nproc
        batches = [next(it) for _ in range(per_proc // bs)]
    return np.concatenate([b["images"][:, 0] for b in batches])


def test_shard_by_process_disjoint_cover(monkeypatch):
    """4 fake hosts, shuffled with the same seed: per-host stripes are
    disjoint and together cover the whole epoch."""
    nproc, n = 4, 32
    stripes = [
        _epoch_indices(p, nproc, n=n, monkeypatch=monkeypatch) for p in range(nproc)
    ]
    all_idx = np.concatenate(stripes)
    assert len(all_idx) == n
    assert len(np.unique(all_idx)) == n  # disjoint + full cover
    for s in stripes:
        assert len(s) == n // nproc


def test_shard_by_process_identical_permutation(monkeypatch):
    """Striping is only disjoint because every host draws the SAME
    seeded permutation; assert stripes interleave one global order."""
    nproc, n, bs = 2, 16, 8
    s0 = _epoch_indices(0, nproc, n=n, bs=bs, monkeypatch=monkeypatch)
    s1 = _epoch_indices(1, nproc, n=n, bs=bs, monkeypatch=monkeypatch)
    rng = np.random.default_rng(7)
    order = rng.permutation(n)
    np.testing.assert_array_equal(s0, order[0::2])
    np.testing.assert_array_equal(s1, order[1::2])


def test_is_main_gates_print_and_save(monkeypatch, capsys, tmp_path):
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade
    from kidney_diffusion_tpu.train import Trainer

    tr = Trainer(Cascade(tiny_test_cascade()))

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    assert not tr.is_main
    tr.print("should be silent")
    assert capsys.readouterr().out == ""

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    assert tr.is_main
    tr.print("visible")
    assert "visible" in capsys.readouterr().out


def test_setup_distributed_flag(monkeypatch):
    """--multihost triggers jax.distributed initialisation with the CLI
    topology arguments; without the flag nothing is initialised."""
    import argparse

    from kidney_diffusion_tpu.cli import train_loop
    from kidney_diffusion_tpu.parallel import mesh as mesh_mod

    calls = []
    monkeypatch.setattr(
        mesh_mod, "initialize_distributed",
        lambda **kw: calls.append(kw),
    )

    p = argparse.ArgumentParser()
    train_loop.add_distributed_args(p)

    args = p.parse_args([])
    assert train_loop.setup_distributed(args) is None
    assert calls == []

    args = p.parse_args(
        ["--multihost", "--coordinator_address", "host:1234",
         "--num_processes", "4", "--process_id", "2"]
    )
    mesh = train_loop.setup_distributed(args)
    assert mesh is not None and mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    assert calls == [{
        "coordinator_address": "host:1234",
        "num_processes": 4,
        "process_id": 2,
    }]


def test_stripe_smaller_than_batch_raises(monkeypatch):
    """A per-process stripe that cannot fill one batch must fail loudly
    at construction (it used to busy-spin the producer forever)."""
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 8)
    with pytest.raises(ValueError, match="stripe"):
        make_loader(_IndexDataset(32), batch_size=8, shard_by_process=True)


def test_equal_batches_per_epoch_with_remainder(monkeypatch):
    """n % nproc != 0: stripes truncate to n // nproc so every host sees
    the same number of batches per epoch (no cross-epoch drift)."""
    n, nproc, bs = 35, 4, 4
    stripes = [
        _epoch_indices(p, nproc, n=n, bs=bs, monkeypatch=monkeypatch)
        for p in range(nproc)
    ]
    assert all(len(s) == (n // nproc) // bs * bs for s in stripes)
    all_idx = np.concatenate(stripes)
    assert len(np.unique(all_idx)) == len(all_idx)  # still disjoint


def test_multihost_checkpoint_save_gates_io(monkeypatch, tmp_path):
    """Non-main processes participate in the (collective) save but must
    not pre-delete or write metadata."""
    from kidney_diffusion_tpu.utils import checkpoint as ckpt

    path = str(tmp_path / "c")
    ckpt.save_checkpoint(path, {"a": np.ones((2,), np.float32)})
    assert ckpt.load_metadata(path)["version"]

    # simulate a non-main process: rmtree/meta-write must be skipped
    # (patch the barrier out — there is only one real process here)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    import jax.experimental.multihost_utils as mhu

    monkeypatch.setattr(mhu, "sync_global_devices", lambda name: None)
    before = ckpt.load_metadata(path)
    try:
        ckpt.save_checkpoint(path, {"a": np.full((2,), 2.0, np.float32)})
    except Exception:
        pass  # orbax may refuse to overwrite without the pre-delete — the
        # point is that THIS process never deleted the existing data
    assert ckpt.load_metadata(path) == before  # untouched by non-main
