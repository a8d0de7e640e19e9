"""Operational-robustness contracts around checkpoint IO and backends.

The flagship checkpoint save lasts ~11 minutes on the tunnel — far
longer than the training between saves — so "what survives a kill or a
bad file" is a first-class behavior, not an edge case (the reference's
whole operating model is kill-and-resume, /root/reference/train.py:188):

  * save over an existing checkpoint must be crash-safe: the OLD
    checkpoint stays intact until the new one is fully written
    (utils/checkpoint.py writes a .tmp_save sibling, then swaps)
  * a failed restore must say loudly that the trainer's live state was
    dropped (Trainer.load frees states before restoring to fit the
    631M stage in HBM — a silent failure would let a checkpoint sweep
    record fresh-init garbage)
  * a stale pre-API-change libkdt_native.so must degrade to
    native.available() == False, not crash every open_slide
  * open_slide must route J2K slides that the native engine can't
    decode to slideio (which bundles openjpeg) before failing loudly
"""

import numpy as np
import pytest

from kidney_diffusion_tpu.cascade import Cascade
from kidney_diffusion_tpu.models.configs import tiny_test_cascade
from kidney_diffusion_tpu.train import Trainer
from kidney_diffusion_tpu.utils import checkpoint as ckpt


def _batch(seed=0):
    return {"images": np.random.RandomState(seed).rand(2, 32, 32, 3).astype(np.float32)}


def test_save_over_existing_is_crash_safe(tmp_path, monkeypatch):
    """A save that dies mid-write (simulated: the orbax writer raises
    after partially populating the destination) must leave the previous
    checkpoint fully restorable; the next good save must still work."""
    path = str(tmp_path / "ckpt")
    tr = Trainer(Cascade(tiny_test_cascade()))
    tr.train_step(1, _batch())
    tr.save(path)
    want = [np.asarray(l) for l in __import__("jax").tree.leaves(tr.state(1).params)]

    class _DyingCkptr:
        def save(self, p, tree):
            p.mkdir(parents=True, exist_ok=True)
            (p / "partial_garbage").write_text("x")  # partial write
            raise RuntimeError("simulated kill mid-save")

        def wait_until_finished(self):
            pass

    real = ckpt._checkpointer
    monkeypatch.setattr(ckpt, "_checkpointer", lambda: _DyingCkptr())
    tr.train_step(1, _batch(1))
    with pytest.raises(RuntimeError, match="simulated kill"):
        tr.save(path)
    monkeypatch.setattr(ckpt, "_checkpointer", real)

    # the OLD checkpoint is still there and still restores the OLD values
    assert ckpt.checkpoint_exists(path)
    tr2 = Trainer(Cascade(tiny_test_cascade()))
    assert tr2.load(path)
    assert tr2.num_steps_taken(1) == 1
    got = [np.asarray(l) for l in __import__("jax").tree.leaves(tr2.state(1).params)]
    for a, b in zip(want, got):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # a subsequent good save replaces it (leftover .tmp_save is reused)
    tr.save(path)
    tr3 = Trainer(Cascade(tiny_test_cascade()))
    assert tr3.load(path)
    assert tr3.num_steps_taken(1) == 2
    assert not (tmp_path / "ckpt.tmp_save").exists()


def test_failed_restore_reports_dropped_state(tmp_path):
    """Corrupt checkpoint: Trainer.load raises an error that names the
    dropped stages instead of letting the trainer silently re-initialise
    (the sweep-eval footgun)."""
    path = tmp_path / "ckpt"
    tr = Trainer(Cascade(tiny_test_cascade()))
    tr.train_step(1, _batch())
    tr.save(str(path))

    # gut the checkpoint but keep the directory + metadata: it still
    # "exists", but the restore cannot succeed
    meta = (path / "kdt_meta.json").read_text()
    for child in path.iterdir():
        if child.is_dir():
            import shutil

            shutil.rmtree(child)
        else:
            child.unlink()
    (path / "kdt_meta.json").write_text(meta)

    with pytest.raises(RuntimeError, match="dropp?ed|dropping") as ei:
        tr.load(str(path))
    assert "re-initialise" in str(ei.value)
    assert ei.value.__cause__ is not None  # original restore error chained


def test_stale_native_lib_degrades(monkeypatch, capsys):
    """A .so missing newly-added symbols must make available() False
    (with a rebuild hint), not raise out of every open_slide."""
    from kidney_diffusion_tpu.data import native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(
        native, "_bind",
        lambda lib: (_ for _ in ()).throw(AttributeError("kdt_tiff_compression")),
    )
    if not any(__import__("os").path.exists(p) for p in native._LIB_PATHS):
        pytest.skip("native engine not built")
    assert native.available() is False
    assert "rebuild" in capsys.readouterr().out
    monkeypatch.setattr(native, "_lib", None)  # don't poison other tests


def test_open_slide_j2k_tries_slideio_first(monkeypatch, tmp_path):
    """UnsupportedSlideError from the native reader routes to slideio
    (it can decode Aperio J2K); without slideio the original loud error
    propagates — never the PIL fallback that would also fail."""
    from kidney_diffusion_tpu.data import native, wsi

    def _raise_unsupported(path):
        raise native.UnsupportedSlideError("J2K, no decoder")

    monkeypatch.setattr(native, "available", lambda: True)
    monkeypatch.setattr(native, "NativeSlide", _raise_unsupported)

    sentinel = object()
    monkeypatch.setattr(wsi, "SlideioSlide", lambda path: sentinel)
    assert wsi.open_slide("fake.svs") is sentinel

    def _no_slideio(path):
        raise ImportError("no module named slideio")

    monkeypatch.setattr(wsi, "SlideioSlide", _no_slideio)
    with pytest.raises(native.UnsupportedSlideError):
        wsi.open_slide("fake.svs")
