"""run_training loop behavior + remote-URI checkpointing.

Covers:
  * sample-image logging at the sample cadence (reference logs generated
    samples to wandb, /root/reference/train.py:240-242) — here the
    JSONL stream must carry an image record per sample even without wandb
  * checkpoint save/load through remote-style URIs (gs://...), the
    fsspec capability of /root/reference/sample_ultra_res.py:51-53,
    exercised offline via a URI mount
"""

import json
import os

import numpy as np
import pytest

from kidney_diffusion_tpu.cascade import Cascade
from kidney_diffusion_tpu.models.configs import tiny_test_cascade
from kidney_diffusion_tpu.train import Trainer
from kidney_diffusion_tpu.cli.train_loop import default_sample_fn, run_training


class _DS:
    def __init__(self, n=16, size=32):
        rng = np.random.RandomState(0)
        self.x = rng.rand(n, size, size, 3).astype(np.float32)

    def __len__(self):
        return len(self.x)

    def __getitem__(self, i):
        return self.x[i]


@pytest.mark.slow
def test_run_training_logs_images(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ds = _DS()
    tr = Trainer(Cascade(tiny_test_cascade()))
    tr.add_train_dataset(ds, batch_size=2)
    tr.add_valid_dataset(ds, batch_size=2)

    run_training(
        tr,
        unet_number=1,
        checkpoint_path=str(tmp_path / "ckpt"),
        sample_freq=2,
        valid_every=2,
        max_steps=5,
        sample_fn=default_sample_fn(ds, 1, batch_size=1),
        sample_dir=str(tmp_path / "samples"),
        project="testproj",
        run_id="fixedrun",
        use_wandb=False,
    )

    # PNGs dumped at steps 2 and 4
    out_dir = tmp_path / "samples" / "fixedrun"
    pngs = sorted(os.listdir(out_dir))
    assert any(p.startswith("sample-2-") for p in pngs)
    assert any(p.startswith("sample-4-") for p in pngs)

    # JSONL carries loss, val_loss AND image records
    (log_file,) = (tmp_path / "logs").glob("testproj_unet1-fixedrun.jsonl")
    records = [json.loads(l) for l in log_file.read_text().splitlines()]
    assert any("loss" in r for r in records)
    assert any("val_loss" in r for r in records)
    img_recs = [r for r in records if "image" in r]
    assert {r["step"] for r in img_recs} == {2, 4}
    for r in img_recs:
        assert os.path.exists(r["path"])


def test_log_image_jsonl_without_wandb(tmp_path, monkeypatch):
    from kidney_diffusion_tpu.utils.logging import MetricsLogger

    monkeypatch.chdir(tmp_path)
    lg = MetricsLogger("p", run_id="r", use_wandb=False)
    lg.log_image(7, "sample-7-0.png", path="/tmp/x.png")
    lg.close()
    rec = json.loads((tmp_path / "logs" / "p-r.jsonl").read_text().splitlines()[0])
    assert rec == {"step": 7, "ts": rec["ts"], "image": "sample-7-0.png", "path": "/tmp/x.png"}


def test_remote_uri_checkpoint(tmp_path):
    """Full save/load/partial/exists cycle through gs:// URIs (mounted
    onto a local dir — covers everything except the GCS wire itself)."""
    from kidney_diffusion_tpu.utils import checkpoint as ckpt

    bucket = "gs://kdt-test-bucket"
    ckpt.mount_uri_prefix(bucket, str(tmp_path / "bucket"))
    try:
        uri = f"{bucket}/run1/ckpt"
        tr = Trainer(Cascade(tiny_test_cascade()))
        tr.train_step(1, {"images": np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)})
        assert not ckpt.checkpoint_exists(uri)
        tr.save(uri)
        assert ckpt.checkpoint_exists(uri)
        # bytes actually landed under the mount target
        assert (tmp_path / "bucket" / "run1" / "ckpt").is_dir()

        tr2 = Trainer(Cascade(tiny_test_cascade()))
        assert tr2.load(uri)
        assert tr2.num_steps_taken(1) == 1
        import jax

        for a, b in zip(jax.tree.leaves(tr.state(1).params), jax.tree.leaves(tr2.state(1).params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        # partial restore + cold start over URIs
        tr3 = Trainer(Cascade(tiny_test_cascade()))
        assert tr3.load(uri, partial=True)
        assert not tr3.load(f"{bucket}/missing", noop_if_not_exist=True)
    finally:
        ckpt.unmount_uri_prefix(bucket)


def test_metrics_logger_disabled_is_noop(tmp_path, monkeypatch):
    from kidney_diffusion_tpu.utils.logging import MetricsLogger

    monkeypatch.chdir(tmp_path)
    lg = MetricsLogger("p", run_id="r", use_wandb=False, enabled=False)
    lg.log(1, loss=0.5)
    lg.log_image(1, "x.png", path="/tmp/x.png")
    lg.close()
    assert not (tmp_path / "logs").exists()


def test_downsample_kernel_layout_migration(tmp_path):
    """Old checkpoints hold Downsample proj kernels as (1,1,4C,D); the
    strided-conv form is (2,2,C,D) with identical values — partial
    restore must reshape, not silently skip."""
    import jax.numpy as jnp

    from kidney_diffusion_tpu.utils import checkpoint as ckpt

    import optax

    rng = np.random.RandomState(0)
    old_kernel = rng.randn(1, 1, 20, 7).astype(np.float32)
    old_params = {"down0_pre": {"proj": {"kernel": jnp.asarray(old_kernel)}},
                  "other": jnp.ones((3,))}
    # include optimizer state: NamedTuple leaves exercise the
    # metadata-ordered non-partial migration path
    opt = optax.adam(1e-3).init(old_params)
    path = str(tmp_path / "old")
    ckpt.save_checkpoint(path, {"params": old_params, "opt": opt, "step": 7})

    new_params = {"down0_pre": {"proj": {"kernel": jnp.zeros((2, 2, 5, 7))}},
                  "other": jnp.zeros((3,))}
    target = {"params": new_params, "opt": optax.adam(1e-3).init(new_params),
              "step": 0}

    for partial in (True, False):
        restored = ckpt.load_checkpoint(path, target, partial=partial)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["down0_pre"]["proj"]["kernel"]),
            old_kernel.reshape(2, 2, 5, 7), err_msg=f"partial={partial}",
        )
        assert int(restored["step"]) == 7
    # opt-state momenta migrate too on the non-partial path
    np.testing.assert_allclose(
        np.asarray(restored["opt"][0].mu["down0_pre"]["proj"]["kernel"]).ravel(),
        np.asarray(opt[0].mu["down0_pre"]["proj"]["kernel"]).ravel(),
    )

    # a genuinely incompatible shape still fails loudly non-partially
    bad_params = {"down0_pre": {"proj": {"kernel": jnp.zeros((2, 2, 5, 7))}},
                  "other": jnp.zeros((4,))}
    bad = {"params": bad_params, "opt": optax.adam(1e-3).init(bad_params),
           "step": 0}
    with pytest.raises(Exception):
        ckpt.load_checkpoint(path, bad, partial=False)


def test_save_labelmap_preview(tmp_path):
    """Preview overlay: masked pixels are blended toward the channel
    colour, unmasked pixels (and the labelmap=None path) are untouched
    (headless stand-in for train.py:165-172)."""
    import numpy as np
    from PIL import Image

    from kidney_diffusion_tpu.utils.logging import save_labelmap_preview

    patch = np.full((8, 8, 3), 0.4, np.float32)
    lm = np.zeros((8, 8, 2), np.float32)
    lm[:4, :, 0] = 1.0  # top half: channel 0 (red-ish)

    out = tmp_path / "p.png"
    save_labelmap_preview(patch, str(out), lm)
    px = np.asarray(Image.open(out)).astype(np.float32) / 255.0
    assert px[0, 0, 0] > px[0, 0, 2]  # blended toward red
    np.testing.assert_allclose(px[7, 7], 0.4, atol=0.01)  # untouched

    save_labelmap_preview(patch, str(out), None)
    px = np.asarray(Image.open(out)).astype(np.float32) / 255.0
    np.testing.assert_allclose(px, 0.4, atol=0.01)


# ---------------------------------------------------------------------------
# DeviceBatchPool — the framework-owned fix for the tunnel-client RAM leak
# (per-step uploads leak host RAM proportional to cumulative bytes; two
# multi-hour on-chip runs wedged at RES 82-104 GB in round 4)
# ---------------------------------------------------------------------------


def test_device_batch_pool_bounds_uploads_and_cycles():
    from kidney_diffusion_tpu.data.pipeline import DeviceBatchPool

    placed = []

    def place(b):
        placed.append(b)
        return {"tag": b["tag"], "placed": True}

    src = iter({"tag": i} for i in range(10_000))
    pool = DeviceBatchPool(src, size=3, place=place, refresh_every=10)
    seen = [next(pool)["tag"] for _ in range(100)]
    # uploads bounded: 3 to fill + ~1 per 10 draws after, NOT 100
    assert pool.uploads <= 3 + 100 // 10 + 1
    assert pool.uploads == len(placed)
    # first three draws stage fresh batches, then cycling starts
    assert seen[:3] == [0, 1, 2]
    # refresh walks the source: later draws include batches staged later
    assert max(seen) > 2
    # every drawn batch went through place()
    assert all(t in {b["tag"] for b in placed} for t in seen)


def test_device_batch_pool_fixed_when_no_refresh():
    from kidney_diffusion_tpu.data.pipeline import DeviceBatchPool

    src = iter({"tag": i} for i in range(100))
    pool = DeviceBatchPool(src, size=2, place=lambda b: b, refresh_every=0)
    seen = [next(pool)["tag"] for _ in range(50)]
    assert pool.uploads == 2 and set(seen) == {0, 1}


def test_device_batch_pool_close_closes_source():
    from kidney_diffusion_tpu.data.pipeline import DeviceBatchPool

    class Src:
        closed = False

        def __next__(self):
            return {"x": 0}

        def close(self):
            self.closed = True

    src = Src()
    pool = DeviceBatchPool(src, size=1, place=lambda b: b)
    next(pool)
    pool.close()
    assert src.closed


def test_trainer_device_pool_trains_with_bounded_uploads():
    """The product path (Trainer.add_train_dataset(device_pool=N)) must
    train normally while staging only pool-sized uploads — this is the
    CLI --device_pool path that keeps >2000-step runs from wedging."""
    import jax

    ds = _DS(n=8, size=32)
    tr = Trainer(Cascade(tiny_test_cascade()))
    tr.add_train_dataset(ds, batch_size=2, device_pool=2,
                         pool_refresh_every=5, num_workers=1)
    losses = [tr.train_step(1) for _ in range(12)]
    assert all(np.isfinite(l) for l in losses)
    pool = tr._train_iter
    assert pool.uploads <= 2 + 12 // 5 + 1  # bounded, not 12
    # staged batches are jax Arrays and pass through _shard untouched
    batch = next(pool)
    assert isinstance(batch["images"], jax.Array)
    shard_again = tr._shard(batch)
    assert shard_again["images"] is batch["images"]
    pool.close()
