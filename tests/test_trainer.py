import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kidney_diffusion_tpu.cascade import Cascade
from kidney_diffusion_tpu.models.configs import tiny_test_cascade
from kidney_diffusion_tpu.parallel.mesh import make_mesh
from kidney_diffusion_tpu.train import Trainer


class SyntheticDataset:
    """Tuple-protocol dataset like the reference's PatientDataset."""

    def __init__(self, n=32, size=32, with_conds=False):
        rng = np.random.default_rng(0)
        self.images = rng.uniform(size=(n, size, size, 3)).astype(np.float32)
        self.with_conds = with_conds
        if with_conds:
            self.text = rng.normal(size=(n, 1, 3)).astype(np.float32)
            self.cond = rng.uniform(size=(n, size, size, 2)).astype(np.float32)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        if self.with_conds:
            return self.images[i], self.text[i], self.cond[i]
        return self.images[i]


@pytest.fixture(scope="module")
def cascade():
    return Cascade(tiny_test_cascade())


def _batch(b=4, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return {"images": rng.uniform(size=(b, size, size, 3)).astype(np.float32)}


def test_train_step_decreases_loss(cascade):
    tr = Trainer(cascade, lr=2e-3, max_grad_norm=1.0)
    batch = _batch()
    losses = [tr.train_step(1, batch) for _ in range(15)]
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert tr.num_steps_taken(1) == 15
    assert tr.num_steps_taken(2) == 0


def test_valid_step(cascade):
    tr = Trainer(cascade)
    loss = tr.valid_step(1, _batch())
    assert np.isfinite(loss)


def test_only_train_unet_guard(cascade):
    tr = Trainer(cascade, only_train_unet_number=2)
    with pytest.raises(ValueError):
        tr.train_step(1, _batch())


def test_grad_accum_matches_full_batch_shape(cascade):
    tr = Trainer(cascade, grad_accum_chunks=2)
    loss = tr.train_step(1, _batch(b=4))
    assert np.isfinite(loss)
    assert tr.num_steps_taken(1) == 1


def test_save_load_roundtrip(cascade, tmp_path):
    path = str(tmp_path / "ckpt")
    tr = Trainer(cascade, lr=1e-3)
    for _ in range(3):
        tr.train_step(1, _batch())
    tr.save(path)

    tr2 = Trainer(cascade, lr=1e-3)
    assert tr2.load(path)
    assert tr2.num_steps_taken(1) == 3
    p1 = tr.state(1).params
    p2 = tr2.state(1).params
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # noop_if_not_exist cold start
    tr3 = Trainer(cascade)
    assert not tr3.load(str(tmp_path / "missing"), noop_if_not_exist=True)
    with pytest.raises(FileNotFoundError):
        tr3.load(str(tmp_path / "missing"))


def test_load_fresh_trainer_skips_device_init(cascade, tmp_path):
    """Non-partial restore into a trainer that has never materialised the
    stage must NOT initialise it on device first: for the flagship 631M
    stage, init (10 GB) + restore (10 GB) OOMs a 16 GB chip (measured,
    round 3). The restore target must be abstract; values still match."""
    path = str(tmp_path / "ckpt")
    tr = Trainer(cascade, lr=1e-3)
    for _ in range(2):
        tr.train_step(1, _batch())
    tr.save(path)

    tr2 = Trainer(cascade, lr=1e-3)

    def boom(unet_number):
        raise AssertionError(
            f"load materialised stage {unet_number} on device before restore"
        )

    tr2._init_stage = boom
    assert tr2.load(path)
    assert tr2.num_steps_taken(1) == 2
    for a, b in zip(
        jax.tree.leaves(tr.state(1).params), jax.tree.leaves(tr2.state(1).params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # the restored state is fully trainable (shardings/dtypes intact)
    assert np.isfinite(tr2.train_step(1, _batch()))
    assert tr2.num_steps_taken(1) == 3

    # RE-loading into the now-materialized trainer must also go through
    # the abstract path (the old state is fully replaced — keeping it
    # alive during restore doubles peak HBM, e.g. checkpoint-sweep eval
    # loops): values return to the checkpoint, again without init
    assert tr2.load(path)
    assert tr2.num_steps_taken(1) == 2
    for a, b in zip(
        jax.tree.leaves(tr.state(1).params), jax.tree.leaves(tr2.state(1).params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ema_only_save_serves_and_merges(cascade, tmp_path):
    """`save(ema_only=True)` writes a serving checkpoint (EMA + step,
    1/4 the bytes) that a fresh trainer restores with partial=True —
    the distilled-student artifact flow (tools/distill_flagship.py):
    full teacher checkpoint first, then the ema-only student overrides
    the stage's EMA while everything else stays the teacher's."""
    teacher_path = str(tmp_path / "teacher")
    student_path = str(tmp_path / "student")
    tr = Trainer(cascade, lr=1e-3)
    for _ in range(2):
        tr.train_step(1, _batch())
    tr.save(teacher_path)
    for _ in range(3):  # diverge: the "student" continues training
        tr.train_step(1, _batch())
    tr.save(student_path, ema_only=True)
    student_ema = jax.tree.leaves(tr.state(1).ema_params)
    student_params = jax.tree.leaves(tr.state(1).params)

    tr2 = Trainer(cascade, lr=1e-3)
    assert tr2.load(teacher_path)
    teacher_params = [np.asarray(x) for x in jax.tree.leaves(tr2.state(1).params)]
    assert tr2.load(student_path, partial=True)
    # EMA is the student's...
    got_ema = jax.tree.leaves(tr2.state(1).ema_params)
    for a, b in zip(student_ema, got_ema):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert tr2.num_steps_taken(1) == 5
    # ...while raw params stayed the teacher checkpoint's (merge, not wipe)
    got_params = jax.tree.leaves(tr2.state(1).params)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        for a, b in zip(student_params, got_params)
    )
    assert changed, "params should NOT have been overwritten by the ema-only ckpt"
    for a, b in zip(teacher_params, got_params):
        np.testing.assert_allclose(a, np.asarray(b), atol=1e-6)


def test_partial_restore(cascade, tmp_path):
    """restore_parts equivalent: shape-mismatched leaves keep init values."""
    import dataclasses

    path = str(tmp_path / "ckpt")
    tr = Trainer(cascade)
    tr.train_step(1, _batch())
    tr.save(path)

    # a cascade with a different stage-1 width -> most shapes mismatch
    cc2 = tiny_test_cascade()
    st = cc2.stages[0]
    st = dataclasses.replace(st, unet=dataclasses.replace(st.unet, dim=24))
    cc2 = dataclasses.replace(cc2, stages=(st, cc2.stages[1]))
    tr2 = Trainer(Cascade(cc2))
    tr2.load(path, partial=True)  # must not raise
    assert tr2.num_steps_taken(1) == 1  # scalar step restores fine


def test_ema_sample(cascade):
    tr = Trainer(cascade)
    tr.train_step(1, _batch())
    tr.train_step(2, _batch())
    out = tr.sample(batch_size=1, stop_at_unet_number=1)
    assert out.shape == (1, 16, 16, 3)


def test_dataset_attachment(cascade):
    tr = Trainer(cascade)
    ds = SyntheticDataset()
    tr.add_train_dataset(ds, batch_size=4)
    loss = tr.train_step(1)
    assert np.isfinite(loss)


def test_data_parallel_mesh(cascade):
    mesh = make_mesh(data=8, model=1)
    tr = Trainer(cascade, mesh=mesh, lr=2e-3)
    batch = _batch(b=8)
    losses = [tr.train_step(1, batch) for _ in range(10)]
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_fsdp_mesh(cascade):
    mesh = make_mesh(data=2, model=4)
    tr = Trainer(cascade, mesh=mesh, fsdp=True)
    loss = tr.train_step(1, _batch(b=4))
    assert np.isfinite(loss)


def _assert_states_close(s1, s2, atol):
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)
    for a, b in zip(jax.tree.leaves(s1.ema_params), jax.tree.leaves(s2.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def _parity_run(cascade, mesh, fsdp, steps=3, seed=11):
    tr = Trainer(cascade, mesh=mesh, fsdp=fsdp, lr=1e-3, max_grad_norm=1.0, seed=seed)
    losses = [tr.train_step(1, _batch(b=8, seed=s)) for s in range(steps)]
    return tr, losses


def test_data_parallel_parity_with_single_device(cascade):
    """THE correctness property of the DDP replacement: an 8-device
    data-parallel step on a global batch must equal the same step on one
    device — same losses, same updated params/EMA (reduction-order
    tolerance only)."""
    tr1, losses1 = _parity_run(
        cascade, make_mesh(data=1, model=1, devices=jax.devices()[:1]), False
    )
    tr8, losses8 = _parity_run(cascade, make_mesh(data=8, model=1), False)
    np.testing.assert_allclose(losses1, losses8, atol=1e-5)
    _assert_states_close(tr1.state(1), tr8.state(1), atol=1e-5)


def test_fsdp_parity_with_single_device(cascade):
    """2x4 dp x fsdp step == single-device step on the same global batch
    (params gathered transparently by XLA; values must match)."""
    tr1, losses1 = _parity_run(
        cascade, make_mesh(data=1, model=1, devices=jax.devices()[:1]), False
    )
    trf, lossesf = _parity_run(cascade, make_mesh(data=2, model=4), True)
    np.testing.assert_allclose(losses1, lossesf, atol=1e-5)
    _assert_states_close(tr1.state(1), trf.state(1), atol=1e-5)


def test_loader_tuple_protocol():
    from kidney_diffusion_tpu.data.pipeline import make_loader

    ds = SyntheticDataset(with_conds=True)
    it = make_loader(
        ds, batch_size=4, keywords=("images", "text_embeds", "cond_images"), num_workers=2
    )
    b = next(it)
    assert set(b) == {"images", "text_embeds", "cond_images"}
    assert b["images"].shape == (4, 32, 32, 3)
    assert b["text_embeds"].shape == (4, 1, 3)


def test_spatial_sharded_sampling(cascade):
    """One image's rows sharded over 8 devices (sp axis): output must
    match the unsharded run bit-for-bit given identical RNG."""
    import jax
    import jax.numpy as jnp

    from kidney_diffusion_tpu.parallel.mesh import make_mesh, spatial_sharding

    tr = Trainer(cascade)
    tr.train_step(2, _batch())
    params = tr.state(2).params
    lowres = jnp.linspace(0, 1, 16 * 16 * 3).reshape(1, 16, 16, 3)

    key = jax.random.PRNGKey(0)
    base = cascade.sample_stage(params, 2, key, batch_size=1, lowres_image=lowres)

    mesh = make_mesh(data=8, model=1)
    sharded = cascade.sample_stage(
        params, 2, key, batch_size=1, lowres_image=lowres,
        spatial_shard=spatial_sharding(mesh),
    )
    np.testing.assert_allclose(
        np.asarray(base), np.asarray(sharded), atol=2e-5
    )


def test_prefetch_to_device():
    from kidney_diffusion_tpu.data.pipeline import make_loader, prefetch_to_device

    ds = SyntheticDataset(n=16)
    it = make_loader(ds, batch_size=4, num_workers=2)
    dev_it = prefetch_to_device(it, depth=2)
    b1 = next(dev_it)
    b2 = next(dev_it)
    assert b1["images"].shape == (4, 32, 32, 3)
    assert hasattr(b1["images"], "devices")  # on-device arrays


def test_shard_by_process_single_process():
    from kidney_diffusion_tpu.data.pipeline import make_loader

    ds = SyntheticDataset(n=16)
    it = make_loader(ds, batch_size=4, num_workers=2, shard_by_process=True)
    b = next(it)
    assert b["images"].shape == (4, 32, 32, 3)


def test_spatial_sharded_sampling_quantized(cascade, monkeypatch):
    """The w8a8 int8 serving path under sp sharding: the per-tensor amax
    becomes a cross-device reduction GSPMD inserts automatically (max is
    order-independent), so the sharded quantized sample must match the
    unsharded quantized sample."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import serving_overrides
    from kidney_diffusion_tpu.parallel.mesh import make_mesh, spatial_sharding

    monkeypatch.setenv("KDT_QUANT_MIN_PIX", "1")
    monkeypatch.setenv("KDT_QUANT_MIN_CH", "1")

    tr = Trainer(cascade)
    tr.train_step(2, _batch())
    params = tr.state(2).params
    lowres = jnp.linspace(0, 1, 16 * 16 * 3).reshape(1, 16, 16, 3)
    qcas = Cascade(
        serving_overrides(cascade.config, quant="int8", min_image_size=1)
    )

    key = jax.random.PRNGKey(0)
    base = qcas.sample_stage(params, 2, key, batch_size=1, lowres_image=lowres)

    mesh = make_mesh(data=8, model=1)
    sharded = qcas.sample_stage(
        params, 2, key, batch_size=1, lowres_image=lowres,
        spatial_shard=spatial_sharding(mesh),
    )
    # 1e-4: the sharded GN-stat sums reduce in a different order, which
    # shifts the quantization scale by an ulp at a handful of steps
    np.testing.assert_allclose(np.asarray(base), np.asarray(sharded), atol=1e-4)
