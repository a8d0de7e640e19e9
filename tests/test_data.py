import numpy as np
import pytest
import time

from kidney_diffusion_tpu.data import (
    ArraySlide,
    MAG_LEVEL_SIZES,
    PatientMetadata,
    UltraResPatientDataset,
    inner_patch_width,
    make_loader,
    read_block,
    read_block_and_zoomed,
    resize_nearest,
)
from kidney_diffusion_tpu.data.airs import AirsDataset
from kidney_diffusion_tpu.data.patient import (
    average_creatinine_between,
    normalize_creatinine,
    normalize_days_post_transplant,
    normalize_outcome,
    split_annotated_ids,
)
from kidney_diffusion_tpu.ops.augment import (
    NUM_FLIPS_ROTATIONS,
    NUM_TRANSLATIONS,
    flip_rotate,
    translation_offset,
)


# ---------------------------------------------------------------------------
# augmentation
# ---------------------------------------------------------------------------


def test_flip_rotate_group_properties():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(6, 6, 3))
    variants = [flip_rotate(x, k) for k in range(8)]
    # all 8 dihedral transforms are distinct
    for i in range(8):
        for j in range(i + 1, 8):
            assert not np.allclose(variants[i], variants[j]), (i, j)
    # all preserve the multiset of pixel values
    for v in variants:
        np.testing.assert_allclose(np.sort(v.ravel()), np.sort(x.ravel()))


def test_flip_rotate_matches_torch_semantics():
    """The reference applies CHW torch transforms
    (patient_dataset.py:243-259). Verify our HWC numpy version agrees."""
    import torch

    rng = np.random.default_rng(1)
    x = rng.uniform(size=(4, 5, 3)).astype(np.float32)
    t = torch.from_numpy(x).permute(2, 0, 1)  # CHW

    def torch_variant(t, k):
        if k == 0:
            return t
        if k == 1:
            return t.flip(2)
        if k == 2:
            return t.flip(1)
        if k == 3:
            return t.flip(1).flip(2)
        if k == 4:
            return t.transpose(1, 2)
        if k == 5:
            return t.transpose(1, 2).flip(2)
        if k == 6:
            return t.transpose(1, 2).flip(1)
        return t.transpose(1, 2).flip(1).flip(2)

    for k in range(8):
        expected = torch_variant(t, k).permute(1, 2, 0).numpy()
        got = flip_rotate(x, k)
        np.testing.assert_allclose(got, expected, err_msg=f"k={k}")


def test_translation_offsets():
    # reference ordering: (0,0), (+h,0), (+h,+h), (0,+h)
    # (patient_dataset.py:226-233)
    offs = [translation_offset(k * NUM_FLIPS_ROTATIONS, 100) for k in range(4)]
    assert offs == [(0, 0), (50, 0), (50, 50), (0, 50)]
    # constant within a flip-block
    assert translation_offset(8 + 3, 100) == (50, 0)


# ---------------------------------------------------------------------------
# read_block geometry
# ---------------------------------------------------------------------------


def _gradient_slide(w=300, h=200):
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = (np.arange(w)[None, :] * 255 // w).astype(np.uint8)
    img[..., 1] = (np.arange(h)[:, None] * 255 // h).astype(np.uint8)
    return ArraySlide(img)


def test_read_block_in_bounds():
    slide = _gradient_slide()
    mags = (100, 50, 10)
    out = read_block(slide, 2, 20, 30, patch_size=10, mag_sizes=mags)
    assert out.shape == (10, 10, 3)
    # mag 2 with image_size == patch_size: pixel-exact copy
    np.testing.assert_allclose(
        out, slide.image[30:40, 20:30].astype(np.float32) / 255.0
    )


def test_read_block_out_of_bounds_fill():
    slide = _gradient_slide(100, 100)
    mags = (100, 50, 10)
    fill = (242, 243, 242)
    # read a 50-source-px region half outside the left/top edge
    out = read_block(slide, 1, -25, -25, patch_size=10, mag_sizes=mags, fill_color=fill)
    assert out.shape == (10, 10, 3)
    expected_fill = np.asarray(fill, np.float32) / 255.0
    # top-left quadrant is fill
    np.testing.assert_allclose(out[:5, :5], np.broadcast_to(expected_fill, (5, 5, 3)))
    # bottom-right quadrant is image content (not fill)
    assert not np.allclose(out[5:, 5:], expected_fill)


def test_read_block_fully_outside():
    slide = _gradient_slide(100, 100)
    out = read_block(slide, 1, -1000, -1000, patch_size=8, mag_sizes=(100, 50, 10))
    np.testing.assert_allclose(out, 242.5 / 255.0, atol=0.01)


def test_read_block_and_zoomed_concentric():
    slide = _gradient_slide(400, 400)
    mags = (200, 100, 50)
    patch, zoomed = read_block_and_zoomed(slide, 1, 150, 150, patch_size=20, mag_sizes=mags)
    assert patch.shape == zoomed.shape == (20, 20, 3)
    # the zoomed image's center pixel ~ the patch's center pixel
    # (same source location: center of the mag-1 region)
    np.testing.assert_allclose(zoomed[10, 10], patch[10, 10], atol=0.06)


def test_read_region_filled_edge_pads_not_stretches():
    from kidney_diffusion_tpu.data.wsi import read_region_filled

    slide = _gradient_slide(300, 200)
    fill = (242, 243, 242)
    # 64x64 read straddling the right edge by 32 px, no resampling
    out = read_region_filled(slide, 268, 0, 64, 64, 64, 64, fill_color=fill)
    assert out.shape == (64, 64, 3)
    # in-bounds half: exact image pixels at true geometry (no stretch)
    np.testing.assert_array_equal(out[:, :32], slide.image[0:64, 268:300])
    # out-of-bounds half: fill color
    np.testing.assert_array_equal(
        out[:, 32:], np.broadcast_to(np.asarray(fill, np.uint8), (64, 32, 3))
    )
    # fully in-bounds call defers to the plain read
    inb = read_region_filled(slide, 10, 10, 64, 64, 64, 64, fill_color=fill)
    np.testing.assert_array_equal(inb, slide.image[10:74, 10:74])


def test_patient_dataset_edge_patch_filled():
    """A translated unannotated patch straddling the slide edge must come
    back edge-FILLED at true geometry, not stretched (reference slideio
    read_block pads OOB; /root/reference/patient_dataset.py:219)."""
    from kidney_diffusion_tpu.data.patient import PatientDataset, PatientMetadata
    from kidney_diffusion_tpu.ops.augment import NUM_FLIPS_ROTATIONS

    slide = _gradient_slide(300, 200)
    ds = PatientDataset(
        {"s": slide}, PatientMetadata({}),
        patch_size=64, image_size=64, transformations=True, unconditional=True,
    )
    # pin one patch whose +half-x translation crosses the right edge
    ds.train_slide_ids = ["s"]
    ds.patch_positions = [[(236, 0)]]
    ds.num_train_patches = 1
    # index = 1*NUM_FLIPS_ROTATIONS -> translation (dx=32, dy=0), identity flip
    patch = ds[NUM_FLIPS_ROTATIONS]
    assert patch.shape == (64, 64, 3)
    np.testing.assert_allclose(
        patch[:, :32], slide.image[0:64, 268:300].astype(np.float32) / 255.0
    )
    np.testing.assert_allclose(
        patch[:, 32:],
        np.broadcast_to(np.asarray([242, 243, 242], np.float32) / 255.0, (64, 32, 3)),
    )


def test_inner_patch_width():
    assert inner_patch_width(1) == int(6500 * 1024 / 40000)
    assert inner_patch_width(2) == int(1024 * 1024 / 6500)


def test_resize_nearest_identity_and_shape():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    assert resize_nearest(img, 4, 4) is img
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 3)
    np.testing.assert_array_equal(up[::2, ::2], img)


# ---------------------------------------------------------------------------
# metadata normalisation
# ---------------------------------------------------------------------------


def test_outcome_ladder():
    assert normalize_outcome("Functioning") == 0.0
    assert normalize_outcome("DWGL") == 0.8
    assert normalize_outcome("DWFG") == 0  # excluded outcome -> 0


def test_days_and_creatinine():
    assert normalize_days_post_transplant(90) == 0.0
    assert normalize_days_post_transplant(455) == 1.0
    assert normalize_creatinine(30) == 0.0


def test_average_creatinine_window():
    vals = [30, 2080, 1055]
    dates = [0, 5, 20]
    # only the first two fall inside [0, 10]
    avg = average_creatinine_between(vals, dates, 0, 10)
    assert avg == pytest.approx((0.0 + 1.0) / 2)
    # none in window -> all-time mean
    avg2 = average_creatinine_between(vals, dates, 100, 200)
    assert avg2 == pytest.approx(np.mean([0.0, 1.0, 0.5]))
    assert average_creatinine_between([], [], 0, 1) is None


def test_split_annotated_ids():
    ids = [f"slide{i} patch{j}" for i in range(8) for j in range(i + 1)]
    train, test, test_slides = split_annotated_ids(ids, num_test_slides=2)
    assert len(test_slides) == 2
    assert set(test_slides) == {"slide7", "slide6"}
    assert len(train) + len(test) == len(ids)


def test_patient_metadata_conds():
    meta = PatientMetadata(
        {"s1": dict(outcome=0.4, days_post_transplant=0.1, creatinine=0.3)}
    )
    np.testing.assert_allclose(meta.conds("s1"), [[0.4, 0.1, 0.3]])
    np.testing.assert_allclose(meta.conds(None), [[0.0, 0.5, 0.2]])
    np.testing.assert_allclose(meta.conds("unknown"), [[0.0, 0.5, 0.2]])


# ---------------------------------------------------------------------------
# datasets over synthetic slides
# ---------------------------------------------------------------------------


def _tissue_slide(size=4096, seed=0):
    """A synthetic slide with tissue-like (pinkish, hue>0.5) blobs."""
    rng = np.random.default_rng(seed)
    img = np.full((size, size, 3), 242, np.uint8)
    for _ in range(6):
        y, x = rng.integers(0, size - 1500, 2)
        img[y : y + 1500, x : x + 1500] = (200, 120, 160)  # pink-ish
    return ArraySlide(img)


def test_ultra_res_dataset_mag0():
    slides = {"a": _tissue_slide(), "b": _tissue_slide(seed=1)}
    ds = UltraResPatientDataset(slides, 0, patch_size=64, mag_sizes=(4000, 650, 102))
    assert len(ds) == NUM_FLIPS_ROTATIONS * 2
    item = ds[0]
    assert item.shape == (64, 64, 3)
    # flip consistency: index 1 is a width-flip of index 0
    np.testing.assert_allclose(ds[1], ds[0][:, ::-1])


def test_ultra_res_dataset_mag2_pairs():
    slides = {"a": _tissue_slide()}
    ds = UltraResPatientDataset(slides, 2, patch_size=64, mag_sizes=(4000, 650, 102))
    assert len(ds) > 0
    patch, cond = ds[0]
    assert patch.shape == (64, 64, 3)
    assert cond.shape == (64, 64, 3)


def test_ultra_res_dataset_center_cond():
    slides = {"a": _tissue_slide()}
    ds = UltraResPatientDataset(
        slides, 2, center_cond=True, patch_size=64, mag_sizes=(4000, 650, 102)
    )
    patch, cond = ds[0]
    assert cond.shape == (64, 64, 6)


def test_airs_dataset():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(1000, 1000, 3), dtype=np.uint8)
    ds = AirsDataset("", magnification_level=0, images=[img])
    assert len(ds) == NUM_FLIPS_ROTATIONS
    assert ds[0].shape == (1024, 1024, 3)


def test_loader_over_ultra_res():
    slides = {"a": _tissue_slide()}
    ds = UltraResPatientDataset(slides, 1, patch_size=64, mag_sizes=(4000, 650, 102))
    it = make_loader(ds, batch_size=2, keywords=("images", "cond_images"), num_workers=2)
    b = next(it)
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["cond_images"].shape == (2, 64, 64, 3)


def test_kumar_dataset_fixture(tmp_path):
    """Kumar layout round trip: csv metadata + npy patches/masks."""
    import os

    from kidney_diffusion_tpu.data.kumar import KumarDataset, NUM_RANDOM_CROPS

    os.makedirs(tmp_path / "Supplementary")
    os.makedirs(tmp_path / "Patches")
    os.makedirs(tmp_path / "Labels")
    rng = np.random.default_rng(0)
    ids = ["img1x", "img2x"]
    with open(tmp_path / "Supplementary" / "supplementary.csv", "w") as f:
        f.write("ID;Type;Disease\n")
        f.write(f"{ids[0]};Kidney;Kidney renal clear cell carcinoma\n")
        f.write(f"{ids[1]};Breast;Breast invasive carcinoma\n")
    for pid in ids:
        np.save(
            tmp_path / "Patches" / f"{pid[:-1]}.npy",
            rng.integers(0, 255, size=(400, 400, 3), dtype=np.uint8),
        )
        np.save(
            tmp_path / "Labels" / f"{pid}binary_mask.npy",
            rng.integers(0, 2, size=(400, 400)).astype(np.uint8),
        )

    ds = KumarDataset(str(tmp_path))
    assert len(ds) == 8 * NUM_RANDOM_CROPS * 2
    patch, conds, labelmap = ds[0]
    assert patch.shape == (256, 256, 3)
    assert labelmap.shape == (256, 256, 1)
    assert conds.shape == (1, 2)
    # normalised kidney type index
    assert conds[0, 0] == pytest.approx(1 / 7)
    # crops reproducible; different crop slots differ
    patch2, _, _ = ds[0]
    np.testing.assert_array_equal(patch, patch2)
    patch3, _, _ = ds[8]  # next crop slot
    assert not np.array_equal(patch, patch3)
    # flip parity with the augmentation module
    from kidney_diffusion_tpu.ops.augment import flip_rotate

    p0, _, l0 = ds[0]
    p1, _, l1 = ds[1]
    np.testing.assert_array_equal(p1, flip_rotate(p0, 1))
    np.testing.assert_array_equal(l1, flip_rotate(l0, 1))


# --- loader failure propagation & lifecycle (data/pipeline.py) --------------


class _ExplodingDataset:
    def __init__(self, n=64, fail_at=5):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if int(i) == self.fail_at:
            raise ValueError("corrupt record")
        return np.zeros((4, 4, 3), np.float32)


def test_loader_propagates_worker_exception():
    import threading

    before = threading.active_count()
    ds = _ExplodingDataset(n=8, fail_at=3)
    loader = make_loader(ds, batch_size=8, shuffle=False, num_workers=2, prefetch=1)
    with pytest.raises(RuntimeError, match="dataset worker failed") as ei:
        for _ in range(4):
            next(loader)
    assert isinstance(ei.value.__cause__, ValueError)
    # producer thread and pool must be torn down (no leak between trainers)
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert not loader._thread.is_alive()


def test_loader_close_stops_thread():
    ds = _ExplodingDataset(n=64, fail_at=-1)  # never fails
    loader = make_loader(ds, batch_size=4, num_workers=2, prefetch=2)
    batch = next(loader)
    assert batch["images"].shape == (4, 4, 4, 3)
    loader.close()
    deadline = time.time() + 5
    while loader._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not loader._thread.is_alive()
    with pytest.raises(StopIteration):
        next(loader)


def test_train_valid_split_disjoint():
    from kidney_diffusion_tpu.data.pipeline import train_valid_split

    ds = _ExplodingDataset(n=100, fail_at=-1)
    train, valid = train_valid_split(ds, valid_fraction=0.1, seed=3)
    assert len(train) == 90 and len(valid) == 10
    ti, vi = set(train.indices.tolist()), set(valid.indices.tolist())
    assert ti.isdisjoint(vi)
    assert ti | vi == set(range(100))
    # deterministic across constructions
    train2, _ = train_valid_split(ds, valid_fraction=0.1, seed=3)
    assert np.array_equal(train.indices, train2.indices)
