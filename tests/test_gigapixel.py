import numpy as np
import jax
import pytest

from kidney_diffusion_tpu.sample import (
    GridSpec,
    assemble_inpaint_strips,
    choose_orientation,
    crop_with_fill,
    full_grid,
    generate_high_res_image,
    generate_outpainted_image,
    get_cond_images,
    plan_waves,
    ready_patches,
    resize_bilinear,
    stitch_patches,
)
from kidney_diffusion_tpu.sample.wavefront import bucket_size, deps


# ---------------------------------------------------------------------------
# wavefront planner
# ---------------------------------------------------------------------------


def test_plan_waves_full_grid_property():
    """Every patch's deps precede it; union == input (SURVEY §4 test plan)."""
    for n in (1, 2, 5, 8):
        for orientation in (-1, 1):
            pos = full_grid(n)
            waves = plan_waves(pos, orientation)
            seen = set()
            for wave in waves:
                for p in wave:
                    for d in deps(p, orientation):
                        assert d not in set(pos) - seen, (p, d)
                seen.update(wave)
            assert seen == set(pos)


def test_plan_waves_sparse_with_holes():
    rng = np.random.default_rng(0)
    pos = [tuple(p) for p in rng.integers(0, 10, size=(40, 2))]
    pos = list(dict.fromkeys(pos))
    waves = plan_waves(pos, 1)
    seen = set()
    for wave in waves:
        for p in wave:
            for d in deps(p, 1):
                assert not (d in pos and d not in seen)
        seen.update(wave)
    assert seen == set(pos)


def test_ready_patches_matches_reference_rule():
    # top-left corner is ready for orientation -1 on a full grid
    pos = full_grid(3)
    ready, waiting = ready_patches(pos, -1)
    assert (0, 0) in ready
    assert (2, 2) in waiting
    # reference rule: ready iff none of the three deps is pending
    for p in ready:
        assert all(d not in pos for d in deps(p, -1))


def test_choose_orientation_prefers_bigger_first_wave():
    # L-shaped set: column j=0 only -> orientation -1 has (0,0) ready and
    # so does +1; build an asymmetric set
    pos = [(0, 0), (0, 1), (0, 2), (1, 2)]
    o = choose_orientation(pos)
    assert o in (-1, 1)
    first = ready_patches(pos, o)[0]
    other = ready_patches(pos, -o)[0]
    assert len(first) >= len(other)


def test_bucket_size():
    assert bucket_size(1) == 1
    assert bucket_size(3) == 4
    assert bucket_size(17) == 32
    assert bucket_size(1000) == 1024


# ---------------------------------------------------------------------------
# cond-image geometry
# ---------------------------------------------------------------------------


def test_crop_with_fill_matches_roll_semantics():
    """crop_with_fill == torch.roll + fill + CenterCrop (the reference's
    recentering, sample_ultra_res.py:358-391) for nonzero shifts.

    (At shift exactly 0 the reference's `shifted[:, 0:, :] = FILL` blanks
    the whole image — a latent bug; crop_with_fill keeps the image.)"""
    import torch

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(40, 40, 3)).astype(np.float32)
    size = 16
    fill = 0.95
    for cy, cx in [(5, 5), (21, 19), (38, 2), (0, 39)]:
        got = crop_with_fill(img, cy - size // 2, cx - size // 2, size, fill)

        t = torch.from_numpy(img).permute(2, 0, 1)
        shift_y = img.shape[0] // 2 - cy
        shift_x = img.shape[1] // 2 - cx
        shifted = torch.roll(t, shifts=(shift_y, shift_x), dims=(1, 2))
        if shift_y > 0:
            shifted[:, :shift_y, :] = fill
        else:
            shifted[:, shift_y:, :] = fill
        if shift_x > 0:
            shifted[:, :, :shift_x] = fill
        else:
            shifted[:, :, shift_x:] = fill
        h, w = shifted.shape[1:]
        y0 = (h - size) // 2
        x0 = (w - size) // 2
        expected = shifted[:, y0 : y0 + size, x0 : x0 + size].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got, expected, atol=1e-6, err_msg=f"{cy},{cx}")


def test_grid_spec_counts():
    grid = GridSpec.build(1024, 1, 0.25, mag_sizes=(40000, 6500, 1024), patch_size=1024)
    assert grid.patch_width == int(6500 * 1024 / 40000)  # 166
    assert grid.patch_dist == int(grid.patch_width * 0.75)
    import math

    assert grid.num_patches_width == 1 + math.ceil((1024 - 166) / 124)


def test_get_cond_images_shapes_and_positions():
    rng = np.random.default_rng(1)
    zoomed = rng.uniform(size=(128, 128, 3)).astype(np.float32)
    conds, pos, grid = get_cond_images(
        zoomed, 1, overlap=0.25, mag_sizes=(512, 256, 64), patch_size=128
    )
    assert conds.shape[0] == len(pos) == grid.num_patches_width**2
    assert conds.shape[1:] == (128, 128, 3)
    # center of each cond image equals the corresponding region center
    for k, (i, j) in enumerate(pos):
        cy = i * grid.patch_dist + grid.patch_width // 2
        cx = j * grid.patch_dist + grid.patch_width // 2
        if 0 <= cy < 128 and 0 <= cx < 128:
            np.testing.assert_allclose(conds[k, 64, 64], zoomed[cy, cx], atol=1e-6)


def test_get_cond_images_center_cond_channels():
    zoomed = np.random.default_rng(2).uniform(size=(128, 128, 3)).astype(np.float32)
    conds, pos, grid = get_cond_images(
        zoomed, 1, overlap=0.25, mag_sizes=(512, 256, 64), patch_size=128,
        center_cond=True,
    )
    assert conds.shape[-1] == 6


def test_tissue_filter_mag2():
    # background image -> no mag-2 patches
    bg = np.full((128, 128, 3), 0.95, np.float32)
    conds, pos, _ = get_cond_images(
        bg, 2, overlap=0.25, mag_sizes=(512, 256, 64), patch_size=128
    )
    assert len(pos) == 0
    # image with a tissue blob -> some but not all patches
    img = bg.copy()
    img[40:80, 40:80] = [0.9, 0.6, 0.7]
    conds, pos, grid = get_cond_images(
        img, 2, overlap=0.25, mag_sizes=(512, 256, 64), patch_size=128
    )
    assert 0 < len(pos) <= grid.num_patches_width**2


def test_all_patches_overrides_tissue_filter():
    # the same all-background image that the HSV filter drops entirely
    # produces the full grid with all_patches=True (fresh-params demos /
    # wall-clock benches / non-histology content)
    bg = np.full((128, 128, 3), 0.95, np.float32)
    conds, pos, grid = get_cond_images(
        bg, 2, overlap=0.25, mag_sizes=(512, 256, 64), patch_size=128,
        all_patches=True,
    )
    assert len(pos) == grid.num_patches_width**2
    assert conds.shape[0] == len(pos)


# ---------------------------------------------------------------------------
# inpaint strips
# ---------------------------------------------------------------------------


def test_assemble_inpaint_strips_from_generated():
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=3, overlap=0.25)
    gen = {(0, 0): np.full((8, 8, 3), 0.25, np.float32)}
    imgs, masks = assemble_inpaint_strips([(1, 0)], gen, None, grid, 8, -1)
    ov = int(0.25 * 8)
    assert imgs is not None
    # top strip comes from the bottom of the above patch
    np.testing.assert_allclose(imgs[0, :ov, :], 0.25)
    np.testing.assert_allclose(masks[0, :ov, :], 1.0)
    np.testing.assert_allclose(masks[0, ov:, :], 0.0)


def test_assemble_inpaint_strips_first_patch_empty():
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=3, overlap=0.25)
    imgs, masks = assemble_inpaint_strips([(0, 0)], {}, None, grid, 8, -1)
    assert imgs is None and masks is None


def test_assemble_inpaint_strips_cond_fallback():
    """A neighbour missing from the patch set (tissue-filtered) falls back
    to the coarse image crop."""
    grid = GridSpec(patch_width=8, patch_dist=6, num_patches_width=4, overlap=0.25)
    cond = {(1, 1): np.full((32, 32, 3), 0.5, np.float32)}
    imgs, masks = assemble_inpaint_strips([(1, 1)], {}, cond, grid, 8, -1)
    assert imgs is not None
    ov = 2
    np.testing.assert_allclose(imgs[0, :ov, :], 0.5, atol=1e-5)  # above strip
    np.testing.assert_allclose(masks[0, :ov, :], 1.0)


# ---------------------------------------------------------------------------
# stitching + end-to-end tiny gigapixel
# ---------------------------------------------------------------------------


def test_stitch_patches_layout():
    zoomed = np.zeros((64, 64, 3), np.float32)
    patches = {
        (0, 0): np.full((16, 16, 3), 1.0, np.float16),
        (1, 1): np.full((16, 16, 3), 0.5, np.float16),
    }
    out = stitch_patches(zoomed, patches, overlap=0.25, num_patches_width=3, patch_size=16)
    dist = 12
    assert out.shape == (16 + 2 * dist, 16 + 2 * dist, 3)
    assert out[0, 0, 0] == 255
    assert out[dist + 8, dist + 8, 0] in (127, 128)
    assert out[-1, -1, 0] == 0  # canvas from zero coarse image


def test_resize_bilinear_constant():
    img = np.full((7, 5, 3), 0.3, np.float32)
    out = resize_bilinear(img, 13, 11)
    np.testing.assert_allclose(out, 0.3, atol=1e-6)


@pytest.mark.slow
def test_generate_high_res_image_end_to_end():
    """Tiny cascade, tiny grid: the full orchestrator produces a canvas."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade

    cc = tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    zoomed = np.random.default_rng(0).uniform(size=(64, 64, 3)).astype(np.float32)
    out = generate_high_res_image(
        cas, params, jax.random.PRNGKey(0), zoomed, 1,
        overlap=0.25, mag_sizes=(256, 128, 32), progress=False,
    )
    # grid: pw=16 at patch_size(model)=32... canvas uses model patch size
    assert out.dtype == np.uint8
    assert out.shape[0] == out.shape[1]
    assert out.shape[0] > 32


@pytest.mark.slow
def test_generate_outpainted_image_end_to_end():
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade

    cc = tiny_test_cascade(image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    out = generate_outpainted_image(
        cas, params, jax.random.PRNGKey(0),
        num_patches_width=2, overlap=0.25, patch_size=32, progress=False,
    )
    dist = 24
    assert out.shape == (32 + dist, 32 + dist, 3)
    assert out.dtype == np.uint8


@pytest.mark.slow
def test_generate_patch_set_mesh_sharded(tmp_path):
    """Wave batches shard over an 8-device CPU mesh (SPMD inference),
    with debug artifact dumping."""
    import os

    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade
    from kidney_diffusion_tpu.parallel.mesh import make_mesh
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set

    cc = tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    mesh = make_mesh(data=8, model=1)

    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=3, overlap=0.25)
    pos = full_grid(3)
    cond = np.random.default_rng(0).uniform(size=(9, 32, 32, 3)).astype(np.float32)
    debug_dir = str(tmp_path / "artifacts")
    patches = generate_patch_set(
        cas, params, jax.random.PRNGKey(0),
        patch_pos=pos, grid=grid, cond_images=cond,
        mesh=mesh, debug_dir=debug_dir, progress=False,
    )
    assert set(patches) == set(pos)
    assert all(p.shape == (32, 32, 3) for p in patches.values())
    dumped = os.listdir(debug_dir)
    assert any(f.endswith("_patch.png") for f in dumped)
    assert any(f.endswith("_cond.png") for f in dumped)
    assert any(f.endswith("_inpaint_mask.png") for f in dumped)


def test_plan_waves_single_row_and_column():
    for pos in ([(0, j) for j in range(6)], [(i, 0) for i in range(6)]):
        waves = plan_waves(pos, 1)
        assert sum(len(w) for w in waves) == 6
        # a line has strictly sequential dependencies in one direction
        assert all(len(w) >= 1 for w in waves)


@pytest.mark.slow
def test_generate_patch_set_ignore_stage_1():
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set

    cc = tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [None, cas.init_stage_params(jax.random.PRNGKey(1), 2)]
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=2, overlap=0.25)
    pos = full_grid(2)
    cond = np.random.default_rng(0).uniform(size=(4, 32, 32, 3)).astype(np.float32)
    patches = generate_patch_set(
        cas, params, jax.random.PRNGKey(0),
        patch_pos=pos, grid=grid, cond_images=cond,
        ignore_stage_1=True, progress=False,
    )
    # stage 1 never ran (params[0] is None would have crashed otherwise)
    assert set(patches) == set(pos)


@pytest.mark.slow
def test_gigapixel_determinism():
    """Same key -> byte-identical canvas (the wavefront schedule is
    static; no queue nondeterminism as in the reference's worker pool)."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade

    cc = tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    zoomed = np.random.default_rng(0).uniform(size=(64, 64, 3)).astype(np.float32)

    outs = [
        generate_high_res_image(
            cas, params, jax.random.PRNGKey(7), zoomed, 1,
            overlap=0.25, mag_sizes=(256, 128, 32), progress=False,
        )
        for _ in range(2)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])


@pytest.mark.slow
def test_generate_patch_set_fast_samplers():
    """--dpmpp_steps / --ddim_steps flow through the wave orchestrator:
    overlap patches still blend (RePaint rides the fast samplers)."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set

    cc = tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=2, overlap=0.25)
    pos = full_grid(2)
    cond = np.random.default_rng(0).uniform(size=(4, 32, 32, 3)).astype(np.float32)

    for kw in ({"dpmpp_steps": 4}, {"ddim_steps": 4}):
        patches = generate_patch_set(
            cas, params, jax.random.PRNGKey(0),
            patch_pos=pos, grid=grid, cond_images=cond, progress=False, **kw,
        )
        assert set(patches) == set(pos), kw
        for p in patches.values():
            assert p.shape == (32, 32, 3)
            assert np.isfinite(np.asarray(p, np.float32)).all()


def test_resize_nearest_batch_matches_jax():
    """Host-side cond pre-resize (wire transport) must be bit-identical
    to the in-model jax.image.resize nearest it replaces
    (models/unet.py cond_images resize)."""
    import jax

    rng = np.random.default_rng(3)
    for h, out in [(128, 64), (128, 32), (96, 32), (100, 64), (64, 64)]:
        x = rng.uniform(size=(2, h, h, 3)).astype(np.float32)
        from kidney_diffusion_tpu.sample.gigapixel import resize_nearest_batch

        got = resize_nearest_batch(x, out)
        want = np.asarray(
            jax.image.resize(x, (2, out, out, 3), method="nearest")
        )
        np.testing.assert_array_equal(got, want, err_msg=f"{h}->{out}")


def test_to_wire_uint8_roundtrip_exact_for_canvas_content():
    from kidney_diffusion_tpu.sample.gigapixel import to_wire_uint8

    canvas = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
    img = canvas.astype(np.float32) / 255.0  # what get_cond_images sees
    np.testing.assert_array_equal(to_wire_uint8(img), canvas)


# ---------------------------------------------------------------------------
# device-resident transport (sample/resident.py)
# ---------------------------------------------------------------------------


def _tiny_cond_setup():
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade

    cc = tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    zoomed = np.random.default_rng(0).uniform(size=(64, 64, 3)).astype(np.float32)
    return cas, params, zoomed


def test_resident_e2e_bit_equal_to_uint8_wire():
    """The device-resident transport is numerically identical to the
    uint8 wire on a full grid: same quantization points, same RNG
    stream, on-device crop/strip assembly == host assembly."""
    cas, params, zoomed = _tiny_cond_setup()
    kwargs = dict(overlap=0.25, mag_sizes=(256, 128, 32), progress=False)
    a = generate_high_res_image(
        cas, params, jax.random.PRNGKey(0), zoomed, 1, wire="uint8", **kwargs
    )
    b = generate_high_res_image(
        cas, params, jax.random.PRNGKey(0), zoomed, 1, wire="resident", **kwargs
    )
    np.testing.assert_array_equal(a, b)


def test_resident_cond_crops_match_host(tmp_path):
    """On-device canvas slicing reproduces crop_with_fill + uint8 wire
    encoding exactly, including the fill regions of edge patches."""
    from kidney_diffusion_tpu.sample.gigapixel import to_wire_uint8
    from kidney_diffusion_tpu.sample.resident import ResidentEngine

    rng = np.random.default_rng(1)
    zoomed = rng.uniform(size=(50, 50, 3)).astype(np.float32)
    ps = 32
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=4, overlap=0.25)
    engine = ResidentEngine(
        patch_size=ps, grid=grid, orientation=-1, canvas=zoomed, fill=0.95
    )
    try:
        # the (3,3) patch center overhangs the canvas: fill semantics
        for pos in [(0, 0), (1, 2), (3, 3)]:
            kw = engine.prep_chunk([pos], 16, {}, None, 1, need_cond=True)
            got = np.asarray(kw["cond_images"])[0]
            i, j = pos
            cy = i * grid.patch_dist + grid.patch_width // 2
            cx = j * grid.patch_dist + grid.patch_width // 2
            want = to_wire_uint8(
                crop_with_fill(zoomed, cy - ps // 2, cx - ps // 2, ps, 0.95)
            )
            np.testing.assert_array_equal(got, want)
    finally:
        engine.finish()


def test_resident_strips_match_host_assembly():
    """On-device strip assembly == assemble_inpaint_strips + uint8
    encoding: generated neighbours exact, coarse fallback within one
    uint8 count (bilinear resize implementations differ), diagonal
    corner priority and the mask quirk preserved."""
    import jax.numpy as jnp

    from kidney_diffusion_tpu.sample.gigapixel import to_wire_uint8
    from kidney_diffusion_tpu.sample.resident import ResidentEngine

    rng = np.random.default_rng(2)
    zoomed = rng.uniform(size=(60, 60, 3)).astype(np.float32)
    ps, hs = 32, 16
    # patch_dist <= ps//2 - patch_width//2 so the coarse fallback region
    # stays inside cond coverage (same geometry as the host fallback test)
    grid = GridSpec(patch_width=8, patch_dist=6, num_patches_width=4, overlap=0.25)
    # host-side stores (fp32 [0,1]) and matching device stores (uint8)
    host_store, dev_store = {}, {}
    for pos in [(0, 1), (1, 0), (0, 0)]:
        img8 = rng.integers(0, 256, size=(hs, hs, 3), dtype=np.uint8)
        host_store[pos] = img8.astype(np.float32) / 255.0
        dev_store[pos] = jnp.asarray(img8)
    # (1,1): all three neighbours generated. (2,2): none generated ->
    # coarse fallback for all three slots.
    for orientation in (-1, 1):
        engine = ResidentEngine(
            patch_size=ps, grid=grid, orientation=orientation,
            canvas=zoomed, fill=0.95,
        )
        try:
            cond_by_pos = {}
            for pos in [(1, 1), (2, 2)]:
                i, j = pos
                cy = i * grid.patch_dist + grid.patch_width // 2
                cx = j * grid.patch_dist + grid.patch_width // 2
                cond_by_pos[pos] = crop_with_fill(
                    zoomed, cy - ps // 2, cx - ps // 2, ps, 0.95
                )
            for pos, atol in [((1, 1), 1), ((2, 2), 1)]:
                kw = engine.prep_chunk([pos], hs, dev_store, None, 1, need_cond=True)
                want_img, want_msk = assemble_inpaint_strips(
                    [pos], host_store, cond_by_pos, grid, hs, orientation
                )
                assert want_img is not None
                got_img = np.asarray(kw["inpaint_images"])[0].astype(int)
                got_msk = np.asarray(kw["inpaint_masks"])[0].astype(int)
                np.testing.assert_allclose(
                    got_img, to_wire_uint8(want_img[0]).astype(int), atol=atol
                )
                np.testing.assert_array_equal(got_msk, want_msk[0].astype(int))
        finally:
            engine.finish()


def test_resident_outpaint_end_to_end():
    """No conditioning at all (outpainting): strips come only from
    generated neighbours; resident == uint8 wire bit-for-bit."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade

    cc = tiny_test_cascade(image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    kwargs = dict(num_patches_width=2, overlap=0.25, patch_size=32, progress=False)
    a = generate_outpainted_image(
        cas, params, jax.random.PRNGKey(3), wire="uint8", **kwargs
    )
    b = generate_outpainted_image(
        cas, params, jax.random.PRNGKey(3), wire="resident", **kwargs
    )
    np.testing.assert_array_equal(a, b)


def test_resident_ignore_stage_1_and_sparse_set():
    """--ignore_unet_1 seeding and a tissue-sparse patch set (coarse
    strip fallback) through the resident path: matches the host wire
    path within one uint8 count."""
    from kidney_diffusion_tpu.cascade import Cascade
    from kidney_diffusion_tpu.models.configs import tiny_test_cascade
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set, get_cond_images

    cc = tiny_test_cascade(cond_images_channels=3, image_sizes=(16, 32), timesteps=4)
    cas = Cascade(cc)
    params = [cas.init_stage_params(jax.random.PRNGKey(i), i + 1) for i in range(2)]
    zoomed = np.random.default_rng(4).uniform(size=(64, 64, 3)).astype(np.float32)
    cond_images, patch_pos, grid = get_cond_images(zoomed, 1, overlap=0.25,
                                                   mag_sizes=(256, 128, 32),
                                                   patch_size=32)
    # drop one interior position: its dependents use the coarse fallback
    drop = patch_pos[len(patch_pos) // 2]
    keep = [k for k, p in enumerate(patch_pos) if p != drop]
    cond_images = cond_images[keep]
    patch_pos = [patch_pos[k] for k in keep]
    common = dict(
        patch_pos=patch_pos, grid=grid, inpaint_resample_times=2,
        ignore_stage_1=True, progress=False,
    )
    a = generate_patch_set(
        cas, params, jax.random.PRNGKey(5), cond_images=cond_images,
        wire="uint8", **common
    )
    b = generate_patch_set(
        cas, params, jax.random.PRNGKey(5), cond_images=None,
        wire="resident", zoomed_image=zoomed, **common
    )
    assert set(a) == set(b) == set(patch_pos)
    for pos in patch_pos:
        np.testing.assert_allclose(
            np.asarray(a[pos], np.float32), np.asarray(b[pos], np.float32),
            atol=2.5 / 255.0,
        )


def test_resident_center_cond_matches_host():
    """v2's 6-channel center_cond through the resident canvas path is
    bit-identical to the host wire for an ARBITRARY float canvas: both
    paths round-quantize the center channels (ADVICE r3 — the host used
    the training dataset's truncating cast, deviating up to 1/255)."""
    from kidney_diffusion_tpu.sample.gigapixel import get_cond_images, to_wire_uint8
    from kidney_diffusion_tpu.sample.resident import ResidentEngine

    # values straddling the round-vs-trunc boundary (frac(x*255) >= 0.5)
    zoomed = np.random.default_rng(7).uniform(size=(64, 64, 3)).astype(np.float32)
    conds, patch_pos, grid = get_cond_images(
        zoomed, 1, overlap=0.25, mag_sizes=(256, 128, 32), patch_size=32,
        center_cond=True,
    )
    assert conds.shape[-1] == 6
    with ResidentEngine(
        patch_size=32, grid=grid, orientation=-1, canvas=zoomed,
        fill=0.95, center_cond=True,
    ) as engine:
        for k, pos in enumerate(patch_pos):
            kw = engine.prep_chunk([pos], 16, {}, None, 1, need_cond=True)
            got = np.asarray(kw["cond_images"])[0]
            np.testing.assert_array_equal(got, to_wire_uint8(conds[k]))


def test_resident_engine_shutdown_on_error():
    """A failure mid-level must not leak the background fetcher thread:
    generate_patch_set's finally (and the context manager) stop it."""
    import threading

    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set
    from kidney_diffusion_tpu.sample.resident import ResidentEngine

    before = threading.active_count()
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=2, overlap=0.25)
    with ResidentEngine(
        patch_size=32, grid=grid, orientation=-1,
        canvas=np.zeros((40, 40, 3), np.float32),
    ) as engine:
        assert threading.active_count() == before + 1
    assert threading.active_count() == before
    engine.shutdown()  # idempotent

    cas, params, zoomed = _tiny_cond_setup()
    bad_params = [None, None]  # sampling raises inside the stage loop
    with pytest.raises(Exception):
        generate_patch_set(
            cas, bad_params, jax.random.PRNGKey(0),
            patch_pos=[(0, 0)], grid=grid, cond_images=None,
            wire="resident", zoomed_image=zoomed, progress=False,
        )
    assert threading.active_count() == before  # fetcher joined


def test_uint8_wire_intermediate_stores_are_uint8_and_cleared(monkeypatch):
    """ADVICE r3: (a) the host uint8-wire path stores uint8 between
    stages — the inter-stage lowres is genuinely identical to the
    resident device store, making the resident bit-equality tests exact
    rather than empirically lucky; (b) intermediate-stage stores are
    freed once the next stage has consumed them."""
    from kidney_diffusion_tpu.sample import gigapixel as gp

    cas, params, zoomed = _tiny_cond_setup()
    cond_images, patch_pos, grid = get_cond_images(
        zoomed, 1, overlap=0.25, mag_sizes=(256, 128, 32), patch_size=32
    )
    seen = {}
    orig = gp.Cascade.sample_stage

    def spy(self, p, stage, key, **kw):
        lr = kw.get("lowres_image")
        if lr is not None:
            seen[stage] = np.asarray(lr).dtype
        return orig(self, p, stage, key, **kw)

    monkeypatch.setattr(gp.Cascade, "sample_stage", spy)
    out = gp.generate_patch_set(
        cas, params, jax.random.PRNGKey(0), patch_pos=patch_pos, grid=grid,
        cond_images=cond_images, wire="uint8", progress=False,
    )
    assert seen[2] == np.uint8  # stage-2 lowres came from a uint8 store
    for pos in patch_pos:  # public contract: float [0,1]
        assert out[pos].dtype == np.float16
        assert 0.0 <= float(out[pos].min()) and float(out[pos].max()) <= 1.0


def test_resident_stack_mode_matches_canvas_mode():
    """Direct callers that pass materialized cond images (no canvas) get
    the uploaded-stack variant; it must equal canvas slicing."""
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set, get_cond_images

    cas, params, zoomed = _tiny_cond_setup()
    cond_images, patch_pos, grid = get_cond_images(zoomed, 1, overlap=0.25,
                                                   mag_sizes=(256, 128, 32),
                                                   patch_size=32)
    common = dict(patch_pos=patch_pos, grid=grid, progress=False)
    a = generate_patch_set(
        cas, params, jax.random.PRNGKey(6), cond_images=cond_images,
        wire="resident", **common
    )
    b = generate_patch_set(
        cas, params, jax.random.PRNGKey(6), cond_images=None,
        wire="resident", zoomed_image=zoomed, **common
    )
    for pos in patch_pos:
        np.testing.assert_array_equal(np.asarray(a[pos]), np.asarray(b[pos]))


def test_resident_fused_equals_unfused(monkeypatch):
    """The fused prep+sampling program (one dispatch per chunk, the
    round-4 dispatch-count fix) is bit-identical to the two-dispatch
    path: same ops, same impl, same RNG key schedule."""
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set, get_cond_images

    cas, params, zoomed = _tiny_cond_setup()
    _, patch_pos, grid = get_cond_images(
        zoomed, 1, overlap=0.25, mag_sizes=(256, 128, 32), patch_size=32,
        materialize=False,
    )
    common = dict(
        patch_pos=patch_pos, grid=grid, cond_images=None,
        wire="resident", zoomed_image=zoomed, progress=False,
        inpaint_resample_times=2,
    )
    monkeypatch.setenv("KDT_RESIDENT_FUSED", "0")
    a = generate_patch_set(cas, params, jax.random.PRNGKey(12), **common)
    monkeypatch.setenv("KDT_RESIDENT_FUSED", "1")
    b = generate_patch_set(cas, params, jax.random.PRNGKey(12), **common)
    assert set(a) == set(b)
    for pos in patch_pos:
        np.testing.assert_array_equal(np.asarray(a[pos]), np.asarray(b[pos]))


def test_resident_mesh_bit_equal_to_single_device():
    """Resident transport composes with SPMD wave sharding (r3 verdict
    Missing #3 — the old code silently downgraded to the uint8 host wire
    under a mesh): a 4-device mesh run is bit-identical to the
    single-device resident run. The patch set is spaced so every wave is
    exactly 4 patches — the padded bucket size (which seeds the noise
    shape) matches across both runs, making bit-equality well-defined."""
    from kidney_diffusion_tpu.parallel.mesh import make_mesh
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set

    cas, params, zoomed = _tiny_cond_setup()
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    grid = GridSpec(patch_width=16, patch_dist=12, num_patches_width=8, overlap=0.25)
    # columns 2 apart -> no next_to/diag deps; two rows -> wave 2 reads
    # wave 1's overlap strips (above-neighbour RePaint path under SPMD)
    pos = [(i, j) for i in range(2) for j in (0, 2, 4, 6)]
    common = dict(
        patch_pos=pos, grid=grid, cond_images=None, wire="resident",
        zoomed_image=zoomed, progress=False, inpaint_resample_times=2,
    )
    a = generate_patch_set(cas, params, jax.random.PRNGKey(9), **common)
    b = generate_patch_set(cas, params, jax.random.PRNGKey(9), mesh=mesh, **common)
    assert set(a) == set(b) == set(pos)
    for p in pos:
        np.testing.assert_array_equal(np.asarray(a[p]), np.asarray(b[p]))


def test_resident_mesh_general_grid_matches_uint8_mesh():
    """On an arbitrary grid (mixed wave sizes) the resident+mesh path
    equals the uint8+mesh path bit-for-bit — same quantization points,
    same padded bucket sizes, conditioning assembled on device."""
    from kidney_diffusion_tpu.parallel.mesh import make_mesh

    cas, params, zoomed = _tiny_cond_setup()
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    kwargs = dict(overlap=0.25, mag_sizes=(256, 128, 32), progress=False)
    a = generate_high_res_image(
        cas, params, jax.random.PRNGKey(10), zoomed, 1, wire="uint8",
        mesh=mesh, **kwargs
    )
    b = generate_high_res_image(
        cas, params, jax.random.PRNGKey(10), zoomed, 1, wire="resident",
        mesh=mesh, **kwargs
    )
    np.testing.assert_array_equal(a, b)


def test_final_stage_batch_knob():
    """final_stage_batch raises the >256² stage's wave-chunk cap (the
    dispatch-vs-compute trade for high-latency host links) and must not
    touch <=256² stages or undercut the mesh data size."""
    from kidney_diffusion_tpu.sample.gigapixel import _stage_batch

    # small stages always follow max_wave_batch
    assert _stage_batch(64, 32, None, 1) == 32
    assert _stage_batch(256, 32, 4, 1) == 32
    # big stages: default 1/device, knob raises, mesh floor respected
    assert _stage_batch(1024, 32, None, 1) == 1
    assert _stage_batch(1024, 32, 2, 1) == 2
    assert _stage_batch(1024, 32, None, 4) == 4
    assert _stage_batch(1024, 32, 2, 4) == 4


def test_last_use_waves_accounting():
    """Eviction bookkeeping: a dependency is kept through the wave of its
    LAST consumer, not a fixed window (irregular sets can consume a
    neighbour many waves after it was generated)."""
    from kidney_diffusion_tpu.sample.resident import last_use_waves

    pos = [(0, 0), (0, 1), (1, 0), (1, 1)]
    waves = plan_waves(pos, 1)
    last = last_use_waves(waves, 1)
    wave_of = {p: wi for wi, w in enumerate(waves) for p in w}
    for p in pos:
        for d in deps(p, 1):
            if d in wave_of:
                assert last[d] >= wave_of[p] - 1  # consumer's wave
    # a patch consumed by nobody can be evicted immediately
    lone = [(0, 0)]
    assert last_use_waves(plan_waves(lone, 1), 1).get((0, 0), -1) == -1


def test_resident_wave_scan_path(monkeypatch):
    """The wave-scan lever (round 5): >=SCAN_MIN_PIX stages run each
    wave chunk sequentially at batch 1 inside ONE lax.scan program.
    Same prep, same strips (all from earlier waves), same sampler — only
    the RNG stream differs from the per-patch path. Pin: every patch
    generated, valid, deterministic under the same key, and strip
    dependencies respected (runs through the same RePaint contract)."""
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set, get_cond_images

    cas, params, zoomed = _tiny_cond_setup()
    _, patch_pos, grid = get_cond_images(
        zoomed, 1, overlap=0.25, mag_sizes=(256, 128, 32), patch_size=32,
        materialize=False,
    )
    common = dict(
        patch_pos=patch_pos, grid=grid, cond_images=None,
        wire="resident", zoomed_image=zoomed, progress=False,
        inpaint_resample_times=2,
    )
    # engage scan on the tiny 32² stage (production gate: 512²)
    monkeypatch.setenv("KDT_RESIDENT_SCAN_MIN_PIX", "32")
    monkeypatch.setenv("KDT_RESIDENT_SCAN", "4")
    a = generate_patch_set(cas, params, jax.random.PRNGKey(3), **common)
    b = generate_patch_set(cas, params, jax.random.PRNGKey(3), **common)
    monkeypatch.delenv("KDT_RESIDENT_SCAN_MIN_PIX")
    c = generate_patch_set(cas, params, jax.random.PRNGKey(3), **common)
    assert set(a) == set(patch_pos) == set(c)
    for pos in patch_pos:
        arr = np.asarray(a[pos], np.float32)
        assert arr.shape == (32, 32, 3) and np.isfinite(arr).all()
        assert 0.0 <= arr.min() and arr.max() <= 1.0
        # deterministic under the same key
        np.testing.assert_array_equal(arr, np.asarray(b[pos], np.float32))
    # different RNG stream than the per-patch path, same distribution
    # family — outputs differ but remain comparable in scale
    diffs = [
        float(np.abs(np.asarray(a[p], np.float32) - np.asarray(c[p], np.float32)).mean())
        for p in patch_pos
    ]
    assert any(d > 0 for d in diffs)


def test_resident_batched_fetch(monkeypatch):
    """Finished patches are downloaded in fetch_batch groups (one
    device-stack + one round trip): results identical to per-patch
    fetching, and the fetch queue sees ~N/fetch_batch items."""
    from kidney_diffusion_tpu.sample.gigapixel import generate_patch_set, get_cond_images

    cas, params, zoomed = _tiny_cond_setup()
    _, patch_pos, grid = get_cond_images(
        zoomed, 1, overlap=0.25, mag_sizes=(256, 128, 32), patch_size=32,
        materialize=False,
    )
    common = dict(
        patch_pos=patch_pos, grid=grid, cond_images=None,
        wire="resident", zoomed_image=zoomed, progress=False,
    )
    monkeypatch.setenv("KDT_RESIDENT_FETCH_BATCH", "1")
    a = generate_patch_set(cas, params, jax.random.PRNGKey(5), **common)
    monkeypatch.setenv("KDT_RESIDENT_FETCH_BATCH", "4")
    b = generate_patch_set(cas, params, jax.random.PRNGKey(5), **common)
    assert set(a) == set(b)
    for pos in patch_pos:
        np.testing.assert_array_equal(np.asarray(a[pos]), np.asarray(b[pos]))
