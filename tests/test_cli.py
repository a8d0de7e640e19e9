"""CLI smoke tests: every entry point imports and parses --help."""

import importlib
import sys

import pytest

CLI_MODULES = [
    "kidney_diffusion_tpu.cli.train_patch",
    "kidney_diffusion_tpu.cli.train_ultra_res",
    "kidney_diffusion_tpu.cli.train_kumar",
    "kidney_diffusion_tpu.cli.sample_patch",
    "kidney_diffusion_tpu.cli.sample_ultra_res",
    "kidney_diffusion_tpu.cli.sample_ultra_res_demo",
    "kidney_diffusion_tpu.cli.outpainting",
    "kidney_diffusion_tpu.cli.evaluation",
    "kidney_diffusion_tpu.cli.generate_patches",
    "kidney_diffusion_tpu.cli.patch_pairs",
    "kidney_diffusion_tpu.cli.train_debug",
    "kidney_diffusion_tpu.cli.scheduler_viz",
]


@pytest.mark.parametrize("module_name", CLI_MODULES)
def test_cli_imports_and_help(module_name, monkeypatch, capsys):
    mod = importlib.import_module(module_name)
    assert hasattr(mod, "main")
    monkeypatch.setattr(sys, "argv", [module_name, "--help"])
    with pytest.raises(SystemExit) as e:
        mod.main()
    assert e.value.code == 0
    assert "usage" in capsys.readouterr().out.lower()


def test_public_package_surface():
    """The package-level modules all import cleanly."""
    for name in (
        "kidney_diffusion_tpu",
        "kidney_diffusion_tpu.cascade",
        "kidney_diffusion_tpu.core",
        "kidney_diffusion_tpu.models",
        "kidney_diffusion_tpu.ops",
        "kidney_diffusion_tpu.parallel",
        "kidney_diffusion_tpu.train",
        "kidney_diffusion_tpu.sample",
        "kidney_diffusion_tpu.data",
        "kidney_diffusion_tpu.eval",
        "kidney_diffusion_tpu.kernels.attention",
        "kidney_diffusion_tpu.utils",
    ):
        importlib.import_module(name)


def test_load_labelmaps_range_and_filter(tmp_path):
    """--start_index/--end_index select a sorted file range, and the
    glom/tubules filter zeroes the Vein/Vessel (ch1) and Artery (ch2)
    channels (sample_cond.py:73,79: labels Tubuli=1 ... Glomerui=4)."""
    import numpy as np
    from kidney_diffusion_tpu.cli.sample_patch import load_labelmaps

    rng = np.random.default_rng(0)
    for i in range(5):
        lm = rng.integers(0, 5, size=(8, 8))
        np.save(tmp_path / f"mask_{i}.npy", lm)

    all_maps = load_labelmaps(str(tmp_path), None)
    assert all_maps.shape == (5, 8, 8, 4)
    sliced = load_labelmaps(str(tmp_path), None, 1, 3)
    assert sliced.shape[0] == 2
    np.testing.assert_array_equal(sliced, all_maps[1:3])

    filtered = load_labelmaps(str(tmp_path), "glom_tubules", 1, 3)
    assert filtered[..., 1].sum() == 0 and filtered[..., 2].sum() == 0
    np.testing.assert_array_equal(filtered[..., 0], sliced[..., 0])
    np.testing.assert_array_equal(filtered[..., 3], sliced[..., 3])


def _patient_tree(tmp_path):
    """Reference-layout data dir: csv sheets (see cli/data_setup.py),
    one tissue-covered synthetic SVS, and a labelbox-style results.h5
    with 8 annotated slides (6 most-annotated get held out,
    patient_dataset.py:52-67 -> 2 train ids)."""
    import h5py
    import numpy as np
    from kidney_diffusion_tpu.data.tiff_writer import write_synthetic_svs

    root = tmp_path / "data"
    (root / "svs").mkdir(parents=True)
    (root / "creatinine").mkdir()
    img = np.full((2048, 2048, 3), (200, 120, 160), np.uint8)  # all tissue
    write_synthetic_svs(
        str(root / "svs" / "slideA.svs"), img, levels=2, tile_size=(256, 256)
    )
    (root / "outcomes.csv").write_text(
        "patient_UUID,slide_UUID,final_outcome,"
        "time post tx of biopsy (days),Date of transplantation\n"
        "p1,slideA,Functioning,120,2020-01-01\n"
    )
    (root / "creatinine" / "p1.csv").write_text(
        "Value,Sample Collected Date\n400,2020-02-01\n500,2020-03-15\n"
    )
    rng = np.random.default_rng(0)
    with h5py.File(root / "results.h5", "w") as h5:
        for s in range(8):
            for j in range(2 if s < 6 else 1):
                g = h5.create_group(f"slide{s:02d} {j + 1}")
                g["rawimage"] = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
                g["Tubuli"] = (rng.random((1024, 1024)) > 0.5).astype(np.uint8)
    return root


def test_load_patient_environment_csv_fallback(tmp_path):
    """The reference data prologue runs end-to-end from csv sheets
    (xlsx needs openpyxl, absent in minimal images)."""
    from kidney_diffusion_tpu.cli.data_setup import load_patient_environment

    root = _patient_tree(tmp_path)
    slides, metadata, annotations = load_patient_environment(
        str(root), verbose=False
    )
    assert set(slides) == {"slideA"}
    rec = metadata.records["slideA"]
    assert rec["outcome"] == 0.0  # Functioning -> index 0
    assert rec["creatinine"] is not None and rec["creatinine"] > 0
    assert len(annotations.list_ids()) == 14


@pytest.mark.parametrize("annotated", [False, True])
def test_generate_patches_end_to_end(tmp_path, monkeypatch, annotated):
    """cli.generate_patches exports real PNG patches in both dataset
    modes (reference generate_patches.py:48,66)."""
    import numpy as np
    from PIL import Image

    from kidney_diffusion_tpu.data import native

    if not native.available():
        pytest.skip("libkdt_native.so not built")
    root = _patient_tree(tmp_path)
    out = tmp_path / ("annotated" if annotated else "plain")
    argv = [
        "generate_patches", "--data_path", str(root), "--output", str(out),
        "--num_workers", "2", "--limit", "2",
    ] + (["--annotated_dataset"] if annotated else [])
    monkeypatch.setattr(sys, "argv", argv)
    from kidney_diffusion_tpu.cli import generate_patches

    generate_patches.main()
    files = sorted(out.glob("*.png"))
    assert len(files) == 2
    with Image.open(files[0]) as im:
        expect = 64 if annotated else 1024  # h5 rawimage vs SVS patch
        assert im.size == (expect, expect)
        if not annotated:  # tissue-pink survives the JPEG round trip
            px = np.asarray(im.convert("RGB"))
            assert np.abs(px.mean((0, 1)) - (200, 120, 160)).max() < 8
