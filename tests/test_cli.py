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
