"""Pin the Flax InceptionV3 to the torch FID graph.

The reference's FID (/root/reference/evaluation.py:55-68) depends on
pytorch-fid's InceptionV3 pool3 features. These tests prove the Flax
reimplementation (eval/inception.py) computes the SAME function:

  * structural parity — identical state_dict key/shape layout;
  * numerical parity — pool3 activations match a torch execution of the
    FID graph under deterministic synthetic weights, THROUGH the real
    converter (eval/fid.py:convert_torch_fid_weights), to ~1e-5;
  * a committed golden fixture keeps the pin active without torch.

With these green, loading the standard pt_inception-2015-12-05
checkpoint through the same converter provably yields pytorch-fid
features (the only unverifiable-offline link is the download itself).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from inception_ref import (  # noqa: E402
    build_torch_model,
    fixture_input,
    flax_torch_shapes,
    synthetic_state_dict,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "inception_pool3.npz")


def _flax_pool3_from_npz(npz_path):
    import jax.numpy as jnp

    from kidney_diffusion_tpu.eval.inception import InceptionV3, load_params

    model = InceptionV3()
    params = load_params(model, npz_path)
    return np.asarray(model.apply(params, jnp.asarray(fixture_input())))


@pytest.mark.slow
def test_flax_pool3_matches_golden_torch_fixture(tmp_path):
    """Torch-free pin: deterministic weights -> Flax pool3 must equal the
    committed torch-generated activations."""
    sd = synthetic_state_dict(flax_torch_shapes())
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **sd)
    out = _flax_pool3_from_npz(npz)
    ref = np.load(FIXTURE)["pool3"]
    assert np.abs(out - ref).max() < 1e-3 * ref.std()


@pytest.mark.slow
def test_torch_graph_and_converter_roundtrip(tmp_path):
    """Live torch cross-check: same weights through torch forward vs
    torch.save -> convert_torch_fid_weights -> Flax forward."""
    torch = pytest.importorskip("torch")

    from kidney_diffusion_tpu.eval.fid import convert_torch_fid_weights

    model = build_torch_model()
    shapes = {
        k: tuple(v.shape)
        for k, v in model.state_dict().items()
        if "num_batches_tracked" not in k
    }
    # structural parity with the Flax-derived layout
    assert shapes == flax_torch_shapes()

    sd = synthetic_state_dict(shapes)
    model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    model.eval()
    with torch.no_grad():
        ref = model(
            torch.from_numpy(fixture_input()).permute(0, 3, 1, 2)
        ).numpy()
    # the golden fixture IS this torch output — assert it hasn't drifted
    np.testing.assert_allclose(ref, np.load(FIXTURE)["pool3"], atol=1e-5)

    pth = str(tmp_path / "w.pth")
    npz = str(tmp_path / "w.npz")
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pth)
    convert_torch_fid_weights(pth, npz)
    out = _flax_pool3_from_npz(npz)
    assert np.abs(out - ref).max() < 1e-3 * ref.std()


@pytest.mark.slow
def test_fid_with_pinned_weights_end_to_end(tmp_path):
    """calculate_fid_given_paths with the verified graph: FID(a, a) = 0,
    FID(a, b) > 0, matching the reference CLI semantics."""
    from PIL import Image

    from kidney_diffusion_tpu.eval.fid import calculate_fid_given_paths

    sd = synthetic_state_dict(flax_torch_shapes())
    npz = str(tmp_path / "w.npz")
    np.savez(npz, **sd)

    rng = np.random.RandomState(0)
    for name, shift in (("a", 0), ("b", 80)):
        d = tmp_path / name
        d.mkdir()
        for i in range(8):
            img = (rng.rand(32, 32, 3) * 120 + shift).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")

    fid_aa = calculate_fid_given_paths(
        (str(tmp_path / "a"), str(tmp_path / "a")), weights_path=npz, batch_size=4
    )
    fid_ab = calculate_fid_given_paths(
        (str(tmp_path / "a"), str(tmp_path / "b")), weights_path=npz, batch_size=4
    )
    assert abs(fid_aa) < 1e-4
    assert fid_ab > 1.0
