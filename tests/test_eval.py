import numpy as np
import pytest

from kidney_diffusion_tpu.data.wsi import ArraySlide
from kidney_diffusion_tpu.eval import (
    compute_statistics,
    frechet_distance,
    sample_pair,
    sample_patch,
)
from kidney_diffusion_tpu.eval.fid import (
    compute_statistics_of_path,
    iter_image_batches,
    list_images,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 8))
    mu, sigma = compute_statistics(f)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-8


def test_frechet_distance_closed_form_gaussians():
    # two isotropic gaussians: d² = |mu1-mu2|² + sum (sqrt(v1)-sqrt(v2))²
    rng = np.random.default_rng(1)
    d = 4
    n = 200_000
    f1 = rng.normal(0.0, 1.0, size=(n, d))
    f2 = rng.normal(2.0, 3.0, size=(n, d))
    mu1, s1 = compute_statistics(f1)
    mu2, s2 = compute_statistics(f2)
    got = frechet_distance(mu1, s1, mu2, s2)
    expected = d * (2.0**2) + d * (1.0 - 3.0) ** 2
    assert abs(got - expected) / expected < 0.05


def test_frechet_distance_monotone_in_mean_shift():
    rng = np.random.default_rng(2)
    base = rng.normal(size=(1000, 6))
    mu, s = compute_statistics(base)
    dists = [
        frechet_distance(mu, s, mu + shift, s) for shift in (0.0, 0.5, 1.0, 2.0)
    ]
    assert dists[0] < 1e-8
    assert all(a < b for a, b in zip(dists, dists[1:]))


def test_statistics_of_image_dir(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(3)
    for i in range(6):
        arr = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i}.png")

    # mean-color features: cheap, deterministic
    def feature_fn(batch):
        return batch.reshape(batch.shape[0], -1, 3).mean(axis=1)

    mu, sigma = compute_statistics_of_path(
        str(tmp_path), feature_fn, batch_size=4
    )
    assert mu.shape == (3,)
    assert sigma.shape == (3, 3)
    # npz round trip
    np.savez(tmp_path / "stats.npz", mu=mu, sigma=sigma)
    mu2, sigma2 = compute_statistics_of_path(str(tmp_path / "stats.npz"), feature_fn)
    np.testing.assert_allclose(mu2, mu)


def test_image_batching(tmp_path):
    from PIL import Image

    for i in range(5):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(tmp_path / f"{i}.png")
    files = list_images(str(tmp_path))
    batches = list(iter_image_batches(files, 2, size=32))
    assert [b.shape[0] for b in batches] == [2, 2, 1]
    assert batches[0].shape[1:] == (32, 32, 3)


def test_paired_patch_sampler_reuses_scale():
    rng = np.random.default_rng(4)
    real = ArraySlide(rng.integers(0, 255, size=(400, 400, 3), dtype=np.uint8))
    fake = ArraySlide(rng.integers(0, 255, size=(300, 300, 3), dtype=np.uint8))
    rp, fp = sample_pair(
        real, fake, patch_size=64, size_min=64, size_max=256, rng=np.random.default_rng(0)
    )
    assert rp.shape == fp.shape == (64, 64, 3)


def test_sample_patch_transformation_reuse():
    rng_img = np.random.default_rng(5)
    slide = ArraySlide(rng_img.integers(0, 255, size=(300, 300, 3), dtype=np.uint8))
    rng = np.random.default_rng(6)
    p1, t = sample_patch(slide, 300, None, 2.0, 64, rng)
    # reusing the transformation keeps the scale fields
    p2, t2 = sample_patch(slide, 300, None, 2.0, 64, rng, transformation=t)
    assert t2.rand_size == t.rand_size
    assert p1.shape == p2.shape == (64, 64, 3)


def test_inception_graph_shapes():
    """Graph wiring check on a tiny batch (random init)."""
    import jax
    import jax.numpy as jnp

    from kidney_diffusion_tpu.eval.inception import InceptionV3

    model = InceptionV3()
    x = jnp.zeros((1, 299, 299, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 2048)
    # channel counts at the torch state-dict names we map to
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(getattr(k, "key", str(k)) for k in p) for p, _ in flat}
    assert any("Mixed_7c" in n for n in names)
    assert any("Conv2d_1a_3x3" in n for n in names)
