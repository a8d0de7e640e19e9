"""FID evaluation (Fréchet Inception Distance).

Capability parity with /root/reference/evaluation.py (a vendored
pytorch-fid): InceptionV3 pool3 activations -> per-set mean/covariance
-> Fréchet distance, with path-or-npz statistics and a --save-stats
mode. Re-designed for TPU:

  * the feature extractor is a Flax InceptionV3 (eval/inception.py)
    running batched under jit; weights load from an .npz converted from
    the standard pytorch-fid checkpoint (`convert_torch_fid_weights`),
    since this environment has no network egress to fetch them
  * the Fréchet math is numpy/scipy exactly as the standard definition
  * any feature extractor with `(B, H, W, 3) [0,1] -> (B, D)` works
    (`feature_fn`), so FID-like distances can be computed with custom
    embedders as well
"""

from __future__ import annotations

import os
import pathlib
from typing import Callable, Iterable, Optional, Tuple

import numpy as np

IMAGE_EXTS = {"bmp", "jpg", "jpeg", "pgm", "png", "ppm", "tif", "tiff", "webp"}


# ---------------------------------------------------------------------------
# Fréchet distance (statistics layer)
# ---------------------------------------------------------------------------


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of a feature matrix (N, D)."""
    mu = np.mean(features, axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """d² = |mu1 - mu2|² + Tr(s1 + s2 - 2·sqrt(s1·s2))."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------


def list_images(path: str) -> list:
    p = pathlib.Path(path)
    return sorted(f for ext in IMAGE_EXTS for f in p.glob(f"*.{ext}"))


def _load_image(path, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if size and im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, np.float32) / 255.0


def iter_image_batches(
    files: Iterable, batch_size: int, size: int = 299
) -> Iterable[np.ndarray]:
    batch = []
    for f in files:
        batch.append(_load_image(f, size))
        if len(batch) == batch_size:
            yield np.stack(batch)
            batch = []
    if batch:
        yield np.stack(batch)


def default_feature_fn(weights_path: Optional[str] = None) -> Callable:
    """The InceptionV3 pool3 extractor (jitted). Random-init (clearly
    warned) when no weights file is given — still a valid embedding for
    RELATIVE comparisons with itself, but not comparable to published
    FID numbers."""
    import jax
    import jax.numpy as jnp

    from .inception import InceptionV3, load_params

    model = InceptionV3()
    params = load_params(model, weights_path)
    if weights_path is None:
        print(
            "[fid] WARNING: no --inception-weights given; using a fixed "
            "random-init InceptionV3. Distances are self-consistent but NOT "
            "comparable to published FID numbers.",
        )

    @jax.jit
    def features(batch):
        return model.apply(params, jnp.asarray(batch))

    return lambda batch: np.asarray(features(batch))


def compute_statistics_of_path(
    path: str,
    feature_fn: Callable,
    *,
    batch_size: int = 50,
    num_samples: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """mu/sigma for a directory of images or a precomputed .npz
    (evaluation.py:252-265 semantics)."""
    if path.endswith(".npz"):
        with np.load(path) as f:
            return f["mu"][:], f["sigma"][:]
    files = list_images(path)
    if num_samples is not None:
        files = files[:num_samples]
    assert files, f"no images under {path}"
    feats = [feature_fn(b) for b in iter_image_batches(files, batch_size)]
    return compute_statistics(np.concatenate(feats, axis=0))


def calculate_fid_given_paths(
    paths: Tuple[str, str],
    *,
    feature_fn: Optional[Callable] = None,
    batch_size: int = 50,
    weights_path: Optional[str] = None,
) -> float:
    feature_fn = feature_fn or default_feature_fn(weights_path)
    mu1, s1 = compute_statistics_of_path(paths[0], feature_fn, batch_size=batch_size)
    mu2, s2 = compute_statistics_of_path(paths[1], feature_fn, batch_size=batch_size)
    return frechet_distance(mu1, s1, mu2, s2)


def save_statistics(
    path: str, out: str, *, feature_fn: Optional[Callable] = None,
    batch_size: int = 50, weights_path: Optional[str] = None,
) -> None:
    """--save-stats mode (evaluation.py:155-209)."""
    feature_fn = feature_fn or default_feature_fn(weights_path)
    mu, sigma = compute_statistics_of_path(path, feature_fn, batch_size=batch_size)
    np.savez(out, mu=mu, sigma=sigma)


def convert_torch_fid_weights(pt_path: str, out_npz: str) -> None:
    """Convert the standard pytorch-fid InceptionV3 checkpoint
    (pt_inception-2015-12-05) into the .npz layout eval/inception.py
    loads. Run once on a machine that has the file."""
    import torch

    state = torch.load(pt_path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    np.savez(out_npz, **{k: v.numpy() for k, v in state.items()})
