from .fid import (
    calculate_fid_given_paths,
    compute_statistics,
    compute_statistics_of_path,
    convert_torch_fid_weights,
    frechet_distance,
    save_statistics,
)
from .patch_sampler import CropTransformation, export_pairs, sample_pair, sample_patch

__all__ = [
    "CropTransformation",
    "calculate_fid_given_paths",
    "compute_statistics",
    "compute_statistics_of_path",
    "convert_torch_fid_weights",
    "export_pairs",
    "frechet_distance",
    "sample_pair",
    "sample_patch",
    "save_statistics",
]
