from .pipeline import make_loader
from .wsi import (
    AIRS_FILL_COLOR,
    AIRS_MAG_LEVEL_SIZES,
    ArraySlide,
    FILL_COLOR,
    MAG_LEVEL_SIZES,
    PATCH_SIZE,
    SlideioSlide,
    inner_patch_width,
    read_block,
    read_block_and_zoomed,
    resize_nearest,
)
from .patient import (
    AnnotationStore,
    PatientDataset,
    PatientMetadata,
    detect_tissue_patches,
    normalize_creatinine,
    normalize_days_post_transplant,
    normalize_outcome,
    split_annotated_ids,
)
from .ultra_res import UltraResPatientDataset, center_cond_image
from .kumar import KumarDataset
from .airs import AirsDataset
from .folder import ImageFolderDataset, cycle

__all__ = [
    "AIRS_FILL_COLOR",
    "AIRS_MAG_LEVEL_SIZES",
    "AnnotationStore",
    "AirsDataset",
    "ArraySlide",
    "FILL_COLOR",
    "ImageFolderDataset",
    "KumarDataset",
    "MAG_LEVEL_SIZES",
    "PATCH_SIZE",
    "PatientDataset",
    "PatientMetadata",
    "SlideioSlide",
    "UltraResPatientDataset",
    "center_cond_image",
    "cycle",
    "detect_tissue_patches",
    "inner_patch_width",
    "make_loader",
    "normalize_creatinine",
    "normalize_days_post_transplant",
    "normalize_outcome",
    "read_block",
    "read_block_and_zoomed",
    "resize_nearest",
    "split_annotated_ids",
]
