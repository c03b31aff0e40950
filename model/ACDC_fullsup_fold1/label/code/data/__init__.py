from .acdc import (
    ALL_CASES,
    AcdcSliceDataset,
    AcdcVolumeDataset,
    default_acdc_root,
    fold_ids,
    labeled_patient_ids,
)
from .augment import HostRandomGenerator
from .augment_device import augment_batch
from .loader import batch_iterator, paired_iterator

__all__ = [
    "ALL_CASES",
    "AcdcSliceDataset",
    "AcdcVolumeDataset",
    "default_acdc_root",
    "fold_ids",
    "labeled_patient_ids",
    "HostRandomGenerator",
    "augment_batch",
    "batch_iterator",
    "paired_iterator",
]
