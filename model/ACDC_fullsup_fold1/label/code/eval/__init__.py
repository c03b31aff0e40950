from .metrics import (
    asd,
    calculate_metric_percase,
    calculate_metric_percase_spacing,
    dice_coefficient,
    hd95,
    surface_distances,
)
from .val2d import (
    VolumePredictor,
    evaluate_fold,
    test_single_volume,
)

__all__ = [
    "asd",
    "calculate_metric_percase",
    "calculate_metric_percase_spacing",
    "dice_coefficient",
    "hd95",
    "surface_distances",
    "VolumePredictor",
    "evaluate_fold",
    "test_single_volume",
]
