from .gated_crf_pallas import gated_crf_loss_pallas

__all__ = ["gated_crf_loss_pallas"]
