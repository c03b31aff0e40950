"""Training-method zoo.

Each module rebuilds one reference train script as a functional jitted step
over the shared TrainState. `get_method(name)` returns the module; every
module exposes ``build(cfg) -> MethodBundle``.
"""

from __future__ import annotations

from importlib import import_module

_METHODS = {
    # WSS zoo (train_wss.sh)
    "fully_supervised": "fully_supervised",          # train_fully_supervised_2D.py
    "pce": "pce",                                    # train_weakly_supervised_pCE_2D.py
    "pce_tv": "pce_regularized",                     # ..._pCE_TV_2D.py
    "pce_entropy_mini": "pce_regularized",           # ..._pCE_Entropy_Mini_2D.py
    "pce_gatedcrf": "pce_regularized",               # ..._pCE_GatedCRFLoss_2D.py
    "pce_mumford_shah": "pce_regularized",           # ..._pCE_MumfordShah_Loss_2D.py
    "pce_intensity_variance": "pce_regularized",     # ..._pCE_Inter&Intra_Class_2D.py
    "pce_random_walker": "fully_supervised",         # ..._pCE_random_walker_2D.py
    "dmpls": "dmpls",                                # ..._segmentation_pCE_ours_proposed.py
    "s2l": "s2l",                                    # train_s2l.py
    "ustm": "ustm",                                  # train_weakly_supervised_ustm_2D.py
    # semi-supervised zoo (train_semi.sh)
    "mean_teacher": "mean_teacher",                  # train_mean_teacher_2D.py
    "uamt": "mean_teacher",                          # train_uncertainty_aware_mean_teacher_2D.py
    "entropy_minimization": "mean_teacher",          # train_entropy_minimization_2D.py
    "partially_supervised": "mean_teacher",          # train_partially_fully_supervised.py
    "deep_adversarial": "deep_adversarial",          # train_deep_adversarial_network_2D.py
    # ScribbleVC (train_ACDC_scribblevc.py / train_MSCMR_scribblevc.py)
    "scribblevc": "scribblevc",
}


def get_method(name: str):
    try:
        mod_name = _METHODS[name]
    except KeyError:
        raise KeyError(
            f"unknown method {name!r}; available: {sorted(_METHODS)}"
        ) from None
    return import_module(f".{mod_name}", __package__)


def available_methods():
    return sorted(_METHODS)
