"""ACDC scribble-segmentation dataset: fold logic + RAM-cached HDF5 readers.

Behavioral contract follows the reference loader
(/root/reference/code/dataloaders/dataset_semi.py:17-125):

  * 100 patients, 5 folds; fold ``k`` holds out patients ``20(k-1)+1 .. 20k``
    as the validation set (dataset_semi.py:62-99).
  * train split indexes per-slice H5 files under ``ACDC_training_slices/``
    and supervises on ``h5f[sup_type]`` (``label`` | ``scribble`` |
    ``random_walker``) (dataset_semi.py:115-118);
  * val split indexes whole volumes under ``ACDC_training_volumes/``
    with dense ``label`` (dataset_semi.py:109-111, 120-123);
  * for semi-supervised methods, the "labeled" subset is the patients whose
    id is a multiple of 10 intersected with the fold's train ids
    (dataset_semi.py:27-34).

TPU-first departures from the reference:
  * the whole split is loaded into RAM once (~0.5 GB for all 1,902 slices)
    instead of opening an HDF5 file per __getitem__;
  * slices are pre-resized (order-0 nearest zoom, matching
    dataset.py:160-164 semantics) to the network patch size at load time so
    that a training batch is a pure ``take`` over one contiguous array and
    geometric augmentation can run on-device inside the jitted step;
  * an optional ``keep_native=True`` retains the native-resolution arrays
    for the exact host-side augmentation path (aug-then-zoom ordering).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import h5py
import numpy as np

ALL_CASES = ["patient{:0>3}".format(i) for i in range(1, 101)]

_FOLD_RE = re.compile(r"^fold([1-5])$")


def default_acdc_root() -> str:
    """Resolve the ACDC data root (env override > bundled reference data)."""
    env = os.environ.get("WSL4MIS_ACDC_ROOT")
    if env:
        return env
    for cand in ("/root/reference/data/ACDC", "../data/ACDC", "data/ACDC"):
        if os.path.isdir(cand):
            return cand
    return "../data/ACDC"


def fold_ids(fold: str) -> tuple[list[str], list[str]]:
    """(train_patients, test_patients) for ``fold1``..``fold5``.

    Parity: dataset_semi.py:62-99 — fold k tests patients [20(k-1)+1, 20k].
    """
    m = _FOLD_RE.match(fold)
    if not m:
        raise KeyError(f"unknown fold {fold!r}; expected fold1..fold5")
    k = int(m.group(1))
    testing = set(ALL_CASES[20 * (k - 1): 20 * k])
    train = [c for c in ALL_CASES if c not in testing]
    return train, sorted(testing)


_MAAG_TRAIN35 = [37, 50, 53, 100, 38, 19, 61, 74, 97, 31, 91, 35, 56, 94,
                 26, 69, 46, 59, 4, 89, 71, 6, 52, 43, 45, 63, 93, 14, 98,
                 88, 21, 28, 99, 54, 90]
_MAAG_TRAIN70 = _MAAG_TRAIN35 + [2, 76, 34, 85, 70, 86, 3, 8, 51, 40, 7, 13,
                                 47, 55, 12, 58, 87, 9, 65, 62, 33, 42, 23,
                                 92, 29, 11, 83, 68, 75, 67, 16, 48, 66, 20,
                                 15]
_MAAG_VAL = [84, 32, 27, 96, 17, 18, 57, 81, 79, 22, 1, 44, 49, 25, 95]
# held-out offline test set (test_ACDC_scribblevc.py:45-46)
_MAAG_TEST = [5, 39, 77, 82, 78, 10, 64, 24, 30, 73, 80, 41, 36, 60, 72]


def maag_test_ids() -> list[str]:
    return ["patient{:0>3}".format(i) for i in _MAAG_TEST]


def maag_fold_ids(fold: str, seed: int = 0) -> tuple[list[str], list[str]]:
    """ScribbleVC's MAAG benchmark splits (dataset_scribblevc.py:314-336).

    'MAAGfold' = 35 train patients, 'MAAGfold70' = 70, 'MAAGfoldN' = a
    random N-subset of the 70; validation is a fixed 15-patient set.
    """
    fmt = "patient{:0>3}".format
    val = [fmt(i) for i in _MAAG_VAL]
    if fold == "MAAGfold":
        return [fmt(i) for i in _MAAG_TRAIN35], val
    if fold == "MAAGfold70":
        return [fmt(i) for i in _MAAG_TRAIN70], val
    if fold.startswith("MAAGfold"):
        n = int(fold[8:])
        rng = np.random.RandomState(seed)
        chosen = rng.choice(_MAAG_TRAIN70, size=n, replace=False)
        return [fmt(i) for i in chosen], val
    raise KeyError(f"unknown MAAG fold {fold!r}")


_MSCMR_TRAIN = [13, 14, 15, 18, 19, 20, 21, 22, 24, 25, 26, 27, 2, 31, 32,
                34, 37, 39, 42, 44, 45, 4, 6, 7, 9]
_MSCMR_VAL = [1, 29, 36, 41, 8]


def mscmr_fold_ids() -> tuple[list[str], list[str]]:
    """MSCMR fixed split (dataset_scribblevc.py:406-410; 2-digit ids)."""
    fmt = "patient{:0>2}".format
    return [fmt(i) for i in _MSCMR_TRAIN], [fmt(i) for i in _MSCMR_VAL]


_PROSTATE_A_TEST = [61, 58, 22, 56, 44, 24, 40, 59, 53, 64, 65, 35, 30, 78,
                    72, 80, 26, 68, 52, 74]


def prostate_fold_ids(fold: str) -> tuple[list[str], list[str]]:
    """Prostate ScribbleVC splits (dataset_scribblevc.py:78-116).

    80 patients; ``prostate_fold1..4`` hold out 20-patient blocks;
    ``prostate_a`` tests a fixed 20-patient set. Reference quirk kept: the
    'a' train list excludes fold4's block rather than the 'a' test ids
    (dataset_scribblevc.py:100-103).
    """
    fmt = "patient{:0>3}".format
    all_cases = [fmt(i) for i in range(1, 81)]
    sub = fold[len("prostate_"):]
    if sub == "a":
        f4 = {fmt(i) for i in range(61, 81)}
        return [c for c in all_cases if c not in f4], [
            fmt(i) for i in _PROSTATE_A_TEST
        ]
    m = re.match(r"^fold([1-4])$", sub)
    if not m:
        raise KeyError(
            f"unknown prostate fold {fold!r}; expected prostate_fold1..4 "
            "or prostate_a"
        )
    k = int(m.group(1))
    testing = set(all_cases[20 * (k - 1): 20 * k])
    return [c for c in all_cases if c not in testing], sorted(testing)


def resolve_fold_ids(fold: str) -> tuple[list[str], list[str]]:
    """fold1..5 (20-patient holdout), MAAGfold*, MSCMRfold, or prostate_*."""
    if fold.startswith("MAAGfold"):
        return maag_fold_ids(fold)
    if fold == "MSCMRfold":
        return mscmr_fold_ids()
    if fold.startswith("prostate_"):
        return prostate_fold_ids(fold)
    return fold_ids(fold)


def labeled_patient_ids(fold: str) -> tuple[list[str], list[str]]:
    """Semi-supervised (labeled, unlabeled) patient split within a fold.

    Parity: dataset_semi.py:27-34 — labeled = multiples of 10 in train ids.
    """
    train, _ = fold_ids(fold)
    all_labeled = ["patient{:0>3}".format(10 * i) for i in range(1, 11)]
    labeled = [c for c in all_labeled if c in train]
    unlabeled = [c for c in train if c not in labeled]
    return labeled, unlabeled


def _nearest_zoom2d(arr: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Order-0 zoom equivalent to scipy.ndimage.zoom(arr, scale, order=0).

    scipy's order-0 spline samples output pixel i at input coordinate
    i / scale = i * in / out and rounds to nearest (ties toward +inf after
    the 0.5 offset convention); we replicate with explicit index math so the
    loader has no scipy dependency on the hot path.
    """
    h, w = arr.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return np.ascontiguousarray(arr)
    # scipy zoom (grid_mode=False) maps output i -> i * (in-1)/(out-1);
    # spline order 0 rounds half up. Verified element-exact vs scipy.
    ri = np.floor(np.arange(oh) * ((h - 1) / (oh - 1)) + 0.5).astype(np.int64)
    ci = np.floor(np.arange(ow) * ((w - 1) / (ow - 1)) + 0.5).astype(np.int64)
    ri = np.clip(ri, 0, h - 1)
    ci = np.clip(ci, 0, w - 1)
    return np.ascontiguousarray(arr[np.ix_(ri, ci)])


@dataclass
class AcdcSliceDataset:
    """All training slices of a fold, cached in RAM, pre-resized.

    Attributes
    ----------
    images : (N, H, W) float32, pre-zoomed to ``patch_size``.
    labels : (N, H, W) int32, supervision per ``sup_type`` (scribbles use
        class 4 = unannotated, acdc_data_processing convention).
    dense_labels : (N, H, W) int32, always the dense ``label`` key (used by
        methods that need GT presence info irrespective of supervision).
    case_ids : patient id per slice (e.g. "patient005").
    slice_names : source H5 filename per slice.
    """

    base_dir: str | None = None
    fold: str = "fold1"
    sup_type: str = "label"
    labeled_type: str | None = None  # None | "labeled" | "unlabeled"
    patch_size: tuple[int, int] = (256, 256)
    keep_native: bool = False
    limit: int | None = None  # cap slice count (fast tests/smoke runs)
    slices_dirname: str = "ACDC_training_slices"
    rw_mode: str = "acdc"  # on-the-fly random-walker generator variant when
                           # sup_type == "random_walker" has no precomputed
                           # H5 key: "acdc" (acdc_pseudo_label_random_walker
                           # .py:9-26) or "prostate" (dataset_scribblevc
                           # .py:20-36)

    images: np.ndarray = field(init=False, repr=False)
    labels: np.ndarray = field(init=False, repr=False)
    dense_labels: np.ndarray = field(init=False, repr=False)
    case_ids: list[str] = field(init=False, repr=False)
    slice_names: list[str] = field(init=False, repr=False)
    native_images: list[np.ndarray] | None = field(init=False, repr=False)
    native_labels: list[np.ndarray] | None = field(init=False, repr=False)

    def __post_init__(self):
        base = self.base_dir or default_acdc_root()
        slices_dir = os.path.join(base, self.slices_dirname)
        train_ids, _ = resolve_fold_ids(self.fold)
        if self.labeled_type is not None:
            labeled, unlabeled = labeled_patient_ids(self.fold)
            wanted = labeled if self.labeled_type == "labeled" else unlabeled
        else:
            wanted = train_ids
        wanted = set(wanted)
        names = sorted(
            f for f in os.listdir(slices_dir) if f.split("_")[0] in wanted
        )
        if not names:
            raise FileNotFoundError(f"no slices for {self.fold} in {slices_dir}")
        if self.limit is not None:
            names = names[: self.limit]

        imgs, labs, dense = [], [], []
        native_i: list[np.ndarray] = []
        native_l: list[np.ndarray] = []
        for name in names:
            with h5py.File(os.path.join(slices_dir, name), "r") as f:
                img = f["image"][:].astype(np.float32)
                if self.sup_type == "random_walker" and self.sup_type not in f:
                    # on-the-fly pseudo label from the scribble
                    # (dataset_scribblevc.py:353-356)
                    from .random_walker import (
                        pseudo_label_generator_acdc,
                        pseudo_label_generator_prostate,
                    )

                    gen = (pseudo_label_generator_prostate
                           if self.rw_mode == "prostate"
                           else pseudo_label_generator_acdc)
                    lab = gen(img, f["scribble"][:].astype(np.int32))
                else:
                    lab = f[self.sup_type][:].astype(np.int32)
                den = f["label"][:].astype(np.int32)
            imgs.append(_nearest_zoom2d(img, self.patch_size))
            labs.append(_nearest_zoom2d(lab, self.patch_size))
            dense.append(_nearest_zoom2d(den, self.patch_size))
            if self.keep_native:
                native_i.append(img)
                native_l.append(lab)
        self.images = np.stack(imgs).astype(np.float32)
        self.labels = np.stack(labs).astype(np.int32)
        self.dense_labels = np.stack(dense).astype(np.int32)
        self.case_ids = [n.split("_")[0] for n in names]
        self.slice_names = names
        self.native_images = native_i if self.keep_native else None
        self.native_labels = native_l if self.keep_native else None

    def __len__(self) -> int:
        return self.images.shape[0]

    @property
    def has_ignore_class(self) -> bool:
        return bool((self.labels == 4).any())


@dataclass
class AcdcVolumeDataset:
    """Validation volumes of a fold (native resolution, dense labels).

    Parity: dataset_semi.py:50-57, 109-111, 120-123.
    """

    base_dir: str | None = None
    fold: str = "fold1"
    limit: int | None = None
    volumes_dirname: str = "ACDC_training_volumes"
    custom_patients: list | None = None  # overrides the fold's test ids

    cases: list[str] = field(init=False, repr=False)
    volumes: list[dict] = field(init=False, repr=False)

    def __post_init__(self):
        base = self.base_dir or default_acdc_root()
        vol_dir = os.path.join(base, self.volumes_dirname)
        if self.custom_patients is not None:
            test_ids = list(self.custom_patients)
        else:
            _, test_ids = resolve_fold_ids(self.fold)
        wanted = set(test_ids)
        names = sorted(
            f for f in os.listdir(vol_dir) if f.split("_")[0] in wanted
        )
        if self.limit is not None:
            names = names[: self.limit]
        self.cases = names
        self.volumes = []
        for name in names:
            with h5py.File(os.path.join(vol_dir, name), "r") as f:
                self.volumes.append(
                    {
                        "case": name.replace(".h5", ""),
                        "image": f["image"][:].astype(np.float32),
                        "label": f["label"][:].astype(np.int32),
                    }
                )

    def __len__(self) -> int:
        return len(self.volumes)

    def __iter__(self):
        return iter(self.volumes)
