"""COCO-Stuff, 182 classes: 10k (.mat labels, optional 513x513 warp) and
164k (grayscale PNG labels) partitions (reference dataloaders/coco.py).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image

from segtpu import palette
from segtpu.data import manifest as mf

MEAN = [0.43931922, 0.41310471, 0.37480941]
STD = [0.24272706, 0.23649098, 0.23429529]

_SPLITS_10K = {"train", "test", "all"}
_SPLITS_164K = {"train2017", "val2017"}


def _mat_label(path: str) -> np.ndarray:
    """10k ground truth ships as MATLAB ``S`` matrices: 0 = unlabeled, so
    shift to 0-based ids with unlabeled -> 255."""
    import scipy.io as sio

    label = np.asarray(sio.loadmat(path)["S"], np.int32) - 1
    return np.where(label < 0, 255, label)


def _warp_513(image: np.ndarray, label: np.ndarray):
    """10k's fixed-size warp (reference dataloaders/coco.py:33-37)."""
    image = cv2.resize(image, (513, 513), interpolation=cv2.INTER_LINEAR)
    label = np.asarray(
        Image.fromarray(label.astype(np.uint8)).resize(
            (513, 513), resample=Image.NEAREST), dtype=np.int32)
    return image, label


def _gray_png(path: str) -> np.ndarray:
    return np.asarray(cv2.imread(path, cv2.IMREAD_GRAYSCALE), np.int32)


def _records_10k(root: str, split: str):
    ids = mf.read_list(os.path.join(root, "imageLists", f"{split}.txt"))
    return mf.id_records(ids,
                         image_tpl=os.path.join(root, "images", "{id}.jpg"),
                         label_tpl=os.path.join(root, "annotations", "{id}.mat"))


def _records_164k(root: str, split: str):
    return mf.glob_records(
        os.path.join(root, "images", split, "*.jpg"),
        label_tpl=os.path.join(root, "annotations", split, "{id}.png"))


class COCO(mf.ManifestLoader):
    @staticmethod
    def manifest(split: str, partition: str = "CocoStuff164k",
                 warp_image: bool = True) -> mf.Manifest:
        common = dict(num_classes=182, mean=MEAN, std=STD,
                      palette=palette.COCO_palette)
        if partition == "CocoStuff10k":
            if split not in _SPLITS_10K:
                raise mf.bad_split(split, "CocoStuff10k", _SPLITS_10K)
            return mf.Manifest(records=_records_10k, read_label=_mat_label,
                               post=_warp_513 if warp_image else None,
                               **common)
        if partition == "CocoStuff164k":
            if split not in _SPLITS_164K:
                raise mf.bad_split(split, "CocoStuff164k", _SPLITS_164K)
            return mf.Manifest(records=_records_164k, read_label=_gray_png,
                               **common)
        raise ValueError(f"unknown COCO partition {partition!r} "
                         f"(CocoStuff10k or CocoStuff164k)")
