"""End-to-end loader tests against tiny on-disk fixtures for every dataset
family (the reference has zero such tests — its only check downloads
Cityscapes, SURVEY.md §4)."""

import os

import numpy as np
import pytest
from PIL import Image
import scipy.io as sio

from segtpu.data import ADE20K, COCO, CityScapes, DeepScene, VOC
from segtpu import palette


def _img(path, hw=(40, 50)):
    arr = np.random.default_rng(0).integers(0, 255, size=(*hw, 3)).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _mask(path, hw=(40, 50), num_classes=5):
    arr = np.random.default_rng(1).integers(0, num_classes, size=hw).astype(np.uint8)
    Image.fromarray(arr).save(path)
    return arr


def test_voc_loader(tmp_path):
    root = tmp_path / "voc"
    base = root / "VOCdevkit/VOC2012"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClass").mkdir(parents=True)
    (base / "ImageSets/Segmentation").mkdir(parents=True)
    ids = ["2007_000001", "2007_000002"]
    for i in ids:
        _img(base / "JPEGImages" / f"{i}.jpg")
        _mask(base / "SegmentationClass" / f"{i}.png", num_classes=21)
    (base / "ImageSets/Segmentation/train.txt").write_text("\n".join(ids) + "\n")

    loader = VOC(data_dir=str(root), batch_size=2, split="train", crop_size=32,
                 base_size=36, augment=True, scale=True, flip=True,
                 shuffle=False, num_workers=1)
    assert loader.dataset.num_classes == 21
    imgs, labels = next(iter(loader))
    assert imgs.shape == (2, 32, 32, 3) and labels.shape == (2, 32, 32)


def test_vocaug_loader(tmp_path):
    root = tmp_path / "voc"
    base = root / "VOCdevkit/VOC2012"
    (base / "img").mkdir(parents=True)
    (base / "cls").mkdir(parents=True)
    (base / "ImageSets/Segmentation").mkdir(parents=True)
    lines = []
    for i in range(2):
        _img(base / "img" / f"a{i}.jpg")
        _mask(base / "cls" / f"a{i}.png", num_classes=21)
        lines.append(f"/img/a{i}.jpg /cls/a{i}.png")
    (base / "ImageSets/Segmentation/train_aug.txt").write_text("\n".join(lines) + "\n")

    loader = VOC(data_dir=str(root), batch_size=2, split="train_aug",
                 crop_size=32, augment=True, shuffle=False, num_workers=1)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (2, 32, 32, 3)


def test_cityscapes_loader(tmp_path):
    root = tmp_path / "cs"
    img_dir = root / "leftImg8bit_trainvaltest/leftImg8bit/train/cityA"
    lab_dir = root / "gtFine_trainvaltest/gtFine/train/cityA"
    img_dir.mkdir(parents=True)
    lab_dir.mkdir(parents=True)
    for i in range(2):
        _img(img_dir / f"cityA_{i:06d}_leftImg8bit.png")
        # raw label ids 0..33
        arr = np.random.default_rng(i).integers(0, 34, size=(40, 50)).astype(np.uint8)
        Image.fromarray(arr).save(lab_dir / f"cityA_{i:06d}_gtFine_labelIds.png")

    loader = CityScapes(data_dir=str(root), batch_size=2, split="train",
                        crop_size=32, augment=True, shuffle=False, num_workers=1)
    assert loader.dataset.num_classes == 19
    imgs, labels = next(iter(loader))
    # remapped labels: train ids in [0,19) or 255
    u = np.unique(labels)
    assert all((0 <= v < 19) or v == 255 for v in u)


def test_ade20k_loader(tmp_path):
    root = tmp_path / "ade"
    (root / "images/training").mkdir(parents=True)
    (root / "annotations/training").mkdir(parents=True)
    for i in range(2):
        _img(root / "images/training" / f"ADE_train_{i:08d}.jpg")
        arr = np.random.default_rng(i).integers(0, 151, size=(40, 50)).astype(np.uint8)
        Image.fromarray(arr).save(root / "annotations/training" / f"ADE_train_{i:08d}.png")

    loader = ADE20K(data_dir=str(root), batch_size=2, split="training",
                    crop_size=32, augment=True, shuffle=False, num_workers=1)
    assert loader.dataset.num_classes == 150
    imgs, labels = next(iter(loader))
    assert labels.min() >= -1 and labels.max() < 150  # png - 1 shift


def test_coco10k_loader(tmp_path):
    root = tmp_path / "coco"
    (root / "images").mkdir(parents=True)
    (root / "annotations").mkdir(parents=True)
    (root / "imageLists").mkdir(parents=True)
    ids = ["COCO_train2014_000000000001"]
    for i in ids:
        _img(root / "images" / f"{i}.jpg")
        S = np.random.default_rng(0).integers(0, 183, size=(40, 50)).astype(np.int16)
        sio.savemat(root / "annotations" / f"{i}.mat", {"S": S})
    (root / "imageLists/train.txt").write_text("\n".join(ids) + "\n")

    loader = COCO(data_dir=str(root), batch_size=1, split="train",
                  partition="CocoStuff10k", crop_size=32, augment=True,
                  shuffle=False, num_workers=1)
    assert loader.dataset.num_classes == 182
    imgs, labels = next(iter(loader))
    assert imgs.shape == (1, 32, 32, 3)


def test_coco164k_loader(tmp_path):
    root = tmp_path / "coco"
    (root / "images/train2017").mkdir(parents=True)
    (root / "annotations/train2017").mkdir(parents=True)
    for i in range(2):
        _img(root / "images/train2017" / f"{i:012d}.jpg")
        _mask(root / "annotations/train2017" / f"{i:012d}.png", num_classes=182)

    loader = COCO(data_dir=str(root), batch_size=2, split="train2017",
                  partition="CocoStuff164k", crop_size=32, augment=True,
                  shuffle=False, num_workers=1)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (2, 32, 32, 3)


def test_deepscene_loader(tmp_path):
    root = tmp_path / "ds"
    (root / "train/rgb").mkdir(parents=True)
    (root / "train/GT_color").mkdir(parents=True)
    pal = palette.DeepScene_palette
    colors = np.asarray(pal, np.uint8).reshape(-1, 3)
    for i in range(2):
        _img(root / "train/rgb" / f"b{i}.jpg")
        ids = np.random.default_rng(i).integers(0, len(colors), size=(40, 50))
        rgb = colors[ids]
        Image.fromarray(rgb).save(root / "train/GT_color" / f"b{i}.png")

    loader = DeepScene(data_dir=str(root), batch_size=2, split="training",
                       crop_size=32, augment=True, shuffle=False, num_workers=1)
    assert loader.dataset.num_classes == 7
    imgs, labels = next(iter(loader))
    assert labels.max() < 7 and labels.min() >= 0
