"""Paired transforms (segtpu/utils/transforms.py)."""

import random

import numpy as np

from segtpu.utils import transforms as T


def _pair(h=40, w=60):
    rng = np.random.default_rng(0)
    img = rng.normal(size=(h, w, 3)).astype(np.float32)
    mask = rng.integers(0, 5, size=(h, w)).astype(np.int32)
    return img, mask


def test_compose_crop_flip():
    img, mask = _pair()
    t = T.Compose([T.RandomCrop(32), T.RandomHorizontallyFlip()])
    oi, om = t(img, mask, random.Random(0))
    assert oi.shape == (32, 32, 3) and om.shape == (32, 32)


def test_center_crop():
    img, mask = _pair()
    oi, om = T.CenterCrop(20)(img, mask)
    np.testing.assert_array_equal(om, mask[10:30, 20:40])


def test_scale_long_side():
    img, mask = _pair(40, 60)
    oi, om = T.Scale(30)(img, mask)
    assert om.shape == (20, 30)


def test_random_sized_crop_output_size():
    img, mask = _pair()
    oi, om = T.RandomSizedCrop(24)(img, mask, random.Random(1))
    assert oi.shape == (24, 24, 3) and om.shape == (24, 24)


def test_rotate_preserves_shape_and_labels():
    img, mask = _pair()
    oi, om = T.RandomRotate(10)(img, mask, random.Random(2))
    assert om.shape == mask.shape
    assert set(np.unique(om)).issubset(set(np.unique(mask)) | {0})


def test_sliding_crop_covers_image():
    img, mask = _pair(70, 90)
    tiles_i, tiles_m, slices = T.SlidingCrop(32, 2 / 3., 255)(img, mask)
    assert all(t.shape == (32, 32, 3) for t in tiles_i)
    covered = np.zeros((70, 90), bool)
    for (sy, sx, ch, cw) in slices:
        covered[sy:sy + ch, sx:sx + cw] = True
    assert covered.all()


def test_denormalize_roundtrip():
    img, _ = _pair()
    mean, std = [0.4, 0.5, 0.6], [0.2, 0.25, 0.3]
    norm = (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    back = T.DeNormalize(mean, std)(norm)
    np.testing.assert_allclose(back, img, rtol=1e-5, atol=1e-5)
