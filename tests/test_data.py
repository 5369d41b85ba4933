"""Data pipeline: augmentation semantics, loader mechanics, prefetcher."""

import numpy as np
import pytest

from segtpu.data import Synthetic, DATASETS
from segtpu.data.base import DataLoader, DevicePrefetcher
from segtpu.data.synthetic import SyntheticDataset


def _make_ds(**kw):
    base = dict(num_classes=6, size=16, image_hw=80, root="", split="train",
                mean=[0.5] * 3, std=[0.25] * 3, augment=True, crop_size=64,
                base_size=72, scale=True, flip=True, rotate=True, blur=True,
                val=False)
    base.update(kw)
    return SyntheticDataset(**base)


def test_train_augmentation_static_shapes():
    ds = _make_ds()
    import random
    for i in range(8):
        img, lab = ds.get(i, rng=random.Random(i))
        assert img.shape == (64, 64, 3)
        assert lab.shape == (64, 64)
        assert img.dtype == np.float32 and lab.dtype == np.int32


def test_val_augmentation_center_crop():
    ds = _make_ds(val=True, augment=False, crop_size=48)
    img, lab = ds.get(0)
    assert img.shape == (48, 48, 3) and lab.shape == (48, 48)


def test_normalization():
    """get() quantizes the augmented image to uint8 before normalizing —
    exactly the reference's Image.fromarray(np.uint8(x)) + ToTensor
    (base/base_dataset.py:133)."""
    ds = _make_ds(augment=False, crop_size=None)
    img, _ = ds.get(0)
    raw, _, _ = ds._load_data(0)
    q = np.asarray(raw, np.float32).astype(np.uint8).astype(np.float32)
    np.testing.assert_allclose(
        img, (q / 255.0 - 0.5) / 0.25, rtol=1e-5, atol=1e-5)


def test_device_normalize_transport_equivalence():
    """uint8 transport + device-side normalize produces bit-identical
    normalized tensors to the host path."""
    import jax.numpy as jnp
    from segtpu.core.steps import _prep_images

    host_ds = _make_ds(augment=False, crop_size=None)
    dev_ds = _make_ds(augment=False, crop_size=None, device_normalize=True)
    host_img, _ = host_ds.get(0)
    dev_img, _ = dev_ds.get(0)
    assert dev_img.dtype == np.uint8
    on_device = _prep_images(jnp.asarray(dev_img),
                             (host_ds.mean, host_ds.std), jnp.float32)
    np.testing.assert_array_equal(np.asarray(on_device), host_img)


def test_loader_batches_and_drop_last():
    loader = Synthetic(batch_size=5, size=16, num_workers=2)
    assert len(loader) == 3  # drop_last for train: 16 // 5
    batches = list(loader)
    assert len(batches) == 3
    for imgs, labs in batches:
        assert imgs.shape == (5, 64, 64, 3)
        assert labs.shape == (5, 64, 64)


def test_loader_val_pads_ragged_tail():
    loader = Synthetic(batch_size=5, size=16, num_workers=2, val=True,
                       augment=False, shuffle=False)
    batches = list(loader)
    assert len(batches) == 4
    imgs, labs = batches[-1]
    assert imgs.shape[0] == 5
    # pad labels are -100 => excluded by metrics/losses (outside [0, C))
    assert (labs[-4:] == -100).all()


def test_val_split_is_seeded_and_disjoint():
    l1 = Synthetic(batch_size=4, size=32, val_split=0.25)
    l2 = Synthetic(batch_size=4, size=32, val_split=0.25)
    v1, v2 = l1.get_val_loader(), l2.get_val_loader()
    np.testing.assert_array_equal(v1.indices, v2.indices)
    assert len(v1.indices) == 8
    assert set(v1.indices).isdisjoint(set(l1.indices))
    # parity with the reference's np.random.seed(0) shuffle
    rs = np.random.RandomState(0)
    idx = np.arange(32)
    rs.shuffle(idx)
    np.testing.assert_array_equal(v1.indices, idx[:8])


def test_shuffle_determinism_and_epoch_variation():
    l1 = Synthetic(batch_size=4, size=16, shuffle=True)
    l2 = Synthetic(batch_size=4, size=16, shuffle=True)
    b1 = [lab.copy() for _, lab in l1]
    b2 = [lab.copy() for _, lab in l2]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)  # same seed, same epoch
    b1e2 = [lab.copy() for _, lab in l1]
    assert any(not np.array_equal(a, b) for a, b in zip(b1, b1e2))


def test_device_prefetcher():
    import jax

    from segtpu.core.mesh import make_mesh

    loader = Synthetic(batch_size=8, size=16, num_workers=2)
    mesh = make_mesh()
    count = 0
    for imgs, labs in DevicePrefetcher(loader, mesh):
        assert isinstance(imgs, jax.Array)
        assert imgs.shape == (8, 64, 64, 3)
        count += 1
    assert count == len(loader)


def test_registry_names_match_reference():
    assert set(DATASETS) == {"VOC", "COCO", "ADE20K", "CityScapes",
                             "DeepScene", "Synthetic"}


def test_val_split_loader_keeps_ragged_tail():
    """The split val loader must not inherit train drop_last (7 samples,
    batch 8 would otherwise yield zero batches)."""
    loader = Synthetic(batch_size=8, size=70, val_split=0.1)
    val = loader.get_val_loader()
    assert len(val.indices) == 7
    batches = list(val)
    assert len(batches) == 1
    imgs, labels = batches[0]
    assert imgs.shape[0] == 8  # padded to the static batch
    assert (labels[7:] == -100).all()


def test_process_workers_match_thread_workers():
    """Fork-based worker processes (production TPU-VM path, reference
    base_dataloader.py:7-22) produce bit-identical batches to the thread
    pool: the per-(seed, epoch, index) RNG is process-stable."""
    from segtpu.data import Synthetic

    def make(worker_type):
        return Synthetic(batch_size=4, size=8, num_classes=5, image_hw=48,
                         crop_size=32, shuffle=True, augment=True,
                         num_workers=2, worker_type=worker_type)

    thread_loader = make("thread")
    process_loader = make("process")
    try:
        for _ in range(2):  # two epochs: shuffle + rng advance identically
            for (ti, tl), (pi, pl) in zip(thread_loader, process_loader):
                np.testing.assert_array_equal(ti, pi)
                np.testing.assert_array_equal(tl, pl)
    finally:
        process_loader.close()


def test_loader_skip_batches_replays_same_order():
    """Mid-epoch resume: set_epoch + skip_batches reproduces the exact tail
    of an uninterrupted epoch (deterministic shuffle + per-sample RNG)."""
    mk = lambda: Synthetic(batch_size=4, size=16, num_classes=6, image_hw=72,
                           crop_size=64, shuffle=True)
    full = [(img.copy(), lab.copy()) for img, lab in mk()]
    resumed = mk()
    resumed.set_epoch(0)
    resumed.skip_batches(2)
    tail = list(resumed)
    assert len(tail) == len(full) - 2
    for (fi, fl), (ti, tl) in zip(full[2:], tail):
        np.testing.assert_array_equal(fi, ti)
        np.testing.assert_array_equal(fl, tl)


def _sharded(size, bs, num_shards, shard_index):
    loader = Synthetic(batch_size=bs, size=size, num_classes=5,
                       image_hw=48, crop_size=32, shuffle=True)
    loader.num_shards = num_shards
    loader.shard_index = shard_index
    loader._shards_resolved = True  # manual sharding, skip auto-wiring
    return loader


def test_multihost_loader_shards_are_disjoint_and_cover():
    """Pod input sharding: per-host loaders (same seed) partition each
    epoch's shuffled order deterministically."""
    full = Synthetic(batch_size=4, size=16, num_classes=5, image_hw=48,
                     crop_size=32, shuffle=True)
    s0 = _sharded(16, 2, 2, 0)
    s1 = _sharded(16, 2, 2, 1)
    assert len(s0) == len(s1) == 4  # 16/2 shards / bs 2
    labs0 = [l for _, l in s0]
    labs1 = [l for _, l in s1]
    # disjoint + covering: the union of per-shard label batches equals the
    # full epoch's sample multiset (hash the per-sample label planes)
    def keys(batches):
        return sorted(hash(l[i].tobytes()) for l in batches
                      for i in range(l.shape[0]))
    all_labs = [l for _, l in full]
    assert sorted(keys(labs0) + keys(labs1)) == keys(all_labs)


def test_multihost_loader_lockstep_on_uneven_shards():
    """Non-divisible epochs: every host runs the SAME batch count
    (floor(n/num_shards)//bs — collectives stay in lockstep); the <=
    num_shards-1 unvisited tail samples are a documented trade."""
    s0 = _sharded(17, 4, 2, 0)  # shard 0 holds 9 samples, shard 1 holds 8
    s1 = _sharded(17, 4, 2, 1)
    assert len(s0) == len(s1) == 2  # floor(17/2)=8 -> 2 batches each
    assert len(list(s0)) == len(list(s1)) == 2


def test_loader_rejects_shard_index_without_num_shards():
    from segtpu.data.base import DataLoader

    ds = SyntheticDataset(num_classes=5, size=8, image_hw=48, root="",
                          split="train", mean=[0.5] * 3, std=[0.25] * 3,
                          crop_size=32)
    with pytest.raises(ValueError):
        DataLoader(ds, 2, False, shard_index=1)
