"""Base dataset + loader: host-side numpy/cv2 pipeline feeding the mesh.

Faithful to the reference augmentation semantics (reference
base/base_dataset.py:40-120): random long-side scale 0.5-2x of base_size
(cv2 INTER_LINEAR / INTER_NEAREST), +/-10 deg rotation via warpAffine,
zero-pad to crop + random crop, h-flip, Gaussian blur sigma in [0,1.5);
val = scale-shorter-side-to-crop + center crop. Normalization is
torchvision ToTensor+Normalize ((x/255 - mean)/std) — but output stays HWC
float32 (NHWC batches are the TPU layout).

Loader design (replaces torch DataLoader + the CUDA-stream DataPrefetcher,
reference base/base_dataloader.py): a worker pool decodes/augments samples,
batches are assembled into fixed static shapes (crop_size) so XLA compiles
once, and the device prefetcher double-buffers ``device_put`` onto the mesh
so H2D rides behind the previous step's compute — the TPU equivalent of the
reference's side-stream prefetch.

Workers come in two flavors (``worker_type``): ``"thread"`` (default — right
for this 1-core sandbox, where cv2 releases the GIL inside its C kernels) and
``"process"`` — fork-based worker processes for production TPU-VMs (~100
cores), where PIL/JPEG decode and pure-python decode paths would serialize on
one GIL (the reference gets this from torch DataLoader's worker processes,
base/base_dataloader.py:7-22). Fork inheritance (not pickling) carries the
dataset into the workers, so manifest closures need no special support;
deterministic per-(seed, epoch, index) RNG makes both flavors produce
bit-identical batches.
"""

from __future__ import annotations

import random
import threading
from concurrent.futures import ThreadPoolExecutor
from queue import Queue
from typing import Iterator, List, Optional, Sequence, Tuple

import cv2
import numpy as np

cv2.setNumThreads(0)

# Datasets visible to forked worker processes. Registered at DataLoader
# construction (always before that loader's pool forks), looked up by token
# inside the child — fork inheritance instead of pickling.
_FORK_DATASETS: dict = {}


def _sample_rng(seed: int, epoch: int, idx: int) -> random.Random:
    """Deterministic per-sample RNG: int-tuple hash is stable across
    processes (PYTHONHASHSEED only salts strings). Keyed on the SAMPLE
    index only (unique within an epoch), not its batch position, so
    augmentation is invariant to batch composition — thread/process
    workers and any per-host pod sharding all see identical samples."""
    return random.Random(hash((seed, epoch, idx)))


def _process_fetch(args):
    token, idx, seed, epoch = args
    dataset = _FORK_DATASETS[token]
    return dataset.get(int(idx), rng=_sample_rng(seed, epoch, int(idx)))


class BaseDataset:
    """Abstract dataset. Subclasses set ``num_classes``/``palette`` before
    calling super().__init__ and implement ``_set_files`` and
    ``_load_data(index) -> (image HWC float32 [0,255], label HW int32, id)``.
    """

    def __init__(self, root, split, mean, std, base_size=None, augment=True,
                 val=False, crop_size=321, scale=True, flip=True, rotate=False,
                 blur=False, return_id=False, device_normalize=False):
        self.root = root
        self.split = split
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.augment = augment
        self.crop_size = crop_size
        self.base_size = base_size
        self.scale = scale
        self.flip = flip
        self.rotate = rotate
        self.blur = blur
        self.val = val
        self.return_id = return_id
        self.device_normalize = device_normalize
        self.files: List = []
        self._set_files()

    # -- subclass hooks ------------------------------------------------
    def _set_files(self):
        raise NotImplementedError

    def _load_data(self, index: int):
        raise NotImplementedError

    # -- augmentation (host, numpy/cv2 — exact reference semantics) ----
    def _val_augmentation(self, image, label):
        if self.crop_size:
            h, w = label.shape
            if h < w:
                h, w = (self.crop_size, int(self.crop_size * w / h))
            else:
                h, w = (int(self.crop_size * h / w), self.crop_size)
            image = cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)
            # PIL NEAREST, exactly as the reference (base_dataset.py:50) —
            # cv2's nearest rounds differently and would shift val mIoU.
            from PIL import Image as PILImage

            label = np.asarray(
                PILImage.fromarray(label.astype(np.int32)).resize(
                    (w, h), resample=PILImage.NEAREST), dtype=np.int32)
            h, w = label.shape
            start_h = (h - self.crop_size) // 2
            start_w = (w - self.crop_size) // 2
            image = image[start_h:start_h + self.crop_size,
                          start_w:start_w + self.crop_size]
            label = label[start_h:start_h + self.crop_size,
                          start_w:start_w + self.crop_size]
        return image, label

    def _train_augmentation(self, image, label, rng: random.Random):
        h, w, _ = image.shape
        if self.base_size:
            if self.scale:
                longside = rng.randint(int(self.base_size * 0.5),
                                       int(self.base_size * 2.0))
            else:
                longside = self.base_size
            if h > w:
                h, w = (longside, int(1.0 * longside * w / h + 0.5))
            else:
                h, w = (int(1.0 * longside * h / w + 0.5), longside)
            image = cv2.resize(image, (w, h), interpolation=cv2.INTER_LINEAR)
            label = cv2.resize(label.astype(np.float32), (w, h),
                               interpolation=cv2.INTER_NEAREST).astype(np.int32)

        h, w, _ = image.shape
        if self.rotate:
            angle = rng.randint(-10, 10)
            center = (w / 2, h / 2)
            rot = cv2.getRotationMatrix2D(center, angle, 1.0)
            image = cv2.warpAffine(image, rot, (w, h), flags=cv2.INTER_LINEAR)
            label = cv2.warpAffine(label.astype(np.float32), rot, (w, h),
                                   flags=cv2.INTER_NEAREST).astype(np.int32)

        if self.crop_size:
            pad_h = max(self.crop_size - h, 0)
            pad_w = max(self.crop_size - w, 0)
            if pad_h > 0 or pad_w > 0:
                image = cv2.copyMakeBorder(image, 0, pad_h, 0, pad_w,
                                           cv2.BORDER_CONSTANT, value=0)
                label = cv2.copyMakeBorder(label, 0, pad_h, 0, pad_w,
                                           cv2.BORDER_CONSTANT, value=0)
            h, w = label.shape
            start_h = rng.randint(0, h - self.crop_size)
            start_w = rng.randint(0, w - self.crop_size)
            image = image[start_h:start_h + self.crop_size,
                          start_w:start_w + self.crop_size]
            label = label[start_h:start_h + self.crop_size,
                          start_w:start_w + self.crop_size]

        if self.flip and rng.random() > 0.5:
            image = np.fliplr(image).copy()
            label = np.fliplr(label).copy()

        if self.blur:
            sigma = rng.random()
            ksize = int(3.3 * sigma)
            ksize = ksize + 1 if ksize % 2 == 0 else ksize
            image = cv2.GaussianBlur(image, (ksize, ksize), sigmaX=sigma,
                                     sigmaY=sigma,
                                     borderType=cv2.BORDER_REFLECT_101)
        return image, label

    def normalize(self, image: np.ndarray) -> np.ndarray:
        return (image.astype(np.float32) / 255.0 - self.mean) / self.std

    def __len__(self):
        return len(self.files)

    def get(self, index: int, rng: Optional[random.Random] = None):
        """(image HWC float32 normalized — or HWC uint8 raw pixels when
        ``device_normalize`` is set — label HW int32[, id])."""
        image, label, image_id = self._load_data(index)
        label = np.asarray(label, np.int32)
        if self.val:
            image, label = self._val_augmentation(image, label)
        elif self.augment:
            image, label = self._train_augmentation(image, label,
                                                    rng or random)
        # The reference quantizes the augmented image to uint8 before
        # ToTensor (base/base_dataset.py:133: Image.fromarray(np.uint8(x)))
        # — reproduce that exactly. With device_normalize the uint8 pixels
        # ship to the device as-is (4x less H2D) and the jitted step applies
        # (x/255 - mean)/std; see segtpu/core/steps.py::_prep_images.
        image = np.asarray(image, np.float32).astype(np.uint8)
        if not self.device_normalize:
            image = self.normalize(image)
        if self.return_id:
            return image, label, image_id
        return image, label

    def __getitem__(self, index):
        return self.get(index)

    def __repr__(self):
        return (f"Dataset: {type(self).__name__}\n    # data: {len(self)}\n"
                f"    Split: {self.split}\n    Root: {self.root}")


class DataLoader:
    """Threaded batching loader with fixed shapes and optional seeded
    train/val split (reference base/base_dataloader.py:24-47: np.seed(0)
    shuffle, first ``val_split`` fraction becomes val)."""

    def __init__(self, dataset: BaseDataset, batch_size: int, shuffle: bool,
                 num_workers: int = 4, val_split: float = 0.0,
                 drop_last: Optional[bool] = None, seed: int = 0,
                 indices: Optional[Sequence[int]] = None,
                 worker_type: str = "thread",
                 num_shards: Optional[int] = None,
                 shard_index: Optional[int] = None):
        assert worker_type in ("thread", "process"), worker_type
        # Multi-host (pod) input sharding: each host process loads a
        # disjoint slice of every epoch's shuffled order (all hosts shuffle
        # with the same seed+epoch, then take shard_index::num_shards);
        # core.mesh.shard_batch assembles the per-host batches into one
        # global jax.Array. Defaults auto-wire from the jax distributed
        # runtime (LAZILY, at first len()/iter(), and without initializing
        # any jax backend — construction stays jax-free for loader-only
        # tooling) so a config runs unchanged from 1 host to a pod —
        # batch_size is the PER-HOST batch. Lockstep note: every host runs
        # the same floor(n/num_shards)//bs batch count, so up to
        # num_shards-1 trailing samples of a non-divisible epoch (val
        # included) are not visited by any host.
        if num_shards is None and shard_index is not None:
            raise ValueError("shard_index requires num_shards")
        self._num_shards_arg = num_shards
        self._shard_index_arg = shard_index
        self._shards_resolved = num_shards is not None
        self.num_shards = num_shards if num_shards is not None else 1
        self.shard_index = shard_index if shard_index is not None else 0
        assert 0 <= self.shard_index < self.num_shards, (shard_index,
                                                         num_shards)
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self._epoch = 0
        self.val_split = val_split
        self.worker_type = worker_type
        self._pool = None
        self._token = id(self)
        if worker_type == "process":
            _FORK_DATASETS[self._token] = dataset
            # Fork the pool EAGERLY, at construction: in the Trainer path
            # loaders are built before any jax device use, so the children
            # fork from a process with no live XLA/libtpu threads. A lazy
            # fork at first __iter__ would happen after backend init, where
            # forked children can inherit locked runtime mutexes (JAX
            # explicitly warns against os.fork after backend init). See
            # MIGRATION.md: build process-worker loaders before first
            # device use.
            self._ensure_process_pool()

        if indices is not None:
            self.indices = np.asarray(indices)
            self.shuffle = shuffle
        elif val_split:
            n = len(dataset)
            split_idx = int(n * val_split)
            rs = np.random.RandomState(0)
            idx = np.arange(n)
            rs.shuffle(idx)
            self._val_indices = idx[:split_idx]
            self.indices = idx[split_idx:]
            self.shuffle = True  # subset is sampled randomly each epoch
        else:
            self._val_indices = None
            self.indices = np.arange(len(dataset))
            self.shuffle = shuffle
        # static shapes: train drops the ragged tail; val pads instead (the
        # eval loop masks the padding via ignore_index)
        self.drop_last = (not dataset.val) if drop_last is None else drop_last

    def get_val_loader(self) -> Optional["DataLoader"]:
        if getattr(self, "_val_indices", None) is None or self.val_split == 0:
            return None
        # the underlying dataset is the TRAIN dataset (val=False), so
        # drop_last must be forced off here or small val splits would yield
        # zero batches; the ragged tail is padded (masked via ignore labels)
        return DataLoader(self.dataset, self.batch_size, False,
                          self.num_workers, indices=self._val_indices,
                          drop_last=False, worker_type=self.worker_type,
                          seed=self.seed,
                          num_shards=self._num_shards_arg,
                          shard_index=self._shard_index_arg)

    def _resolve_shards(self):
        """Pick up pod sharding from the jax distributed runtime, if (and
        only if) the application initialized it — checking never initializes
        a backend, so jax-free loader tooling stays jax-free."""
        if self._shards_resolved:
            return
        self._shards_resolved = True
        import sys

        jax = sys.modules.get("jax")
        if jax is None:
            return
        try:
            from jax._src import distributed

            if distributed.global_state.client is None:
                return  # single-host: keep 1/0 defaults
        except Exception:
            return
        self.num_shards = jax.process_count()
        self.shard_index = jax.process_index()
        if self.num_shards > 1 and not self.dataset.crop_size:
            # Pod lockstep assembles every per-host batch into one global
            # jax.Array (core.mesh.shard_batch), so ALL hosts must yield the
            # same static shape every step — including the all-sentinel pad
            # batches of a tiny tail shard. Variable-size images (crop_size
            # None) cannot satisfy that; fail loudly instead of hanging the
            # pod at the first mismatched collective.
            raise ValueError(
                "multi-host (pod) input sharding requires a static "
                "crop_size on the dataset (got crop_size="
                f"{self.dataset.crop_size!r}): variable per-image shapes "
                "cannot keep hosts in lockstep")

    def __len__(self):
        self._resolve_shards()
        if self.drop_last:
            # train: every host runs the same floor batch count (lockstep);
            # up to num_shards-1 trailing samples of the epoch order are
            # dropped — same spirit as single-host drop_last.
            return (len(self.indices) // self.num_shards) // self.batch_size
        # val: the global order is padded up to a multiple of num_shards
        # (ignore-labeled pad slots, yielded last) so EVERY sample is visited
        # by exactly one host and pod metrics match single-host exactly.
        n = -(-len(self.indices) // self.num_shards)
        return -(-n // self.batch_size)

    def _ensure_process_pool(self):
        if self._pool is None:
            import multiprocessing as mp

            # (re-)register before forking: close() pops the token, and a
            # later iteration must be able to rebuild the pool.
            _FORK_DATASETS[self._token] = self.dataset
            # fork: children inherit _FORK_DATASETS; nothing is pickled.
            self._pool = mp.get_context("fork").Pool(self.num_workers)
        return self._pool

    def close(self):
        """Shut down worker processes (no-op for thread mode)."""
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None
        _FORK_DATASETS.pop(self._token, None)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, n: int):
        """Position the deterministic shuffle stream so the NEXT ``__iter__``
        reproduces training epoch ``n+1``'s order — the mid-epoch resume
        hook (a fresh process starts at 0)."""
        self._epoch = n

    def skip_batches(self, k: int):
        """The next ``__iter__`` skips its first ``k`` batches (no fetch
        cost) and yields the remainder of that epoch's deterministic order —
        mid-epoch resume continues exactly where the interrupted run
        stopped."""
        self._skip_next = int(k)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        self._resolve_shards()
        order = self.indices.copy()
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        if self.num_shards > 1:
            if not self.drop_last:
                # pad the GLOBAL order to a multiple of num_shards with
                # sentinel (-1) slots so every host yields the same batch
                # count AND every real sample is visited exactly once; the
                # sentinels become ignore-labeled padding below (exactly
                # like the single-host ragged tail).
                pad = (-len(order)) % self.num_shards
                if pad:
                    order = np.concatenate(
                        [order, np.full(pad, -1, order.dtype)])
            order = order[self.shard_index::self.num_shards]
        self._epoch += 1
        bs = self.batch_size
        epoch, seed = self._epoch, self.seed
        skip = getattr(self, "_skip_next", 0)
        self._skip_next = 0

        def fetch(idx):
            rng = _sample_rng(seed, epoch, int(idx))
            return self.dataset.get(int(idx), rng=rng)

        n_batches = len(self)

        def pad_only_batch():
            # all-sentinel chunk (tiny shard + tiny batch): emit a fully
            # ignore-labeled batch so lockstep holds; metrics/val-loss mask
            # it out entirely (zero valid pixels).
            ds = self.dataset
            crop = ds.crop_size or 1
            c = len(ds.mean)
            img_dtype = np.uint8 if ds.device_normalize else np.float32
            return (np.zeros((bs, crop, crop, c), img_dtype),
                    np.full((bs, crop, crop), -100, np.int32))

        def batches(mapper):
            for b in range(skip, n_batches):
                chunk = order[b * bs:(b + 1) * bs]
                chunk = chunk[chunk >= 0]  # drop pod-padding sentinels
                if len(chunk) == 0:
                    yield pad_only_batch()
                    continue
                samples = list(mapper(chunk))
                images = np.stack([s[0] for s in samples])
                labels = np.stack([s[1] for s in samples])
                if len(samples) < bs:  # pad the ragged val tail
                    pad = bs - len(samples)
                    images = np.concatenate(
                        [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
                    labels = np.concatenate(
                        [labels, np.full((pad,) + labels.shape[1:], -100,
                                         labels.dtype)])
                yield images, labels

        if self.worker_type == "process":
            pool = self._ensure_process_pool()
            yield from batches(lambda chunk: pool.map(
                _process_fetch,
                [(self._token, int(idx), seed, epoch) for idx in chunk]))
        else:
            with ThreadPoolExecutor(self.num_workers) as pool:
                yield from batches(lambda chunk: pool.map(fetch, chunk))


class DevicePrefetcher:
    """Double-buffered host->device pipeline: the next batch's ``device_put``
    (sharded over the mesh) overlaps the current step. TPU analog of the
    reference's CUDA-stream DataPrefetcher (base/base_dataloader.py:49-85)."""

    def __init__(self, loader: DataLoader, mesh=None, depth: int = 2,
                 spatial: bool = False):
        self.loader = loader
        self.mesh = mesh
        self.depth = depth
        self.spatial = spatial

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        from segtpu.core.mesh import shard_batch
        import jax

        q: Queue = Queue(maxsize=self.depth)
        err: List[BaseException] = []

        def produce():
            try:
                for batch in self.loader:
                    if self.mesh is not None:
                        batch = shard_batch(self.mesh, batch,
                                            spatial=self.spatial)
                    else:
                        batch = jax.tree_util.tree_map(jax.device_put, batch)
                    q.put(batch)
            except BaseException as e:  # surface worker errors to the consumer
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                if err:
                    raise err[0]
                return
            yield item
