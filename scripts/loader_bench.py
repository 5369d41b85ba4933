#!/usr/bin/env python
"""Host input-pipeline benchmark: thread vs process workers.

Measures loader-only throughput (no TPU) on JPEG-decode-shaped work: each
sample is a real in-memory JPEG decoded with PIL + the full cv2 train
augmentation — the workload a production TPU-VM's input pipeline runs per
image. Prints samples/sec per (worker_type, num_workers).

On this 1-core sandbox both modes are capped by the single core (expect ~1x);
on a real TPU-VM (~100 cores) process mode scales with workers while the
thread pool serializes on the GIL through PIL decode. Run there with:

    python scripts/loader_bench.py --workers 1 2 4 8 16
"""

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from segtpu.data.base import BaseDataset, DataLoader


class JpegDataset(BaseDataset):
    """In-memory JPEGs decoded per fetch — isolates decode+augment cost."""

    num_classes = 19
    palette = []

    def __init__(self, n=64, hw=768, **kw):
        self._n = n
        rng = np.random.default_rng(0)
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (hw, hw, 3), dtype=np.uint8)
                        .astype("uint8")).save(buf, format="JPEG", quality=90)
        self._jpeg = buf.getvalue()
        self._label = rng.integers(0, 19, (hw, hw)).astype(np.uint8)
        super().__init__(root="", split="train", mean=[0.5] * 3, std=[0.5] * 3,
                         **kw)

    def _set_files(self):
        self.files = list(range(self._n))

    def _load_data(self, index):
        image = np.asarray(Image.open(io.BytesIO(self._jpeg)).convert("RGB"),
                           np.float32)
        return image, self._label.copy(), str(index)


def bench(worker_type: str, num_workers: int, n: int, hw: int,
          crop: int) -> float:
    ds = JpegDataset(n=n, hw=hw, augment=True, base_size=hw, crop_size=crop,
                     scale=True, flip=True, rotate=True, blur=True)
    loader = DataLoader(ds, batch_size=8, shuffle=False,
                        num_workers=num_workers, worker_type=worker_type)
    try:
        # warmup batch (forks the pool / spins the threads)
        next(iter(loader))
        t0 = time.perf_counter()
        seen = 0
        for images, _ in loader:
            seen += len(images)
        dt = time.perf_counter() - t0
        return seen / dt
    finally:
        loader.close()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--hw", type=int, default=768)
    p.add_argument("--crop", type=int, default=512)
    args = p.parse_args()

    print(f"{'mode':8s} {'workers':>7s} {'img/s':>8s}")
    for mode in ("thread", "process"):
        for w in args.workers:
            rate = bench(mode, w, args.samples, args.hw, args.crop)
            print(f"{mode:8s} {w:7d} {rate:8.1f}")


if __name__ == "__main__":
    main()
