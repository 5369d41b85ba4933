"""One host-process of the 2-process pod test (run by test_pod_distributed).

Executes the REAL multi-process path that single-process CI can only
simulate: ``jax.distributed.initialize`` over a localhost coordinator, two
processes with 2 virtual CPU devices each (4 global), then

* ``core.mesh.shard_batch``'s ``process_count() > 1`` branch — the
  ``make_array_from_process_local_data`` assembly (core/mesh.py:109-112),
  verified value-exactly via a position-weighted global reduction (a real
  cross-process collective), and
* ``data.base.DataLoader``'s auto-wired pod sharding (`_resolve_shards`) —
  per-host epoch slices recorded to JSON for the parent to check
  disjointness/completeness (train lockstep drop + padded val).

Usage: pod_worker.py <process_id> <num_processes> <coordinator_port> <outdir>
"""

import json
import os
import sys

PID, NPROC = int(sys.argv[1]), int(sys.argv[2])
PORT, OUTDIR = sys.argv[3], sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    " --xla_cpu_collective_call_terminate_timeout_seconds=900")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{PORT}",
                           num_processes=NPROC, process_id=PID)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from segtpu.core import make_mesh, shard_batch  # noqa: E402
from segtpu.data.base import BaseDataset, DataLoader  # noqa: E402

assert jax.process_count() == NPROC, jax.process_count()
assert jax.process_index() == PID
assert len(jax.devices()) == 2 * NPROC, jax.devices()

# ---------------------------------------------------------------------------
# 1) shard_batch multi-process assembly, value-exact
B, HW = 8, 4
full_img = np.arange(B * HW * HW * 3, dtype=np.float32).reshape(B, HW, HW, 3)
full_lbl = (np.arange(B * HW * HW, dtype=np.int64) % 5).reshape(
    B, HW, HW).astype(np.int32)
local_bs = B // NPROC
sl = slice(PID * local_bs, (PID + 1) * local_bs)

mesh = make_mesh()  # all 4 global devices, pure-DP (data, model=1)
img_g, lbl_g = shard_batch(mesh, (full_img[sl], full_lbl[sl]))
assert img_g.shape == (B, HW, HW, 3), img_g.shape
assert lbl_g.shape == (B, HW, HW), lbl_g.shape

# Position-weighted reduction: proves both the VALUES and the ORDER of the
# assembled global batch (the global batch is concat(host0, host1) in
# process order — mesh data-axis order == global device order == process
# order). This is a real cross-process collective on the CPU backend.
w = jnp.arange(1, B + 1, dtype=jnp.float32)
rep = NamedSharding(mesh, P())


@jax.jit
def weighted(img, lbl):
    return (jnp.sum(img * w[:, None, None, None]),
            jnp.sum(lbl.astype(jnp.float32) * w[:, None, None]))


wi, wl = jax.device_get(jax.jit(weighted, out_shardings=(rep, rep))(
    img_g, lbl_g))
want_wi = float(np.sum(full_img * np.arange(1, B + 1,
                                            dtype=np.float64).reshape(
    B, 1, 1, 1)))
want_wl = float(np.sum(full_lbl * np.arange(1, B + 1,
                                            dtype=np.float64).reshape(
    B, 1, 1)))
np.testing.assert_allclose(float(wi), want_wi, rtol=1e-6)
np.testing.assert_allclose(float(wl), want_wl, rtol=1e-6)


# ---------------------------------------------------------------------------
# 2) DataLoader pod auto-wiring: disjoint, complete per-host slices
class _IdxDataset(BaseDataset):
    """Image pixel value encodes the sample index (survives the uint8
    quantization for index < 256 and the constant-image val resize)."""

    def __init__(self, n, **kw):
        self.num_classes = 5
        self.palette = [0, 0, 0]
        self._n = n
        super().__init__(**kw)

    def _set_files(self):
        self.files = list(range(self._n))

    def _load_data(self, index):
        img = np.full((HW, HW, 3), float(index), np.float32)
        lbl = np.full((HW, HW), index % 5, np.int32)
        return img, lbl, str(index)


def _visited_ids(loader):
    ids = []
    for img, lbl in loader:
        # normalize (mean 0, std 1) maps pixel v -> v/255; pad slots carry
        # label -100 everywhere
        for b in range(img.shape[0]):
            if np.all(lbl[b] == -100):
                continue  # pod/ragged padding slot
            ids.append(int(round(float(img[b, 0, 0, 0]) * 255.0)))
    return ids


N = 23  # deliberately not divisible by 2 hosts * bs 3
common = dict(root="", split="train", mean=[0., 0., 0.], std=[1., 1., 1.],
              augment=False, crop_size=HW)
train_loader = DataLoader(_IdxDataset(N, **common), batch_size=3,
                          shuffle=True, num_workers=1)
val_loader = DataLoader(_IdxDataset(N, **dict(common, val=True)),
                        batch_size=3, shuffle=False, num_workers=1,
                        drop_last=False)

n_train_batches = len(train_loader)  # triggers _resolve_shards
assert train_loader.num_shards == NPROC, train_loader.num_shards
assert train_loader.shard_index == PID
train_ids = _visited_ids(train_loader)
val_ids = _visited_ids(val_loader)

with open(os.path.join(OUTDIR, f"host{PID}.json"), "w") as f:
    json.dump({"train_ids": train_ids, "val_ids": val_ids,
               "n_train_batches": n_train_batches,
               "n_val_batches": len(val_loader)}, f)

print(f"pod_worker {PID}/{NPROC}: OK", flush=True)
