"""Executing 2-process pod test (round-3 verdict, weak item 5).

Launches two REAL host processes (``tests/pod_worker.py``) that
``jax.distributed.initialize`` against a localhost coordinator with 2
virtual CPU devices each, exercising end-to-end:

* ``core.mesh.shard_batch``'s ``process_count() > 1`` branch —
  ``make_array_from_process_local_data`` assembling per-host batches into
  one global jax.Array, verified value- and order-exactly inside the
  workers via a cross-process weighted reduction;
* ``data.base.DataLoader._resolve_shards`` auto-wiring num_shards /
  shard_index from the distributed runtime, with the parent asserting the
  per-host epoch slices are DISJOINT and (for the padded val path)
  COMPLETE — the pod input-sharding contract (core/mesh.py docstring).

Single-process simulations of the same index math live in test_data.py;
this is the branch actually running. Kept tiny (4x4 images, 23 samples):
two processes share one CPU core here, and the conftest-raised XLA:CPU
rendezvous timeouts keep transient stalls from aborting the run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "pod_worker.py")
NPROC = 2


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_shard_batch_and_loader(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own (2 devices/process)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(NPROC), str(port),
             str(tmp_path)],
            env=env, cwd=_REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"pod worker {pid} rc={p.returncode}\n--- output ---\n{out[-4000:]}")

    hosts = []
    for pid in range(NPROC):
        with open(tmp_path / f"host{pid}.json") as f:
            hosts.append(json.load(f))

    # lockstep: every host ran the same batch count
    assert hosts[0]["n_train_batches"] == hosts[1]["n_train_batches"]
    assert hosts[0]["n_val_batches"] == hosts[1]["n_val_batches"]

    n, bs = 23, 3
    t0, t1 = set(hosts[0]["train_ids"]), set(hosts[1]["train_ids"])
    v0, v1 = set(hosts[0]["val_ids"]), set(hosts[1]["val_ids"])

    # train (drop_last lockstep): disjoint, equal-size floor slices
    assert not (t0 & t1), sorted(t0 & t1)
    per_host = (n // NPROC) // bs * bs
    assert len(hosts[0]["train_ids"]) == len(hosts[1]["train_ids"]) == per_host
    assert (t0 | t1) <= set(range(n))

    # val (padded): disjoint AND complete — every sample visited exactly once
    assert not (v0 & v1), sorted(v0 & v1)
    assert sorted(v0 | v1) == list(range(n))
    assert (len(hosts[0]["val_ids"]) + len(hosts[1]["val_ids"])) == n
    # no duplicates within a host either
    assert len(hosts[0]["val_ids"]) == len(v0)
    assert len(hosts[1]["val_ids"]) == len(v1)
    np.testing.assert_array_equal(
        np.sort(np.concatenate([hosts[0]["val_ids"], hosts[1]["val_ids"]])),
        np.arange(n))
