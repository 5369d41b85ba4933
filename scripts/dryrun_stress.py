"""Contention stress test for ``dryrun_multichip`` (VERDICT-r3 item 1).

MULTICHIP_r03 failed with a SIGABRT: XLA:CPU's in-process collective
rendezvous has a hard 40s termination timeout, and on this 1-core host the
8-virtual-device spatial halo-exchange permute sat ~2s under it — any
driver-environment noise killed the run. The fix (``__graft_entry__.py``):
per-pass subprocess isolation, 3 attempts per pass, and the rendezvous
timeouts raised via ``--xla_cpu_collective_call_*_timeout_seconds``.

This script proves the fix under WORSE-than-driver conditions: it pins a
deliberate busy-loop CPU burner to the host, then runs ``dryrun_multichip(8)``
three times consecutively. All three must succeed.

Usage:  python scripts/dryrun_stress.py [n_devices] [n_rounds]
"""

from __future__ import annotations

import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _burner(stop_flag) -> None:
    """Busy-loop: steal as much of the single core as the scheduler allows."""
    x = 1.0
    while not stop_flag.is_set():
        for _ in range(10000):
            x = x * 1.0000001 + 1e-9
    # keep `x` alive so the loop isn't optimized away
    assert x != 0.0


def main() -> int:
    n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import __graft_entry__ as graft

    stop = multiprocessing.Event()
    burner = multiprocessing.Process(target=_burner, args=(stop,), daemon=True)
    burner.start()
    print(f"[stress] burner pid={burner.pid} running; "
          f"{n_rounds} consecutive dryrun_multichip({n_devices}) rounds",
          flush=True)
    try:
        for i in range(n_rounds):
            t0 = time.monotonic()
            graft.dryrun_multichip(n_devices)
            dt = time.monotonic() - t0
            print(f"[stress] round {i + 1}/{n_rounds} OK in {dt:.1f}s",
                  flush=True)
    finally:
        stop.set()
        burner.join(timeout=10)
        if burner.is_alive():
            burner.terminate()
    print(f"[stress] ALL {n_rounds} ROUNDS GREEN under CPU contention",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
