"""A/B the prediction-argmax formulations on the real chip.

Isolated timings on the step's (8, 769, 769, 19) prediction tensor, then —
the decisive measurement (round-3 lesson: microbench wins don't survive
fusion) — the full train step with seg_stats_from_logits switched between
variants via SEGTPU_ARGMAX in subprocesses.

Usage: python scripts/argmax_ab.py isolated | step <Model> [kw=v ...]
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import subprocess
import time

import numpy as np


def isolated():
    import jax
    import jax.numpy as jnp
    from segtpu.ops.reductions import fast_argmax, packed_argmax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 769, 769, 19)), jnp.bfloat16)
    variants = {
        "jnp.argmax": lambda a: jnp.argmax(a, -1),
        "fast_argmax": lambda a: fast_argmax(a, -1),
        "packed_argmax": lambda a: packed_argmax(a, -1),
    }
    outs = {}
    for name, fn in variants.items():
        f = jax.jit(lambda a, fn=fn: jnp.sum(fn(a)))
        r = f(x); int(r)  # warm; force to host (tunnel-safe timing)
        t0 = time.monotonic()
        for _ in range(20):
            r = f(x)
        outs[name] = int(r)
        dt = (time.monotonic() - t0) / 20
        print(f"{name:14s} {dt * 1e3:7.2f} ms  (checksum {outs[name]})",
              flush=True)
    assert len(set(outs.values())) == 1, outs


def step(model_name, kw):
    env_base = dict(os.environ)
    for variant in ("fast", "packed", "jnp"):
        env = dict(env_base, SEGTPU_ARGMAX=variant)
        r = subprocess.run(
            [sys.executable, "scripts/model_profile.py", model_name,
             "train", "8"] + kw,
            env=env, capture_output=True, text=True, timeout=1200)
        line = [l for l in r.stdout.splitlines() if "ms/step" in l]
        print(f"{variant:7s} {line[0] if line else 'FAILED: ' + r.stdout[-300:] + r.stderr[-300:]}",
              flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "isolated":
        isolated()
    else:
        step(sys.argv[2], sys.argv[3:])
