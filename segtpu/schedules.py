"""Learning-rate / momentum schedules as pure optax schedules.

Equivalents of reference utils/lr_scheduler.py. The reference steps its
schedulers once per ITERATION with an internal global-iteration counter
(reference trainer.py:52, lr_scheduler.py:13-19); here the schedule is a pure
function of the global step, which composes with ``optax.inject_hyperparams``
and lives inside the jitted update — no host round trip per step.
"""

from __future__ import annotations

import jax.numpy as jnp


def poly(base_lr: float, num_epochs: int, iters_per_epoch: int,
         warmup_epochs: int = 0, power: float = 0.9):
    """Poly decay ``base_lr * (1 - T/N)^0.9`` with optional linear warmup.

    Parity: reference utils/lr_scheduler.py:4-20 (class Poly). Indexing
    quirk reproduced exactly: torch's ``_LRScheduler.__init__`` consumes
    T=0 at CONSTRUCTION (its initial ``.step()``), so the reference's
    training iteration t (0-based update count) applies ``factor(T=t+1)``
    — the first applied lr is already one tick decayed and the final
    iteration reaches lr=0. Proven end-to-end by
    tests/test_reference_parity.py::test_training_dynamics_parity.
    """
    total = num_epochs * iters_per_epoch
    warmup = warmup_epochs * iters_per_epoch

    def schedule(step):
        # result_type(float) is f32 normally, f64 under jax x64 — keeps the
        # factor exact in the float64 dynamics-parity tests (torch computes
        # it in python doubles) without changing TPU behavior.
        t = jnp.asarray(step).astype(jnp.result_type(float)) + 1.0
        factor = jnp.power(jnp.maximum(1.0 - t / total, 0.0), power)
        if warmup > 0:
            factor = jnp.where(t < warmup, t / warmup, factor)
        return base_lr * factor

    return schedule


def one_cycle(base_lr: float, num_epochs: int, iters_per_epoch: int,
              momentums=(0.85, 0.95), div_factor: float = 25.0, phase1: float = 0.3):
    """OneCycle: cosine ramp lr/25 -> lr over the first 30% of training, then
    cosine anneal to lr/(25e4), with inverse momentum cycling 0.95 -> 0.85 ->
    0.95. Returns ``(lr_schedule, momentum_schedule)``.

    Parity: reference utils/lr_scheduler.py:23-59 (class OneCycle), with
    the same T=t+1 applied-iteration indexing as :func:`poly` (the
    construction-time ``.step()`` consumes T=0).
    """
    total = num_epochs * iters_per_epoch
    p1 = int(total * phase1)
    p2 = total - p1
    low_lr = base_lr / div_factor
    final_lr = base_lr / (div_factor * 1e4)
    mom_lo, mom_hi = momentums
    mom_diff = mom_hi - mom_lo

    def lr_schedule(step):
        t = jnp.asarray(step).astype(jnp.result_type(float)) + 1.0
        cos1 = (1.0 + jnp.cos(jnp.pi * jnp.minimum(t, p1) / p1)) / 2.0
        lr1 = base_lr - (base_lr - low_lr) * cos1
        t2 = jnp.clip(t - p1, 0.0, p2)
        cos2 = (1.0 + jnp.cos(jnp.pi * t2 / p2)) / 2.0
        lr2 = final_lr + (base_lr - final_lr) * cos2
        return jnp.where(t <= p1, lr1, lr2)

    def momentum_schedule(step):
        t = jnp.asarray(step).astype(jnp.result_type(float)) + 1.0
        cos1 = (1.0 + jnp.cos(jnp.pi * jnp.minimum(t, p1) / p1)) / 2.0
        m1 = mom_lo + mom_diff * cos1
        t2 = jnp.clip(t - p1, 0.0, p2)
        cos2 = (1.0 + jnp.cos(jnp.pi * t2 / p2)) / 2.0
        m2 = mom_hi - mom_diff * cos2
        return jnp.where(t <= p1, m1, m2)

    return lr_schedule, momentum_schedule


SCHEDULERS = {"Poly": poly, "OneCycle": one_cycle}


def get_schedule(name: str):
    if name not in SCHEDULERS:
        raise KeyError(f"unknown lr_scheduler {name!r}; available: {sorted(SCHEDULERS)}")
    return SCHEDULERS[name]
