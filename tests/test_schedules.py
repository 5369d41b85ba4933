"""Schedule tests vs closed-form values from reference utils/lr_scheduler.py.

Indexing contract (pinned end-to-end by tests/test_reference_parity.py::
test_training_dynamics_parity): the reference's torch ``_LRScheduler``
consumes T=0 at construction, so its training iteration t (0-based update
count) applies ``factor(T=t+1)``. segtpu schedules reproduce that —
``sched(t)`` below therefore equals the reference formula at T=t+1.
"""

import math

import numpy as np
import pytest

from segtpu import schedules


def test_poly_matches_formula():
    sched = schedules.poly(0.01, num_epochs=10, iters_per_epoch=100)
    n = 1000
    for t in [0, 1, 137, 500, 999]:
        expect = 0.01 * (1 - (t + 1) / n) ** 0.9
        assert float(sched(t)) == pytest.approx(expect, rel=1e-4, abs=1e-12)
    # final applied iteration reaches exactly lr=0, like the reference
    assert float(sched(n - 1)) == 0.0


def test_poly_warmup():
    sched = schedules.poly(0.01, num_epochs=10, iters_per_epoch=100, warmup_epochs=2)
    assert float(sched(0)) == pytest.approx(0.01 * 1 / 200, rel=1e-4)
    assert float(sched(99)) == pytest.approx(0.01 * 100 / 200, rel=1e-4)
    assert float(sched(400)) == pytest.approx(0.01 * (1 - 401 / 1000) ** 0.9, rel=1e-4)


def test_one_cycle_endpoints_and_peak():
    base_lr = 0.01
    lr_sched, mom_sched = schedules.one_cycle(base_lr, num_epochs=2, iters_per_epoch=100)
    n, p1 = 200, 60
    low = base_lr / 25

    def phase1(T):
        cos = (1 + math.cos(math.pi * T / p1)) / 2
        return base_lr - (base_lr - low) * cos, 0.85 + 0.1 * cos

    # Start (T=1): lr ~ base/25, momentum ~ high (0.95).
    lr0, m0 = phase1(1)
    assert float(lr_sched(0)) == pytest.approx(lr0, rel=1e-4)
    assert float(mom_sched(0)) == pytest.approx(m0, rel=1e-4)
    # Peak at end of phase 1 (T=p1): lr = base, momentum = low (0.85).
    assert float(lr_sched(p1 - 1)) == pytest.approx(base_lr, rel=1e-4)
    assert float(mom_sched(p1 - 1)) == pytest.approx(0.85, rel=1e-4)
    # End (T=n): lr ~ base/(25e4), momentum back to high.
    assert float(lr_sched(n - 1)) == pytest.approx(base_lr / (25 * 1e4), rel=1e-4)
    assert float(mom_sched(n - 1)) == pytest.approx(0.95, rel=1e-4)


def test_one_cycle_matches_reference_formula():
    """Spot-check mid-phase values against the exact cosine formulas of
    reference utils/lr_scheduler.py:42-59 (at T=t+1)."""
    base_lr, n_epochs, ipe = 0.02, 3, 50
    lr_sched, mom_sched = schedules.one_cycle(base_lr, n_epochs, ipe)
    n = n_epochs * ipe
    p1 = int(n * 0.3)
    low, final = base_lr / 25, base_lr / 25e4
    for t in [5, 20, p1 - 2]:
        T = t + 1
        cos = (1 + math.cos(math.pi * T / p1)) / 2
        assert float(lr_sched(t)) == pytest.approx(base_lr - (base_lr - low) * cos, rel=1e-4)
        assert float(mom_sched(t)) == pytest.approx(0.85 + 0.1 * cos, rel=1e-4)
    for t in [p1 + 1, p1 + 30, n - 2]:
        T2 = t + 1 - p1
        cos = (1 + math.cos(math.pi * T2 / (n - p1))) / 2
        assert float(lr_sched(t)) == pytest.approx(final + (base_lr - final) * cos, rel=1e-4)
        assert float(mom_sched(t)) == pytest.approx(0.95 - 0.1 * cos, rel=1e-4)


def test_registry():
    assert schedules.get_schedule("Poly") is schedules.poly
    assert schedules.get_schedule("OneCycle") is schedules.one_cycle
    with pytest.raises(KeyError):
        schedules.get_schedule("nope")


def test_poly_monotone_decreasing():
    sched = schedules.poly(0.01, 5, 100)
    vals = [float(sched(t)) for t in range(0, 500, 25)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert np.all(np.asarray(vals) >= 0)
