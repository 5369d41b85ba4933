"""Update-math parity for the extended optimizer surface (VERDICT-r3 item 4).

The reference resolves ANY ``torch.optim`` name by reflection (reference
base/base_trainer.py:57); segtpu implements the torch-semantics set
{SGD, Adam, AdamW, RMSprop, Adagrad} (segtpu/core/state.py). Each new
transform here is driven head-to-head against the REAL torch optimizer on a
toy parameter with a shared gradient stream, in float64 — any semantic
difference (eps placement, decay coupling, momentum ordering, lr_decay
indexing) shows up at >1e-9, far above f64 rounding.

AdamW additionally gets the full 20-step UNet end-to-end dynamics proof in
``test_reference_parity.py::test_training_dynamics_parity_adamw``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from segtpu.core.state import (_torch_adagrad, _torch_adamw, _torch_rmsprop,
                               make_optimizer_with_schedules)

N_STEPS = 12
LR = 0.05


@pytest.fixture()
def x64():
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", prev)


def _grad_stream(n=N_STEPS, shape=(4, 3)):
    rng = np.random.default_rng(42)
    return [rng.normal(size=shape) for _ in range(n)]


def _torch_trajectory(opt_name, torch_kwargs, w0, grads):
    p = torch.nn.Parameter(torch.tensor(w0, dtype=torch.float64))
    opt = getattr(torch.optim, opt_name)([p], **torch_kwargs)
    for g in grads:
        opt.zero_grad()
        p.grad = torch.tensor(g, dtype=torch.float64)
        opt.step()
    return p.detach().numpy()


def _segtpu_trajectory(tx, w0, grads):
    params = {"w": jnp.asarray(w0, jnp.float64)}
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update(
            {"w": jnp.asarray(g, jnp.float64)}, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return np.asarray(params["w"])


def _check(opt_name, torch_kwargs, tx):
    w0 = np.random.default_rng(0).normal(size=(4, 3))
    grads = _grad_stream()
    want = _torch_trajectory(opt_name, torch_kwargs, w0, grads)
    got = _segtpu_trajectory(tx, w0, grads)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def _const_lr(_step):
    return LR


def test_adamw_decoupled_decay(x64):
    # wd=1e-2 (torch AdamW default): a coupled-decay mistake diverges fast
    _check("AdamW", dict(lr=LR, weight_decay=1e-2),
           _torch_adamw(_const_lr, weight_decay=1e-2))


def test_rmsprop_plain(x64):
    _check("RMSprop", dict(lr=LR),
           _torch_rmsprop(_const_lr))


def test_rmsprop_momentum_wd(x64):
    # momentum buffer applied AFTER the division; wd coupled (grad += wd*p)
    _check("RMSprop", dict(lr=LR, momentum=0.9, weight_decay=1e-3),
           _torch_rmsprop(_const_lr, momentum=0.9, weight_decay=1e-3))


def test_rmsprop_centered(x64):
    # centered variant: avg = sqrt(sq_avg - grad_avg^2) + eps (eps OUTSIDE)
    _check("RMSprop", dict(lr=LR, centered=True, momentum=0.5),
           _torch_rmsprop(_const_lr, centered=True, momentum=0.5))


def test_adagrad_plain(x64):
    _check("Adagrad", dict(lr=LR),
           _torch_adagrad(_const_lr))


def test_adagrad_lr_decay_init_acc_wd(x64):
    # clr = lr/(1 + t*lr_decay), t = completed updates; acc starts at the
    # initial_accumulator_value; wd coupled
    _check("Adagrad",
           dict(lr=LR, lr_decay=1e-2, initial_accumulator_value=0.1,
                weight_decay=1e-3),
           _torch_adagrad(_const_lr, lr_decay=1e-2,
                          initial_accumulator_value=0.1, weight_decay=1e-3))


def test_unknown_optimizer_raises_with_surface():
    with pytest.raises(ValueError, match="AdamW"):
        make_optimizer_with_schedules(optimizer_type="LBFGS")


def test_config_args_flow_through():
    # config {"optimizer": {"type": "RMSprop", "args": {...}}} must build —
    # the exact surface the reference accepts (base/base_trainer.py:57)
    for opt_type, args in [("AdamW", {"betas": [0.9, 0.99], "eps": 1e-7}),
                           ("RMSprop", {"alpha": 0.95, "centered": True}),
                           ("Adagrad", {"lr_decay": 1e-3})]:
        tx, scheds = make_optimizer_with_schedules(
            optimizer_type=opt_type, lr=1e-3, num_epochs=1,
            iters_per_epoch=10, **args)
        params = {"decoder_w": jnp.ones((2, 2))}
        state = tx.init(params)
        updates, _ = tx.update({"decoder_w": jnp.ones((2, 2))}, state, params)
        assert jnp.all(jnp.isfinite(updates["decoder_w"]))
        assert len(scheds) == 2  # decoder + 0.1x backbone closures
