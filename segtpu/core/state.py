"""Train state and optimizer construction.

Replaces reference base/base_trainer.py:46-58: optimizer built from config
with differential learning rates (decoder at ``lr``, backbone at ``lr/10``)
and a per-iteration LR schedule. In optax terms: ``multi_transform`` over
{backbone, decoder} partitions, each a torch-semantics SGD/Adam chain driven
by the same schedule scaled per group. ``freeze_backbone`` zeroes the
backbone partition (replaces reference set_trainable, utils/helpers.py:44-57).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from segtpu import schedules as sched_lib


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def partition_labels(params) -> Any:
    """'backbone' for params under the backbone scope, 'decoder' otherwise.

    Mirrors reference get_backbone_params/get_decoder_params
    (e.g. models/pspnet.py:96-101); models without a pretrained encoder
    (UNet, ENet, SegNet) simply have no 'backbone' top-level key and land
    entirely in 'decoder', matching their upstream behavior
    (reference models/unet.py:108-113).
    """
    flat = flax.traverse_util.flatten_dict(params)
    labels = {k: ("backbone" if k[0] == "backbone" or k[0].startswith("backbone_")
                  else "decoder") for k in flat}
    return flax.traverse_util.unflatten_dict(labels)


def _torch_sgd(lr_schedule, momentum: float = 0.9, weight_decay: float = 0.0,
               nesterov: bool = False,
               momentum_schedule: Optional[Callable] = None):
    """torch.optim.SGD semantics: grad += wd*p, then momentum buffer, then lr.

    ``momentum_schedule`` enables OneCycle's inverse momentum cycling
    (reference utils/lr_scheduler.py:23-59) via inject_hyperparams.
    """
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum_schedule is not None:
        parts.append(optax.inject_hyperparams(
            lambda momentum: optax.trace(decay=momentum, nesterov=nesterov)
        )(momentum=momentum_schedule))
    elif momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


def _torch_adam(lr_schedule, betas=(0.9, 0.999), eps: float = 1e-8,
                weight_decay: float = 0.0, **_):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    parts.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*parts)


_OPTIMIZERS = {"SGD": _torch_sgd, "Adam": _torch_adam}


def make_optimizer(
    optimizer_type: str = "SGD",
    lr: float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    nesterov: bool = False,
    differential_lr: bool = True,
    freeze_backbone: bool = False,
    scheduler_type: str = "Poly",
    num_epochs: int = 80,
    iters_per_epoch: int = 1000,
    scheduler_args: Optional[Dict] = None,
) -> optax.GradientTransformation:
    """Build the full optax transformation from reference-config fields
    (config.json "optimizer" + "lr_scheduler" blocks)."""
    tx, _ = make_optimizer_with_schedules(
        optimizer_type=optimizer_type, lr=lr, momentum=momentum,
        weight_decay=weight_decay, nesterov=nesterov,
        differential_lr=differential_lr, freeze_backbone=freeze_backbone,
        scheduler_type=scheduler_type, num_epochs=num_epochs,
        iters_per_epoch=iters_per_epoch, scheduler_args=scheduler_args)
    return tx


def make_optimizer_with_schedules(
    optimizer_type: str = "SGD",
    lr: float = 0.01,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    nesterov: bool = False,
    differential_lr: bool = True,
    freeze_backbone: bool = False,
    scheduler_type: str = "Poly",
    num_epochs: int = 80,
    iters_per_epoch: int = 1000,
    scheduler_args: Optional[Dict] = None,
):
    """Like :func:`make_optimizer` but also returns the per-group LR schedule
    closures ``[decoder_sched, backbone_sched?]`` — the EXACT callables baked
    into ``optax.scale_by_learning_rate``. optax scales update t by
    ``sched(t)``, so after N updates the last APPLIED rate is ``sched(N-1)``
    — the trainer logs that (``Trainer._current_lrs``), which is also what
    the reference's ``param_group['lr']`` holds at its epoch-end log
    (scheduler stepped before each update — reference trainer.py:52,99)."""
    scheduler_args = dict(scheduler_args or {})
    mom_schedule = None
    if scheduler_type == "OneCycle":
        lr_sched, mom_schedule = sched_lib.one_cycle(
            lr, num_epochs, iters_per_epoch, **scheduler_args)
    else:
        lr_sched = sched_lib.get_schedule(scheduler_type)(
            lr, num_epochs, iters_per_epoch, **scheduler_args)

    make = _OPTIMIZERS[optimizer_type]
    kwargs: Dict[str, Any] = dict(weight_decay=weight_decay)
    if optimizer_type == "SGD":
        kwargs.update(momentum=momentum, nesterov=nesterov,
                      momentum_schedule=mom_schedule)

    decoder_tx = make(lr_sched, **kwargs)
    backbone_sched = (lambda s: lr_sched(s) * 0.1)
    schedules = [lr_sched]
    if differential_lr:
        # Reference parity (base_trainer.py:46-53, trainer.py:94-99): with
        # differential_lr there are ALWAYS two param groups — backbone at
        # 0.1x — and upstream logs the group's lr even when the backbone is
        # frozen (it filters the params but keeps the group). ONE closure
        # serves both the log list and the transform, so they can't drift.
        schedules.append(backbone_sched)
    if freeze_backbone:
        backbone_tx = optax.set_to_zero()
    elif differential_lr:
        backbone_tx = make(backbone_sched, **kwargs)
    else:
        backbone_tx = decoder_tx

    tx = optax.multi_transform(
        {"backbone": backbone_tx, "decoder": decoder_tx}, partition_labels)
    return tx, schedules


def create_train_state(model, tx, rng, sample_input, train: bool = False) -> TrainState:
    variables = model.init({"params": rng, "dropout": rng}, sample_input,
                           train=train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
