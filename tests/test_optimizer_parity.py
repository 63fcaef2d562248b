"""Optimizer + LR-schedule numerics vs the reference's torch stack.

The PARITY table row "SGD/Adam coupled L2, AdamW decoupled; steplr
staircase; cosine to lr*0.1" (train.py:185-193,278-291) was the one
replicated-exactly claim with no test behind it. Here each optax
transformation from ``mintime_tpu.train.make_optimizer`` is run against the
corresponding ``torch.optim`` update on identical parameters and gradient
sequences, and each ``make_schedule`` curve against the torch scheduler the
reference drives (StepLR stepped per epoch at train.py:445; timm
CosineLRScheduler ``step_update`` per step at :381, whose formula equals
torch CosineAnnealingLR with ``eta_min = 0.1 * lr``).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
import optax

from mintime_tpu.config import MintimeConfig, TrainingConfig
from mintime_tpu.train import make_optimizer, make_schedule


def _cfg(optimizer, scheduler="none", lr=0.01, wd=1e-4, step_size=5, gamma=0.1):
    return MintimeConfig(
        training=TrainingConfig(
            lr=lr, weight_decay=wd, optimizer=optimizer, scheduler=scheduler,
            step_size=step_size, gamma=gamma,
        )
    )


def _torch_optimizer(name, params, lr, wd):
    if name == "sgd":  # train.py:186 — NO momentum
        return torch.optim.SGD(params, lr=lr, weight_decay=wd)
    if name == "adamw":
        return torch.optim.AdamW(params, lr=lr, weight_decay=wd)
    return torch.optim.Adam(params, lr=lr, weight_decay=wd)


@pytest.mark.parametrize("name", ["sgd", "adam", "adamw"])
def test_optimizer_update_matches_torch(name):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((7, 5)).astype(np.float32)
    grads = [rng.standard_normal((7, 5)).astype(np.float32) for _ in range(5)]
    lr, wd = 0.01, 1e-4

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = _torch_optimizer(name, [tp], lr, wd)
    for g in grads:
        opt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        opt.step()

    tx = make_optimizer(_cfg(name, lr=lr, wd=wd), lr)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=2e-5, atol=2e-6
    )


def test_frozen_params_get_zero_updates():
    """make_optimizer(trainable_mask): frozen leaves must receive exactly
    zero updates (optax.masked would pass raw grads through — the bug the
    set_to_zero branch guards against)."""
    tx = make_optimizer(
        _cfg("sgd"), 0.01,
        trainable_mask=lambda params: {"a": True, "b": False},
    )
    params = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update(
        {"a": jnp.full((3,), 2.0), "b": jnp.full((3,), 2.0)}, state, params
    )
    assert np.all(np.asarray(updates["b"]) == 0.0)
    assert np.all(np.asarray(updates["a"]) != 0.0)


def test_steplr_schedule_matches_torch():
    """StepLR is stepped once per EPOCH (train.py:445); our per-step
    exponential_decay staircase must land on the same lr in every epoch."""
    lr, gamma, step_size, steps_per_epoch = 0.01, 0.1, 5, 7
    sched = make_schedule(
        _cfg("sgd", scheduler="steplr", lr=lr, gamma=gamma, step_size=step_size),
        steps_per_epoch, num_epochs=20,
    )
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    for epoch in range(20):
        want = opt.param_groups[0]["lr"]
        for i in range(steps_per_epoch):
            got = float(sched(epoch * steps_per_epoch + i))
            np.testing.assert_allclose(got, want, rtol=1e-6)
        tsched.step()


def test_cosine_schedule_matches_torch():
    """timm CosineLRScheduler(t_initial=num_steps, lr_min=0.1*lr,
    t_in_epochs=False) stepped per step (train.py:381) has the same curve
    as torch CosineAnnealingLR(T_max=num_steps, eta_min=0.1*lr)."""
    lr, steps_per_epoch, num_epochs = 0.01, 11, 6
    num_steps = steps_per_epoch * num_epochs
    sched = make_schedule(
        _cfg("sgd", scheduler="cosinelr", lr=lr), steps_per_epoch, num_epochs
    )
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=num_steps, eta_min=lr * 0.1
    )
    for step in range(num_steps):
        want = opt.param_groups[0]["lr"]
        got = float(sched(step))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)
        tsched.step()
