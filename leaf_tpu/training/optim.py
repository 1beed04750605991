"""Optimizer + LR-schedule factory on optax.

Capability parity with reference utilities/training_utils.py:39-78:
optimizer ∈ {Adam, SGD(momentum, nesterov)}, weight decay as classic L2
(coupled, like torch — added to the gradient BEFORE the Adam moments),
schedulers ∈ {'step' (StepLR), 'warmupcosine' (HF cosine-with-warmup,
stepped per batch), 'reduce' (ReduceLROnPlateau max-mode, factor=gamma,
patience, min_lr 1e-6, threshold 5e-3)}, optional per-device LR scaling.

TPU-first: 'step' and 'warmupcosine' are pure ``step -> lr`` schedules baked
into the jitted update (no host sync); 'reduce' is inherently metric-driven,
so it runs as a tiny host-side controller whose lr multiplier feeds an
``optax.inject_hyperparams`` learning rate once per epoch.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

import optax

__all__ = ["optimization_helper", "ReduceLROnPlateau",
           "warmup_cosine_schedule", "step_schedule"]


def warmup_cosine_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int) -> Callable:
    """HF transformers.get_cosine_schedule_with_warmup semantics
    (reference: training_utils.py:70-76): linear 0→lr over warmup, then
    0.5·(1+cos(π·progress))·lr decaying to 0."""

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(
            1.0, total_steps - warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.clip(progress, 0.0, 1.0)))
        return base_lr * jnp.where(step < warmup_steps, warm, cos)

    return schedule


def step_schedule(base_lr: float, step_size_epochs: int, gamma: float,
                  steps_per_epoch: int) -> Callable:
    """torch StepLR: lr·gamma^(epoch // step_size)
    (reference: training_utils.py:65-68), expressed per train step."""

    def schedule(step):
        import jax.numpy as jnp
        epoch = jnp.asarray(step, jnp.float32) // max(1, steps_per_epoch)
        return base_lr * gamma ** jnp.floor(epoch / step_size_epochs)

    return schedule


@dataclass
class ReduceLROnPlateau:
    """Host-side ReduceLROnPlateau, max mode (reference:
    training_utils.py:60-64 — factor=gamma, patience, min_lr=1e-6,
    threshold=5e-3 relative)."""

    base_lr: float
    factor: float = 0.1
    patience: int = 15
    min_lr: float = 1e-6
    threshold: float = 5e-3
    mode: str = "max"
    lr: float = field(init=False)
    best: float = field(init=False)
    num_bad_epochs: int = field(init=False, default=0)

    def __post_init__(self):
        self.lr = self.base_lr
        self.best = -math.inf if self.mode == "max" else math.inf

    def _is_better(self, metric: float) -> bool:
        # torch 'rel' threshold mode, unconditionally (torch
        # lr_scheduler.ReduceLROnPlateau.is_better): max: metric >
        # best·(1+eps); min: metric < best·(1−eps). The ±inf init makes the
        # first epoch always "better"; for negative bests the product flips
        # the margin's sign exactly like torch does.
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Feed the epoch metric; returns the (possibly reduced) lr."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, state: dict) -> None:
        self.lr = state["lr"]
        self.best = state["best"]
        self.num_bad_epochs = state["num_bad_epochs"]


def _base_optimizer(name: str, cfg_opt: dict, learning_rate) -> optax.GradientTransformation:
    wd = float(cfg_opt.get("weight_decay", 0.0))
    transforms = []
    if wd:
        # torch-style coupled L2: grad += wd·param BEFORE the moments.
        transforms.append(optax.add_decayed_weights(wd))
    if name == "Adam":
        transforms.append(optax.scale_by_adam())
    elif name == "SGD":
        momentum = float(cfg_opt.get("momentum", 0.9))
        nesterov = bool(cfg_opt.get("nesterov", True))
        transforms.append(optax.trace(decay=momentum, nesterov=nesterov))
    else:
        raise ValueError(f"Unsupported optimizer {name}")
    if callable(learning_rate):
        transforms.append(optax.scale_by_schedule(
            lambda step: -learning_rate(step)))
    else:
        transforms.append(optax.scale(-learning_rate))
    return optax.chain(*transforms)


def optimization_helper(
    cfg: dict,
    num_devices: int = 1,
    num_tr_steps_per_epoch: Optional[int] = None,
    num_epochs: Optional[int] = None,
    per_device_lr_scaling: bool = False,
    reduce_on_plateau_mode: str = "max",
) -> Tuple[optax.GradientTransformation, Optional[ReduceLROnPlateau], str]:
    """Build (tx, plateau_controller_or_None, scheduler_name).

    For 'reduce', the returned tx is wrapped in ``optax.inject_hyperparams``;
    update its lr each epoch via
    ``opt_state.hyperparams['learning_rate'] = controller.step(metric)``.
    """
    cfg_opt = cfg["opt"]
    name = cfg_opt.get("optimizer", "Adam")
    lr = float(cfg_opt.get("lr", 1e-3))
    if per_device_lr_scaling:
        lr = lr * num_devices

    scheduler_name = cfg_opt.get("scheduler", "reduce")
    if scheduler_name == "warmupcosine":
        assert num_tr_steps_per_epoch is not None and num_epochs is not None
        total = num_tr_steps_per_epoch * num_epochs
        warmup = num_tr_steps_per_epoch * int(cfg_opt.get("warmup_epochs", 10))
        schedule = warmup_cosine_schedule(lr, warmup, total)
        return _base_optimizer(name, cfg_opt, schedule), None, scheduler_name
    if scheduler_name == "step":
        assert num_tr_steps_per_epoch is not None
        schedule = step_schedule(
            lr, int(cfg_opt.get("step_size", 30)),
            float(cfg_opt.get("gamma", 0.1)), num_tr_steps_per_epoch)
        return _base_optimizer(name, cfg_opt, schedule), None, scheduler_name
    if scheduler_name == "reduce":
        controller = ReduceLROnPlateau(
            base_lr=lr,
            factor=float(cfg_opt.get("gamma", 0.1)),
            patience=int(cfg_opt.get("patience", 15)),
            mode=reduce_on_plateau_mode,
        )

        def make(learning_rate):
            return _base_optimizer(name, cfg_opt, learning_rate)

        tx = optax.inject_hyperparams(make)(learning_rate=lr)
        return tx, controller, scheduler_name
    raise ValueError(f"Unsupported scheduler {scheduler_name}")
