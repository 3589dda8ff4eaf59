"""Optimizers and LR schedulers with reference-parity semantics.

Optimizers (`/root/reference/training/train.py:292-301`): Adam / AdamW /
SGD(momentum), each with weight decay.  Torch's ``Adam(weight_decay=w)``
adds ``w * p`` to the *gradient* (L2, not decoupled) — replicated here via
``optax.add_decayed_weights`` placed before the Adam transform; AdamW uses
decoupled decay after scaling, like torch.

Schedulers (`/root/reference/training/train.py:304-313,773-778`):

* ``ReduceLROnPlateau``: factor 0.5, patience 3, min_lr 1e-7, rel threshold
  1e-4 — stepped with the val loss only on eval epochs;
* ``CosineAnnealingLR``: T_max = total epochs, stepped every epoch;
* ``None``.

The learning rate is injected via `optax.inject_hyperparams`, so the host-
side scheduler just writes ``opt_state.hyperparams['learning_rate']`` —
no recompilation when the LR changes.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import optax


def build_optimizer(
    name: str,
    lr: float,
    weight_decay: float = 0.0,
    momentum: float = 0.9,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """Adam/AdamW/SGD with optional global-norm gradient clipping.

    ``grad_clip > 0`` prepends ``optax.clip_by_global_norm`` — applied to
    the raw gradients before any optimizer statistics see them.
    """
    def clipped(*steps):
        pre = [optax.clip_by_global_norm(grad_clip)] if grad_clip else []
        return optax.chain(*pre, *steps)

    if name == "Adam":
        def make(learning_rate):
            steps = []
            if weight_decay:
                steps.append(optax.add_decayed_weights(weight_decay))
            steps.append(optax.scale_by_adam())
            steps.append(optax.scale(-learning_rate))
            return clipped(*steps)
    elif name == "AdamW":
        def make(learning_rate):
            return clipped(optax.adamw(learning_rate, weight_decay=weight_decay))
    elif name == "SGD":
        def make(learning_rate):
            steps = []
            if weight_decay:
                steps.append(optax.add_decayed_weights(weight_decay))
            if momentum:
                steps.append(optax.trace(decay=momentum))
            steps.append(optax.scale(-learning_rate))
            return clipped(*steps)
    else:
        raise ValueError(f"Unknown optimizer: {name}")
    return optax.inject_hyperparams(make)(learning_rate=lr)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """Return a new opt_state with the injected learning rate replaced."""
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = lr
    return opt_state._replace(hyperparams=hyper)


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch-semantics plateau scheduler (mode=min, rel threshold)."""

    base_lr: float
    factor: float = 0.5
    patience: int = 3
    min_lr: float = 1e-7
    threshold: float = 1e-4
    # mutable state
    lr: float = None  # type: ignore[assignment]
    best: float = math.inf
    num_bad_epochs: int = 0

    def __post_init__(self):
        if self.lr is None:
            self.lr = self.base_lr

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.lr = float(state["lr"])
        self.best = float(state["best"])
        self.num_bad_epochs = int(state["num_bad_epochs"])


@dataclasses.dataclass
class CosineAnnealingLR:
    """torch CosineAnnealingLR, stepped per epoch (eta_min=0)."""

    base_lr: float
    t_max: int
    eta_min: float = 0.0
    epoch: int = 0
    lr: float = None  # type: ignore[assignment]

    def __post_init__(self):
        if self.lr is None:
            self.lr = self.base_lr

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        self.lr = self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.epoch / max(self.t_max, 1))
        ) / 2
        return self.lr

    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch, "lr": self.lr}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.epoch = int(state["epoch"])
        self.lr = float(state["lr"])


def build_scheduler(name: Optional[str], base_lr: float, epochs: int):
    """None-able scheduler factory matching the reference's names."""
    if name is None or (isinstance(name, str) and name.lower() == "none"):
        return None
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(base_lr=base_lr)
    if name == "CosineAnnealingLR":
        return CosineAnnealingLR(base_lr=base_lr, t_max=epochs)
    raise ValueError(f"Unknown scheduler: {name}")
