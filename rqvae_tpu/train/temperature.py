"""Gumbel-softmax temperature schedule for RQ-VAE training.

Parity: reference distributions/gumbel.py:21-41 (TemperatureScheduler —
exponential anneal with a floor, stepped every ``step_size`` iters). The
reference ships the class but both its train loops hardcode t=0.2
(train_rqvae.py:138); we default to the same constant and expose the
schedule as an opt-in (``gumbel_anneal=true``).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class TemperatureScheduler:
    t0: float = 0.2
    min_t: float = 0.05
    anneal_rate: float = 1e-5
    step_size: int = 1000

    def __post_init__(self):
        self.t = float(self.t0)

    def get_t(self, it: int) -> float:
        """Reference semantics: anneal only on the last iter of each window
        (gumbel.py:35-41), multiplicative exp(-rate * iter) with a floor."""
        if it % self.step_size == self.step_size - 1:
            self.t = float(
                np.maximum(self.t * np.exp(-self.anneal_rate * it), self.min_t)
            )
        return self.t


class ConstantTemperature:
    def __init__(self, t: float):
        self.t = float(t)

    def get_t(self, it: int) -> float:
        return self.t
