"""Auxiliary-loss registry (API-parity shim).

The reference uses a process-global singleton the models push per-element
losses into and the trainer reduces (common/aux_losses.py:4-58).  In JAX,
losses must flow through the traced function, so the policies here RETURN aux
terms (the `aux` dict) and the train steps reduce them — that is the
first-class mechanism.  This registry exists for API familiarity in host-side
code (activate/deactivate gating, named reduction with a mask) and is backed
by plain numpy; do not use it inside jitted code.

`reduce(mask)` reproduces the reference semantics: masked mean per loss,
scaled by alpha, summed (aux_losses.py:29-35).
"""

from __future__ import annotations

import numpy as np


class _AuxLosses:
    def __init__(self):
        self._losses = {}
        self._loss_alphas = {}
        self._is_active = False

    def clear(self):
        self._losses.clear()
        self._loss_alphas.clear()

    def register_loss(self, name, loss, alpha=1.0):
        assert self.is_active()
        assert name not in self._losses
        self._losses[name] = np.asarray(loss)
        self._loss_alphas[name] = alpha

    def get_loss(self, name):
        return self._losses[name]

    def reduce(self, mask):
        assert self.is_active()
        mask = np.asarray(mask, bool)
        total = 0.0
        for k, v in self._losses.items():
            sel = np.asarray(v)[mask]
            total = total + self._loss_alphas[k] * (
                float(sel.mean()) if sel.size else 0.0
            )
        return total

    def is_active(self):
        return self._is_active

    def activate(self):
        self._is_active = True

    def deactivate(self):
        self._is_active = False


AuxLosses = _AuxLosses()
