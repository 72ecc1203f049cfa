"""Tolerance-gated early stopping (reference: utils.py:7-47).

A candidate is only considered for checkpointing when **all** max violations
are within tolerance; the reference passes ``args.eq_tol`` as the single tol
for every class (reference: main.py:536) and we keep that semantic.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence


class EarlyStopping:
    def __init__(self, patience: int = 100,
                 save_fn: Optional[Callable] = None):
        self.patience = patience
        self.save_fn = save_fn
        self.counter = 0
        self.best_loss: Optional[float] = None
        self.early_stop = False

    def step(self, loss: float, mode: str, tol: float,
             violations: Sequence[float]) -> bool:
        improved = False
        if all(v <= tol for v in violations):
            if self.best_loss is None:
                improved = True
            elif mode == "min" and loss <= self.best_loss:
                improved = True
            elif mode == "max" and loss >= self.best_loss:
                improved = True

        if improved:
            self.best_loss = loss if self.best_loss is None else (
                min(loss, self.best_loss) if mode == "min"
                else max(loss, self.best_loss))
            self.counter = 0
            if self.save_fn is not None:
                self.save_fn()
        else:
            self.counter += 1

        if self.counter >= self.patience:
            self.early_stop = True
        return self.early_stop
