"""Learning-rate schedule: linear warmup + cosine annealing, per-epoch
granularity matching the reference's LambdaLR (ref 04_lstm_model.py:441-451):

    lambda(e) = (e+1)/warmup            for e < warmup
              = 0.5 (1 + cos(pi * (e-warmup)/(epochs-warmup)))  otherwise
"""

from __future__ import annotations

import numpy as np


def warmup_cosine_schedule(
    base_lr: float, epochs: int, warmup_epochs: int, updates_per_epoch: int
):
    """optax-compatible schedule over optimizer-update steps.

    The multiplier is a function of the *epoch* index (step // updates_per_epoch)
    so the LR trace matches the reference's per-epoch scheduler exactly.
    """
    import jax.numpy as jnp

    updates_per_epoch = max(1, updates_per_epoch)

    def schedule(step):
        epoch = jnp.asarray(step) // updates_per_epoch
        warm = (epoch + 1.0) / max(warmup_epochs, 1)
        denom = max(epochs - warmup_epochs, 1)
        progress = (epoch - warmup_epochs) / denom
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return base_lr * jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def lr_trace(base_lr: float, epochs: int, warmup_epochs: int) -> np.ndarray:
    """Per-epoch LR values (for history/plots parity with ref history dict)."""
    out = []
    for e in range(epochs):
        if e < warmup_epochs:
            mult = (e + 1) / warmup_epochs
        else:
            progress = (e - warmup_epochs) / max(epochs - warmup_epochs, 1)
            mult = 0.5 * (1 + np.cos(np.pi * progress))
        out.append(base_lr * mult)
    return np.asarray(out)
