"""Probabilistic LSTM->ODE rate modulation (ref 06_lstm_ode_integration.py:236-292).

Coupling law (the paper's core contribution):
    k_af' = k_af (1 + alpha P_closed)    k_pf' = k_pf (1 + alpha P_closed)
    k_fa' = k_fa (1 + alpha P_open)      k_pa' = k_pa (1 + alpha P_open)
with every rate floored at 0.001. Vectorized over a batch of probabilities:
the whole batch's modulated rate matrix is one elementwise op, feeding the
batched ODE solve directly on device.

Rate order: [k_ap, k_af, k_pa, k_pf, k_fa, k_fp] (eegflow.ode.field.RATE_NAMES).
"""

from __future__ import annotations

import jax.numpy as jnp

#: multiplier selector per rate: 0 -> unmodulated, 1 -> *(1+a p_closed), 2 -> *(1+a p_open)
_MOD_KIND = jnp.asarray([0, 1, 2, 1, 2, 0])  # k_ap, k_af, k_pa, k_pf, k_fa, k_fp


def modulate_rates(
    k_base: jnp.ndarray,
    p_closed: jnp.ndarray,
    p_open: jnp.ndarray,
    alpha: float = 0.5,
    floor: float = 1e-3,
) -> jnp.ndarray:
    """``k_base (6,)`` or ``(..., 6)``; probabilities ``(...,)`` -> ``(..., 6)``."""
    p_closed = jnp.asarray(p_closed)[..., None]
    p_open = jnp.asarray(p_open)[..., None]
    mult_closed = 1.0 + alpha * p_closed
    mult_open = 1.0 + alpha * p_open
    mult = jnp.where(
        _MOD_KIND == 1, mult_closed, jnp.where(_MOD_KIND == 2, mult_open, 1.0)
    )
    return jnp.maximum(k_base * mult, floor)


#: canonical initial states (ref 06:285-292)
_INIT_FATIGUED = jnp.asarray([0.2, 0.2, 0.6])
_INIT_ACTIVE = jnp.asarray([0.6, 0.2, 0.2])
_INIT_MIXED = jnp.asarray([0.33, 0.34, 0.33])


def infer_initial_state(
    p_closed: jnp.ndarray, p_open: jnp.ndarray, threshold: float = 0.6
) -> jnp.ndarray:
    """Map LSTM probabilities to an initial APF state ``(..., 3)``:
    P_closed > 0.6 -> mostly fatigued; P_open > 0.6 -> mostly active; else mixed."""
    p_closed = jnp.asarray(p_closed)[..., None]
    p_open = jnp.asarray(p_open)[..., None]
    return jnp.where(
        p_closed > threshold,
        _INIT_FATIGUED,
        jnp.where(p_open > threshold, _INIT_ACTIVE, _INIT_MIXED),
    )
