"""ODE-parameter sensitivity analysis (ref: 05_ode_model.py:687-750).

The reference perturbs each rate by ±20% and re-solves the steady state one
perturbation at a time. Here the whole (n_rates x n_deltas) grid of perturbed
rate vectors is a single batched analytical steady-state solve.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from eegflow.ode.field import RATE_NAMES, steady_state


def parameter_sensitivity(
    k: jnp.ndarray, deltas: Sequence[float] = (-0.2, 0.2)
) -> Dict[str, object]:
    """Normalized steady-state sensitivity d(steady)/d(rate) per rate.

    Returns sensitivities[rate][state] = Δ steady_state / Δ rate averaged over
    the requested relative perturbations, plus the raw perturbed steady states.
    """
    k = jnp.asarray(k, jnp.float32)
    base = steady_state(k)

    # grid of perturbed rate vectors: (n_rates, n_deltas, 6)
    eye = jnp.eye(6)
    deltas_arr = jnp.asarray(deltas)
    perturbed = k[None, None, :] * (1.0 + deltas_arr[None, :, None] * eye[:, None, :])
    steady = steady_state(perturbed)  # (6, n_deltas, 3)

    base_np = np.asarray(base)
    steady_np = np.asarray(steady)
    k_np = np.asarray(k)

    sensitivities: Dict[str, Dict[str, float]] = {}
    for i, name in enumerate(RATE_NAMES):
        per_state = {}
        for j, state in enumerate(("Active", "Passive", "Fatigued")):
            grads = []
            for d_idx, d in enumerate(deltas):
                dk = k_np[i] * d
                if abs(dk) > 1e-12:
                    grads.append((steady_np[i, d_idx, j] - base_np[j]) / dk)
            per_state[state] = float(np.mean(grads)) if grads else 0.0
        sensitivities[name] = per_state

    return {
        "base_steady_state": base_np.tolist(),
        "sensitivities": sensitivities,
        "perturbed_steady_states": steady_np.tolist(),
        "deltas": list(deltas),
    }
