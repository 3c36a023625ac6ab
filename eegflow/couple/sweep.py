"""Coupling-strength sensitivity sweep (ref 06_lstm_ode_integration.py:525-575).

alpha in {0, 0.25, 0.5, 0.75, 1.0} -> accuracy/F1/MCC each. The reference
reruns the full two-phase predict_batch per alpha; here the classifier
forward runs ONCE and only the (cheap) modulation + batched ODE solve
re-runs per alpha.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

from eegflow.analyze.evaluate import binary_metrics
from eegflow.couple.modulation import infer_initial_state, modulate_rates
from eegflow.couple.rollout import CoupledModel
from eegflow.ode.integrate import solve_batch
from eegflow.train.loop import predict_probs


def coupling_strength_sweep(
    model: CoupledModel,
    x: np.ndarray,
    y: np.ndarray,
    alphas: Sequence[float] = (0.0, 0.25, 0.5, 0.75, 1.0),
    forecast_steps: int = 20,
    batch_size: int = 2048,
    mesh=None,
) -> Dict[str, Dict[str, float]]:
    """Returns {alpha: {accuracy, f1, mcc}} like coupling_analysis.json.

    With ``mesh`` both the (single) classifier pass and every per-alpha batch
    of ODE solves shard their sample axis across the mesh — the sweep is
    embarrassingly parallel over samples (SURVEY §2.11/§5).
    """
    probs = predict_probs(model.params, x, model.model_cfg, batch_size,
                          mesh=mesh)
    n = len(probs)
    pad = 0
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-n) % n_dev
    probs_j = jnp.asarray(np.pad(probs, ((0, pad), (0, 0))))
    if mesh is not None:
        from eegflow.train.mesh import shard_batch

        probs_j = shard_batch(probs_j, mesh)
    p_open, p_closed = probs_j[:, 0], probs_j[:, 1]
    y0 = infer_initial_state(p_closed, p_open, model.coupling.init_threshold)

    results: Dict[str, Dict[str, float]] = {}
    for alpha in alphas:
        k_mod = modulate_rates(model.k_base, p_closed, p_open, float(alpha),
                               model.coupling.rate_floor)
        traj = solve_batch(y0, 0.0, float(forecast_steps), forecast_steps, k_mod)
        pred = np.asarray((traj[:, -1, 2] > 0.5).astype(jnp.int32))[:n]
        m = binary_metrics(y, pred)
        results[f"{alpha}"] = {
            "accuracy": m["accuracy"], "f1": m["f1"], "mcc": m["mcc"],
        }
    return results
