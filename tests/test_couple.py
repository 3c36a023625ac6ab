"""Coupling tests: modulation law, initial-state mapping, fused rollout vs a
scipy per-sample oracle (the reference's exact algorithm), sweep, export."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from eegflow.core.config import CouplingConfig, ModelConfig
from eegflow.couple import (
    CoupledModel,
    coupled_rollout,
    coupling_strength_sweep,
    infer_initial_state,
    modulate_rates,
    predict_batch,
    predict_trajectory,
)
from eegflow.nn.model import classifier_init
from eegflow.ode.field import DEFAULT_RATES, RATE_NAMES
from eegflow.ode import rates_to_array

TOY_CFG = ModelConfig(input_size=4, hidden_size=16, num_layers=1, dropout=0.0)


@pytest.fixture(scope="module")
def toy_model():
    params = classifier_init(jax.random.key(0), TOY_CFG)
    return CoupledModel(
        params=params, model_cfg=TOY_CFG,
        k_base=rates_to_array(DEFAULT_RATES), coupling=CouplingConfig(),
    )


def _reference_modulate(base, p_closed, p_open, alpha=0.5):
    """The reference's dict-based modulation (ref 06:236-264), as oracle."""
    params = dict(base)
    params["k_af"] *= 1 + alpha * p_closed
    params["k_pf"] *= 1 + alpha * p_closed
    params["k_fa"] *= 1 + alpha * p_open
    params["k_pa"] *= 1 + alpha * p_open
    return {k: max(0.001, v) for k, v in params.items()}


def test_modulate_rates_matches_reference():
    k = rates_to_array(DEFAULT_RATES)
    for p_closed in [0.0, 0.3, 0.7, 1.0]:
        p_open = 1 - p_closed
        ours = np.asarray(modulate_rates(k, p_closed, p_open, 0.5))
        ref = _reference_modulate(DEFAULT_RATES, p_closed, p_open, 0.5)
        np.testing.assert_allclose(ours, [ref[n] for n in RATE_NAMES], rtol=1e-6)


def test_modulate_rates_floor():
    k = jnp.zeros(6)
    out = np.asarray(modulate_rates(k, 0.5, 0.5))
    assert np.all(out == 1e-3)


def test_modulate_rates_batched():
    k = rates_to_array(DEFAULT_RATES)
    p_closed = jnp.asarray([0.1, 0.9])
    out = np.asarray(modulate_rates(k, p_closed, 1 - p_closed))
    assert out.shape == (2, 6)
    # higher p_closed raises fatigue rates, lowers recovery boost
    assert out[1, 1] > out[0, 1]  # k_af
    assert out[1, 4] < out[0, 4]  # k_fa


def test_infer_initial_state_thresholds():
    p_closed = jnp.asarray([0.7, 0.2, 0.5])
    p_open = 1 - p_closed
    out = np.asarray(infer_initial_state(p_closed, p_open))
    np.testing.assert_allclose(out[0], [0.2, 0.2, 0.6])   # fatigued
    np.testing.assert_allclose(out[1], [0.6, 0.2, 0.2])   # active
    np.testing.assert_allclose(out[2], [0.33, 0.34, 0.33])  # mixed


def test_coupled_rollout_matches_scipy_per_sample(toy_model, rng):
    """Fused on-device path vs the reference's per-sample scipy algorithm."""
    x = rng.standard_normal((6, 32, 4)).astype(np.float32)
    res = predict_batch(toy_model, x)
    probs = res["probs"]
    for i in range(6):
        ref_rates = _reference_modulate(DEFAULT_RATES, probs[i, 1], probs[i, 0], 0.5)
        if probs[i, 1] > 0.6:
            y0 = [0.2, 0.2, 0.6]
        elif probs[i, 0] > 0.6:
            y0 = [0.6, 0.2, 0.2]
        else:
            y0 = [0.33, 0.34, 0.33]
        y0 = np.asarray(y0) / np.sum(y0)

        def rhs(t, y, r=ref_rates):
            a, p, f = np.maximum(y, 0)
            return [
                -(r["k_ap"] + r["k_af"]) * a + r["k_pa"] * p + r["k_fa"] * f,
                r["k_ap"] * a - (r["k_pa"] + r["k_pf"]) * p + r["k_fp"] * f,
                r["k_af"] * a + r["k_pf"] * p - (r["k_fa"] + r["k_fp"]) * f,
            ]

        t_eval = np.linspace(0, 20, 20)
        sol = solve_ivp(rhs, (0, 20), y0, t_eval=t_eval, rtol=1e-10, atol=1e-12).y.T
        sol = np.clip(sol, 0, 1)
        sol = sol / sol.sum(1, keepdims=True)
        np.testing.assert_allclose(res["trajectories"][i], sol, atol=2e-5)
        expected_pred = int(sol[-1, 2] > 0.5)
        assert res["pred_binary"][i] == expected_pred


def test_rollout_output_contract(toy_model, rng):
    x = rng.standard_normal((5, 32, 4)).astype(np.float32)
    res = coupled_rollout(
        toy_model.params, jnp.asarray(x), toy_model.k_base, TOY_CFG,
        forecast_steps=20, bf16=False,
    )
    assert res["probs"].shape == (5, 2)
    assert res["attention"].shape == (5, 32)
    assert res["trajectories"].shape == (5, 20, 3)
    np.testing.assert_allclose(np.asarray(res["trajectories"]).sum(-1), 1.0, atol=1e-5)
    assert set(np.asarray(res["pred_three"])) <= {0, 1, 2}


def test_predict_batch_handles_ragged(toy_model, rng):
    """n not divisible by batch_size: padded path must not leak pad rows."""
    x = rng.standard_normal((10, 32, 4)).astype(np.float32)
    full = predict_batch(toy_model, x, batch_size=2048)
    ragged = predict_batch(toy_model, x, batch_size=4)
    assert len(ragged["probs"]) == 10
    np.testing.assert_allclose(full["probs"], ragged["probs"], atol=1e-5)


def test_predict_trajectory_single(toy_model, rng):
    x = rng.standard_normal((1, 32, 4)).astype(np.float32)
    traj, probs, attn = predict_trajectory(toy_model, x, forecast_steps=10)
    assert traj.shape == (10, 3) and probs.shape == (1, 2) and attn.shape == (1, 32)
    # explicit initial state override
    traj2, _, _ = predict_trajectory(
        toy_model, x, initial_state=[1.0, 0.0, 0.0], forecast_steps=10
    )
    np.testing.assert_allclose(traj2[0], [1, 0, 0], atol=1e-6)


def test_coupling_sweep(toy_model, rng):
    x = rng.standard_normal((16, 32, 4)).astype(np.float32)
    y = rng.integers(0, 2, 16)
    res = coupling_strength_sweep(toy_model, x, y, alphas=(0.0, 0.5, 1.0),
                                  forecast_steps=20)
    assert set(res) == {"0.0", "0.5", "1.0"}
    for v in res.values():
        assert set(v) == {"accuracy", "f1", "mcc"}
        assert 0 <= v["accuracy"] <= 1
