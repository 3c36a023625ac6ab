"""DE fitting tests: recover known rates from a synthetic trajectory."""

import jax.numpy as jnp
import numpy as np

from eegflow.core.config import ODEConfig
from eegflow.fit import differential_evolution_fit, fit_ode_rates, make_fit_loss
from eegflow.ode import rates_to_array, solve


def _synthetic_observation(rates, n_points=60, t_end=60.0, noise=0.0, seed=0):
    k = rates_to_array(rates)
    _, traj = solve([0.6, 0.25, 0.15], (0.0, t_end), n_points, k=k, method="expm")
    traj = np.asarray(traj)
    if noise:
        rng = np.random.default_rng(seed)
        traj = traj + rng.normal(0, noise, traj.shape)
        traj = np.clip(traj, 1e-3, 1.0)
        traj = traj / traj.sum(axis=1, keepdims=True)
    return traj


def test_loss_zero_at_true_rates():
    true = {"k_ap": 0.1, "k_af": 0.05, "k_pa": 0.2, "k_pf": 0.15, "k_fa": 0.1, "k_fp": 0.2}
    obs = _synthetic_observation(true)
    loss = make_fit_loss(obs, 0.0, 60.0, len(obs), reg_weight=0.0)
    val = float(loss(rates_to_array(true)))
    assert val < 1e-8


def test_loss_vmaps_over_population():
    true = {"k_ap": 0.1, "k_af": 0.05, "k_pa": 0.2, "k_pf": 0.15, "k_fa": 0.1, "k_fp": 0.2}
    obs = _synthetic_observation(true)
    loss = make_fit_loss(obs, 0.0, 60.0, len(obs))
    pop = jnp.ones((17, 6)) * 0.1
    vals = np.asarray(loss(pop))
    assert vals.shape == (17,)
    assert np.all(np.isfinite(vals))


def test_de_recovers_rates():
    true = {"k_ap": 0.12, "k_af": 0.06, "k_pa": 0.25, "k_pf": 0.18, "k_fa": 0.09, "k_fp": 0.22}
    obs = _synthetic_observation(true)
    cfg = ODEConfig(de_maxiter=150, reg_weight=0.0)
    fitted, fx, info = fit_ode_rates(obs, np.linspace(0, 60, len(obs)), cfg)
    assert fx < 1e-5
    # trajectory-level recovery: refit trajectory close to observation
    refit = _synthetic_observation(fitted, n_points=len(obs), t_end=60.0)
    assert np.max(np.abs(refit - obs)) < 0.02


def test_de_respects_bounds():
    true = {"k_ap": 0.1, "k_af": 0.05, "k_pa": 0.2, "k_pf": 0.15, "k_fa": 0.1, "k_fp": 0.2}
    obs = _synthetic_observation(true, noise=0.02)
    bounds = ODEConfig().bounds
    loss = make_fit_loss(obs, 0.0, 60.0, len(obs))
    x, fx, info = differential_evolution_fit(loss, bounds, maxiter=50)
    for i, (lo, hi) in enumerate(bounds):
        assert lo - 1e-9 <= x[i] <= hi + 1e-9
    assert np.isfinite(fx)
