"""Forecasting tests vs the reference's per-sample scipy loop, plus the
three-state export contract."""

import numpy as np
import pytest
from scipy.integrate import odeint

from eegflow.analyze.forecast import (
    evaluate_forecasts,
    multistep_forecast,
    prob_to_ode_state,
    rolling_forecast_evaluation,
)
from eegflow.ode import rates_to_array
from eegflow.ode.field import DEFAULT_RATES, RATE_NAMES


def _reference_prob_to_state(p):
    """ref 08:215-234 as oracle."""
    a = 1.0 - p
    if p > 0.5:
        f, pp = p * 0.6, p * 0.4
    else:
        f, pp = p * 0.3, p * 0.3
    tot = a + pp + f
    return np.array([a / tot, pp / tot, f / tot])


def test_prob_to_ode_state_matches_reference():
    for p in [0.0, 0.3, 0.5, 0.7, 1.0]:
        np.testing.assert_allclose(
            prob_to_ode_state(p), _reference_prob_to_state(p), atol=1e-12
        )


def test_prob_to_ode_state_simplex():
    p = np.linspace(0, 1, 21)
    s = prob_to_ode_state(p)
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-12)
    assert np.all(s >= 0)


def _reference_forecast_loop(probs_closed, rates, horizons):
    """ref 08:252-289 as oracle (scipy odeint per start index)."""
    def rhs(y, t):
        a, p, f = y
        return [
            -(rates["k_ap"] + rates["k_af"]) * a + rates["k_pa"] * p + rates["k_fa"] * f,
            rates["k_ap"] * a - (rates["k_pa"] + rates["k_pf"]) * p + rates["k_fp"] * f,
            rates["k_af"] * a + rates["k_pf"] * p - (rates["k_fa"] + rates["k_fp"]) * f,
        ]

    max_h = max(horizons)
    out = {h: {"predictions": [], "actuals": []} for h in horizons}
    for i in range(len(probs_closed) - max_h):
        y0 = _reference_prob_to_state(probs_closed[i])
        t = np.linspace(0, max_h, max_h + 1)
        traj = odeint(rhs, y0, t)
        for h in horizons:
            pred = np.clip(traj[h, 2] + 0.5 * traj[h, 1], 0, 1)
            out[h]["predictions"].append(pred)
            out[h]["actuals"].append(probs_closed[i + h])
    return {h: {k: np.asarray(v) for k, v in d.items()} for h, d in out.items()}


def test_multistep_forecast_matches_reference(rng):
    probs = rng.random(40)
    res = multistep_forecast(probs, rates_to_array(DEFAULT_RATES), horizons=(5, 10))
    ref = _reference_forecast_loop(probs, DEFAULT_RATES, (5, 10))
    for h in (5, 10):
        np.testing.assert_allclose(
            res[h]["predictions"], ref[h]["predictions"], atol=2e-5
        )
        np.testing.assert_array_equal(res[h]["actuals"], ref[h]["actuals"])


def test_evaluate_forecasts_metrics():
    res = {5: {"predictions": np.array([0.2, 0.8, 0.6, 0.4]),
               "actuals": np.array([0.1, 0.9, 0.7, 0.3])}}
    m = evaluate_forecasts(res, (5,))[5]
    assert m["accuracy"] == 1.0
    assert m["mae"] == pytest.approx(0.1)
    assert m["correlation"] == pytest.approx(1.0)
    assert m["direction_accuracy"] == 1.0
    assert m["n_samples"] == 4


def test_forecast_too_short_series():
    res = multistep_forecast(np.array([0.5, 0.5]), rates_to_array(DEFAULT_RATES),
                             horizons=(5,))
    assert len(res[5]["predictions"]) == 0
    assert evaluate_forecasts(res, (5,)) == {}


def test_rolling_forecast(rng):
    probs = rng.random(300)
    rows = rolling_forecast_evaluation(probs, rates_to_array(DEFAULT_RATES),
                                       window_size=50, horizon=10)
    assert len(rows) >= 3
    for r in rows:
        assert 0 <= r["accuracy"] <= 1 and r["mae"] >= 0


def test_export_contract(tmp_path, rng):
    import pandas as pd

    from eegflow.analyze.export import (
        export_frames,
        participant_dataframe,
        sample_dataframe,
    )

    n = 60
    lstm_probs = rng.random((n, 2))
    lstm_probs = lstm_probs / lstm_probs.sum(1, keepdims=True)
    three = rng.dirichlet(np.ones(3), n)
    preds = rng.integers(0, 3, n)
    df = sample_dataframe(lstm_probs, three, preds, y_true=rng.integers(0, 2, n),
                          prefix="test_")
    assert list(df.columns) == [
        "Sample_ID", "Prob_EyesOpen", "Prob_Drowsy", "Prob_EyesClosed",
        "LSTM_P_Open", "LSTM_P_Closed", "Predicted_State", "Ground_Truth",
    ]
    assert df["Sample_ID"].iloc[0] == "test_S00001"

    pdf = participant_dataframe(df, n_participants=5)
    assert len(pdf) == 5
    assert pdf["N_Samples"].sum() == n
    assert abs(pdf[["Pct_EyesOpen", "Pct_Drowsy", "Pct_EyesClosed"]].iloc[0].sum()
               - 100) < 1e-9

    written = export_frames(tmp_path, {"sample": df, "participant": pdf})
    assert any(p.endswith(".csv") for p in written["sample"])
    roundtrip = pd.read_csv(written["sample"][0])
    assert len(roundtrip) == n
