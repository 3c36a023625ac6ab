"""Explainability tests: gradient attribution finds the informative channel,
KernelSHAP recovers exact Shapley values on a linear model, permutation
importance ranks signal channels, attention/ODE analytics contracts."""

import jax
import numpy as np
import pytest

from eegflow.core.config import ModelConfig, TrainConfig
from eegflow.explain import (
    analyze_attention_patterns,
    analyze_ode_dynamics,
    compare_importance_methods,
    gradient_channel_importance,
    kernel_shap_channel_importance,
    kernel_shap_values,
    permutation_channel_importance,
)
from eegflow.train import train_classifier

TOY_CFG = ModelConfig(input_size=4, hidden_size=16, num_layers=1, dropout=0.1)


@pytest.fixture(scope="module")
def trained_toy(rng):
    """Model trained on data where ONLY channel 2 is informative."""
    n, t = 512, 32
    y = (rng.random(n) > 0.5).astype(np.int64)
    x = rng.standard_normal((n, t, 4)).astype(np.float32)
    wave = np.sin(2 * np.pi * np.arange(t) / 8.0).astype(np.float32)
    x[y == 1, :, 2] += 2.5 * wave
    cfg = TrainConfig(epochs=10, batch_size=64, eval_batch_size=128,
                      accumulation_steps=1, learning_rate=3e-3, warmup_epochs=2,
                      patience=10, bf16=False, augment=False)
    res = train_classifier(x[:384], y[:384], x[384:], y[384:], TOY_CFG, cfg,
                           verbose=False)
    assert res.best_val_f1 > 0.8
    return res.params, x, y


def test_gradient_importance_finds_signal_channel(trained_toy):
    params, x, y = trained_toy
    res = gradient_channel_importance(params, TOY_CFG, x, n_samples=64)
    imp = np.asarray(res["importance"])
    assert imp.shape == (4,)
    np.testing.assert_allclose(imp.sum(), 1.0, atol=1e-6)
    assert res["ranking"][0] == "Ch3"  # channel index 2


def test_permutation_importance_finds_signal_channel(trained_toy):
    params, x, y = trained_toy
    res = permutation_channel_importance(params, TOY_CFG, x, y,
                                         n_permutations=3, n_samples=128)
    imp = np.asarray(res["importance"])
    assert np.argmax(imp) == 2
    assert imp[2] > 0.1  # shuffling the signal channel hurts accuracy a lot
    assert abs(res["baseline_accuracy"]) <= 1.0


def test_kernel_shap_exact_on_linear_model(rng):
    """For f(x)=w.x with independent background, exact Shapley values are
    phi_j = w_j (x_j - mean(bg_j)); KernelSHAP must recover them."""
    c = 6
    w = rng.standard_normal(c)
    bg = rng.standard_normal((50, c))
    x = rng.standard_normal((3, c))

    def f(rows):
        return rows @ w

    phi = kernel_shap_values(f, x, bg, nsamples=200, seed=0)
    expected = w[None, :] * (x - bg.mean(0)[None, :])
    np.testing.assert_allclose(phi, expected, atol=0.05, rtol=0.05)


def test_kernel_shap_efficiency_property(rng):
    """sum(phi) == f(x) - E[f(bg)] by construction (local accuracy)."""
    c = 5
    bg = rng.standard_normal((20, c))
    x = rng.standard_normal((2, c))

    def f(rows):
        return np.tanh(rows).sum(axis=1)

    phi = kernel_shap_values(f, x, bg, nsamples=150, seed=1)
    lhs = phi.sum(axis=1)
    rhs = f(x) - f(bg).mean()
    np.testing.assert_allclose(lhs, rhs, atol=1e-8)


def test_kernel_shap_channel_importance_pipeline(trained_toy):
    params, x, y = trained_toy
    res = kernel_shap_channel_importance(
        params, TOY_CFG, x, n_background=20, n_explain=10, nsamples=40,
    )
    imp = np.asarray(res["importance"])
    assert imp.shape == (4,)
    np.testing.assert_allclose(imp.sum(), 1.0, atol=1e-6)
    assert res["shap_values"].shape == (10, 4)


def test_attention_analysis_contract(rng):
    n, t = 100, 16
    logits = rng.standard_normal((n, t))
    attn = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    y = rng.integers(0, 2, n)
    res = analyze_attention_patterns(attn, y)
    assert len(res["mean_attention"]) == t
    assert 0 <= res["entropy"] <= 1
    assert "open_mean" in res and "closed_peak" in res
    # near-uniform attention → entropy near 1
    uniform = np.full((50, t), 1.0 / t)
    assert analyze_attention_patterns(uniform, y[:50])["entropy"] > 0.999


def test_ode_dynamics_interpretation():
    params = {"k_ap": 0.02, "k_af": 0.095, "k_pa": 0.02, "k_pf": 0.626,
              "k_fa": 0.139, "k_fp": 0.02}
    res = analyze_ode_dynamics(params)
    assert res["dominant_pathways"][0]["rate"] == "k_pf"
    assert res["table"]["k_pf"]["time_constant"] == pytest.approx(1 / 0.626)
    assert res["tendency"] == "fatigue"  # recovery 0.179 < fatigue 0.721


def test_compare_importance_methods():
    a = {"method": "gradient", "channels": ["c1", "c2", "c3"],
         "importance": [0.6, 0.3, 0.1]}
    b = {"method": "permutation", "channels": ["c1", "c2", "c3"],
         "importance": [0.5, 0.4, 0.1]}
    res = compare_importance_methods([a, b])
    corr = np.asarray(res["correlation_matrix"])
    assert corr.shape == (2, 2)
    assert corr[0, 1] > 0.9
    assert res["consensus_ranking"][0] == "c1"


def test_kernel_shap_exact_enumeration_matches_brute_force(rng):
    """With the full coalition set, KernelSHAP must equal brute-force Shapley
    values (background-mean value function) to numerical precision."""
    from itertools import combinations
    from math import comb, factorial

    c = 5
    w = rng.standard_normal(c)
    bg = rng.standard_normal((12, c))
    x = rng.standard_normal((2, c))

    def f(rows):
        return np.tanh(rows @ w) + 0.3 * (rows[:, 0] * rows[:, 1])

    def value(sample, members):
        synth = np.tile(bg, (1, 1)).copy()
        synth[:, list(members)] = sample[list(members)]
        return f(synth).mean()

    def brute_shapley(sample):
        phi = np.zeros(c)
        for j in range(c):
            others = [k for k in range(c) if k != j]
            for s in range(c):
                for subset in combinations(others, s):
                    weight = factorial(s) * factorial(c - s - 1) / factorial(c)
                    phi[j] += weight * (value(sample, subset + (j,))
                                        - value(sample, subset))
        return phi

    # 2^5 - 2 = 30 coalitions <= budget -> exact enumeration path
    got = kernel_shap_values(f, x, bg, nsamples=64, seed=0)
    for i in range(2):
        np.testing.assert_allclose(got[i], brute_shapley(x[i]), atol=1e-8)


def test_stratified_coalitions_budget_and_weights():
    from math import comb

    from eegflow.explain.kernelshap import _stratified_coalitions

    rng = np.random.RandomState(0)
    c, budget = 12, 200
    z, w = _stratified_coalitions(rng, c, budget)
    assert len(z) == budget and len(w) == budget
    sizes = z.sum(axis=1).astype(int)
    # strata (1, 11) and (2, 10) fit in 200 (12+12+66+66=156) and must be
    # complete with exact kernel weights
    for s in (1, 11, 2, 10):
        n_s = int((sizes == s).sum())
        assert n_s >= comb(c, s), (s, n_s)
        expected = (c - 1) / (s * (c - s))
        got = w[sizes == s]
        assert np.allclose(sorted(got)[: comb(c, s)], expected) or np.allclose(
            got.min(), expected)
    # every mask non-trivial
    assert sizes.min() >= 1 and sizes.max() <= c - 1


def test_stratified_kernel_shap_close_to_exact():
    """On a linear model, stratified-budget SHAP ~= exact Shapley values."""
    from eegflow.explain.kernelshap import kernel_shap_values

    rng = np.random.default_rng(0)
    c = 12
    coefs = rng.standard_normal(c)

    def f(rows):
        return rows @ coefs

    bg = rng.standard_normal((20, c))
    xs = rng.standard_normal((4, c))
    # linear model: exact Shapley value is coef * (x - E[bg])
    exact = coefs[None, :] * (xs - bg.mean(0, keepdims=True))
    approx = kernel_shap_values(f, xs, bg, nsamples=300, seed=1)
    np.testing.assert_allclose(approx, exact, atol=1e-6)


def test_build_summary_reference_fields():
    """Summary carries the reference's region shares + clinical insights
    (ref 07_explainability.py:1207-1273)."""
    from eegflow.explain import build_summary

    chans = ["O1", "O2", "Oz", "F3", "P7", "Cz"]
    imp = [0.3, 0.2, 0.1, 0.15, 0.15, 0.1]
    order = list(np.argsort(imp)[::-1])
    grad = {"method": "gradient", "channels": chans, "importance": imp,
            "ranking": [chans[i] for i in order]}
    perm = {"method": "permutation", "channels": chans,
            "importance": imp[::-1],
            "ranking": [chans[i] for i in np.argsort(imp)]}
    comparison = compare_importance_methods([grad, perm])
    attn = analyze_attention_patterns(
        np.full((8, 16), 1 / 16.0), np.array([0, 1] * 4))
    ode = analyze_ode_dynamics(
        {"k_ap": 0.02, "k_af": 0.095, "k_pa": 0.02, "k_pf": 0.626,
         "k_fa": 0.139, "k_fp": 0.02})

    res = build_summary(grad, perm, comparison,
                        attention_analysis=attn, ode_analysis=ode, shap=None)
    gb = res["channel_importance"]["gradient_based"]
    assert gb["top_3_channels"] == ["O1", "O2", "F3"]
    assert gb["occipital_importance"] == pytest.approx(0.6)  # O1+O2+Oz
    assert gb["frontal_importance"] == pytest.approx(0.15)   # F3
    assert gb["parietal_importance"] == pytest.approx(0.15)  # P7
    assert gb["region_shares"]["Central"] == pytest.approx(0.1)
    assert "permutation_based" in res["channel_importance"]
    # balance < 1 here -> the fatigue-dominance sentence (ref 07:1233-1237)
    assert "Fatigue processes dominate" in res["clinical_insights"]["state_dynamics"]
    assert "O1" in res["clinical_insights"]["primary_indicators"]
    assert res["explainability_methods"] == ["gradient", "permutation"]
    assert res["attention_patterns"]["entropy"] == pytest.approx(1.0)

    shap = dict(grad, method="kernel_shap")
    res2 = build_summary(grad, perm, comparison, shap=shap)
    assert res2["explainability_methods"] == ["gradient", "permutation", "shap"]
    assert res2["channel_importance"]["shap_based"]["occipital_importance"] == \
        pytest.approx(0.6)
    # no ODE analysis -> no state_dynamics claim rather than a wrong one
    assert "state_dynamics" not in res2["clinical_insights"]
