"""Ablation-runner tests on small separable data."""

import numpy as np
import pytest

from eegflow.analyze.ablation import (
    ABLATION_CONFIGS,
    analyze_component_contribution,
    compute_bootstrap_intervals,
    run_architecture_ablation,
    run_statistical_comparison,
)


@pytest.fixture(scope="module")
def toy(rng):
    n, t, c = 256, 32, 4
    y = (rng.random(n) > 0.5).astype(np.int64)
    x = rng.standard_normal((n, t, c)).astype(np.float32)
    wave = np.sin(2 * np.pi * np.arange(t) / 8.0).astype(np.float32)
    x[y == 1] += 2.0 * wave[None, :, None]
    return x[:192], y[:192], x[192:], y[192:]


@pytest.fixture(scope="module")
def ablation_results(toy):
    x_tr, y_tr, x_te, y_te = toy
    configs = [
        {"name": "Full Model", "bidirectional": True, "use_attention": True, "num_layers": 2},
        {"name": "No Attention", "bidirectional": True, "use_attention": False, "num_layers": 2},
        {"name": "Unidirectional", "bidirectional": False, "use_attention": True, "num_layers": 2},
        {"name": "1 Layer", "bidirectional": True, "use_attention": True, "num_layers": 1},
        {"name": "Minimal", "bidirectional": False, "use_attention": False, "num_layers": 1},
    ]
    return run_architecture_ablation(
        x_tr, y_tr, x_te, y_te, hidden_size=16, epochs=15, configs=configs,
        bf16=False, batch_size=32, lr=3e-3,
    ), y_te


def test_default_configs_match_reference():
    names = [c["name"] for c in ABLATION_CONFIGS]
    assert names == ["Full Model", "No Attention", "Unidirectional",
                     "1 Layer", "2 Layers", "Minimal"]


def test_ablation_runs_and_learns(ablation_results):
    (results, predictions), y_te = ablation_results
    assert set(results) == set(predictions)
    for name, r in results.items():
        assert set(r["metrics"]) == {"accuracy", "f1", "mcc"}
        assert len(predictions[name]) == len(y_te)
    assert results["Full Model"]["metrics"]["accuracy"] > 0.8


def test_statistical_comparison(ablation_results):
    (results, predictions), y_te = ablation_results
    comp = run_statistical_comparison(y_te, predictions)
    assert "Full Model" not in comp
    for name, c in comp.items():
        assert "mcnemar" in c and "cohens_d" in c and "paired_t" in c
        assert 0 <= c["mcnemar"]["p_value"] <= 1


def test_bootstrap_intervals(ablation_results):
    (results, predictions), y_te = ablation_results
    cis = compute_bootstrap_intervals(y_te, predictions, n_bootstrap=200)
    for name, ci in cis.items():
        acc = results[name]["metrics"]["accuracy"]
        assert ci["lower"] - 1e-9 <= acc <= ci["upper"] + 1e-9 or \
            abs(ci["mean"] - acc) < 0.1


def test_component_contributions(ablation_results):
    (results, _), _ = ablation_results
    contrib = analyze_component_contribution(results)
    assert set(contrib) <= {"attention", "bidirectional", "depth"}
    for v in contrib.values():
        assert -1.0 <= v <= 1.0
