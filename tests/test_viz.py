"""Figure-battery smoke tests: every plot function renders PNG+PDF files."""

from pathlib import Path

import numpy as np
import pytest

from eegflow.ode import rates_to_array
from eegflow.ode.field import DEFAULT_RATES
from eegflow.viz import (
    plot_ablation_results,
    plot_attention_weights,
    plot_baseline_comparison,
    plot_channel_importance,
    plot_class_distribution,
    plot_comprehensive_comparison,
    plot_coupling_analysis,
    plot_forecasting_results,
    plot_importance_comparison,
    plot_ode_analysis,
    plot_preprocessing_overview,
    plot_sample_timeseries,
    plot_spectral_analysis,
    plot_state_diagram,
    plot_training_history,
    plot_trajectory_examples,
)


def _check(paths):
    assert len(paths) == 2
    for p in paths:
        from pathlib import Path

        assert Path(p).exists() and Path(p).stat().st_size > 1000


def test_all_figures_render(tmp_path, rng):
    _check(plot_class_distribution(
        {"train": rng.integers(0, 2, 100), "test": rng.integers(0, 2, 30)},
        tmp_path / "f1"))

    data = rng.standard_normal((6, 2500)) * 1e-5
    _check(plot_sample_timeseries(data, 500.0, [f"ch{i}" for i in range(6)],
                                  tmp_path / "f2"))

    spectral = {
        "psd": {"freqs": np.linspace(0, 250, 100).tolist(),
                "open": (rng.random(100) + 0.1).tolist(),
                "closed": (rng.random(100) + 0.1).tolist()},
        "bands": {b: {"open": 1.0, "closed": 2.0, "ratio": 2.0}
                  for b in ("delta", "theta", "alpha", "beta", "gamma")},
    }
    _check(plot_spectral_analysis(spectral, tmp_path / "f3"))

    _check(plot_preprocessing_overview(data, data * 0.5, data * 1e5, 500.0,
                                       tmp_path / "f4"))

    results = {"svm": {"accuracy": 0.5, "f1": 0.4, "auc": 0.5,
                       "accuracy_ci_95": [0.45, 0.55]},
               "rf": {"accuracy": 0.6, "f1": 0.55, "auc": 0.62,
                      "accuracy_ci_95": [0.55, 0.65]}}
    _check(plot_baseline_comparison(results, tmp_path / "f5"))

    history = {"train_loss": [1, 0.5], "val_loss": [1, 0.6],
               "train_acc": [0.5, 0.7], "val_acc": [0.5, 0.65],
               "val_f1": [0.4, 0.6], "learning_rates": [1e-4, 3e-4]}
    _check(plot_training_history(history, tmp_path / "f7"))

    attn = rng.random((40, 32))
    attn = attn / attn.sum(1, keepdims=True)
    _check(plot_attention_weights(attn, rng.integers(0, 2, 40), tmp_path / "f8"))

    from eegflow.ode import parameter_sensitivity

    k = rates_to_array(DEFAULT_RATES)
    _check(plot_ode_analysis(np.asarray(k), tmp_path / "f10",
                             parameter_sensitivity(k)))
    _check(plot_state_diagram(DEFAULT_RATES, tmp_path / "f11"))

    sweep = {"0.0": {"accuracy": 0.5, "f1": 0.5, "mcc": 0.0},
             "0.5": {"accuracy": 0.6, "f1": 0.55, "mcc": 0.1}}
    _check(plot_coupling_analysis(sweep, tmp_path / "f13"))

    traj = np.asarray(rng.dirichlet(np.ones(3), (8, 20)))
    probs = rng.random((8, 2))
    _check(plot_trajectory_examples(traj, probs, tmp_path / "f14"))

    imp = {"method": "gradient", "channels": [f"c{i}" for i in range(10)],
           "importance": rng.random(10).tolist()}
    _check(plot_channel_importance(imp, tmp_path / "f16"))

    comparison = {"methods": ["gradient", "permutation"],
                  "channels": [f"c{i}" for i in range(10)],
                  "normalized": rng.random((2, 10)).tolist(),
                  "correlation_matrix": [[1.0, 0.8], [0.8, 1.0]]}
    _check(plot_importance_comparison(comparison, tmp_path / "f19"))

    fr = {5: {"predictions": rng.random(50), "actuals": rng.random(50)}}
    metrics = {5: {"accuracy": 0.6, "mae": 0.2}}
    _check(plot_forecasting_results(fr, metrics, [5], tmp_path / "f23"))

    ab = {"Full Model": {"metrics": {"accuracy": 0.8, "f1": 0.78, "mcc": 0.6},
                         "config": {}},
          "Minimal": {"metrics": {"accuracy": 0.7, "f1": 0.66, "mcc": 0.4},
                      "config": {}}}
    cis = {"Full Model": {"mean": 0.8, "lower": 0.75, "upper": 0.85},
           "Minimal": {"mean": 0.7, "lower": 0.65, "upper": 0.75}}
    _check(plot_ablation_results(ab, cis, tmp_path / "f25"))

    zoo = {"svm": {"accuracy": 0.5, "f1": 0.4, "auc": 0.5, "mcc": 0.0,
                   "accuracy_ci_95": [0.45, 0.55]},
           "lstm": {"accuracy": 0.7, "f1": 0.68, "auc": 0.72, "mcc": 0.4,
                    "accuracy_ci_95": [0.65, 0.75]}}
    _check(plot_comprehensive_comparison(zoo, tmp_path / "f15"))


def test_shap_analysis_figure(tmp_path, rng):
    from eegflow.viz import plot_shap_analysis

    n, c = 40, 12
    names = [f"Ch{i}" for i in range(c - 3)] + ["O1", "Oz", "Fp1"]
    shap_vals = rng.standard_normal((n, c)) * 0.05
    x_explain = rng.standard_normal((n, c))
    grad = np.abs(rng.standard_normal(c))
    paths = plot_shap_analysis(shap_vals, x_explain, names,
                               tmp_path / "fig21_shap", gradient_importance=grad)
    assert all(Path(p).exists() for p in paths)


def test_attention_explainability_figure(tmp_path, rng):
    from eegflow.viz import plot_attention_explainability

    attn = rng.dirichlet(np.ones(32), size=60)
    y = rng.integers(0, 2, 60)
    paths = plot_attention_explainability(attn, y, tmp_path / "fig18_attn")
    assert all(Path(p).exists() for p in paths)


def test_ode_explainability_figure(tmp_path):
    from eegflow.ode.field import DEFAULT_RATES
    from eegflow.viz import plot_ode_explainability

    paths = plot_ode_explainability(DEFAULT_RATES, tmp_path / "fig20_ode")
    assert all(Path(p).exists() for p in paths)


def test_sensitivity_heatmap_figure(tmp_path):
    from eegflow.viz import plot_sensitivity_heatmap

    sens = {f"k_{a}{b}": {"Active": 0.1, "Passive": -0.2, "Fatigued": 0.1}
            for a, b in ("ap", "af", "pa", "pf", "fa", "fp")}
    paths = plot_sensitivity_heatmap(sens, tmp_path / "fig12_sens")
    assert all(Path(p).exists() for p in paths)


def test_region_aggregation():
    from eegflow.viz import CHANNEL_REGIONS, aggregate_by_region, region_of

    assert region_of("O1") == "Occipital"
    assert region_of("Fp1") == "Prefrontal"
    assert region_of("XX") == "Other"
    agg = aggregate_by_region(["O1", "Oz", "Fp1", "XX"], [1.0, 2.0, 3.0, 4.0])
    assert agg["Occipital"] == 3.0 and agg["Prefrontal"] == 3.0 and agg["Other"] == 4.0
    assert sum(len(v) for v in CHANNEL_REGIONS.values()) == 61
