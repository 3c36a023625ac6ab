"""Tables / model-zoo merge / residual block / forecasting-helper tests."""

import jax
import jax.numpy as jnp
import numpy as np

from eegflow.analyze.forecast import create_sequences_for_forecasting
from eegflow.analyze.tables import (
    create_results_tables,
    format_ablation_table,
    format_results_table,
    format_statistical_table,
    merge_all_model_results,
)
from eegflow.nn.layers import residual_block_apply, residual_block_init


def test_merge_all_model_results():
    baselines = {"svm": {"accuracy": 0.5, "f1": 0.4, "auc": 0.5, "mcc": 0.0,
                         "accuracy_ci_95": [0.45, 0.55]}}
    lstm = {"accuracy": 0.7, "f1": 0.68, "auc": 0.75, "mcc": 0.4,
            "accuracy_ci_95": [0.65, 0.75]}
    integ = {"evaluation": {"accuracy": 0.71, "f1": 0.69, "auc": 0.74,
                            "mcc": 0.41, "accuracy_ci_95": [0.66, 0.76]}}
    merged = merge_all_model_results(baselines, lstm, integ)
    assert set(merged) == {"svm", "lstm_attention", "lstm_ode_integration"}
    assert merged["lstm_ode_integration"]["accuracy"] == 0.71


def test_format_results_table_handles_missing():
    table = format_results_table({"m1": {"accuracy": 0.5, "f1": None,
                                         "auc": float("nan"), "mcc": 0.1}})
    assert "m1" in table and "0.5000" in table and "—" in table


def test_ablation_and_stat_tables():
    ab = {"Full Model": {"config": {"bidirectional": True, "use_attention": True,
                                    "num_layers": 3},
                         "metrics": {"accuracy": 0.9, "f1": 0.89, "mcc": 0.8}}}
    t1 = format_ablation_table(ab)
    assert "Full Model" in t1 and "0.9000" in t1
    comp = {"No Attention": {"mcnemar": {"p_value": 0.03, "method": "exact"},
                             "cohens_d": 0.4, "effect_size": "small",
                             "paired_t": {"p_value": 0.05}}}
    t2 = format_statistical_table(comp)
    assert "No Attention" in t2 and "exact" in t2
    assert len(create_results_tables({"m": {"accuracy": 1.0}}, ab, comp)) == 3


def test_residual_block():
    params = residual_block_init(jax.random.key(0), 16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)), jnp.float32)
    out = residual_block_apply(params, x)
    assert out.shape == x.shape
    # LayerNorm output: zero mean, unit variance per row
    np.testing.assert_allclose(np.asarray(out).mean(-1), 0.0, atol=1e-5)
    # train mode with dropout differs from eval
    out_tr = residual_block_apply(params, x, rate=0.5, key=jax.random.key(1),
                                  train=True)
    assert not np.allclose(np.asarray(out), np.asarray(out_tr))


def test_create_sequences_for_forecasting():
    probs = np.stack([np.linspace(1, 0, 20), np.linspace(0, 1, 20)], axis=1)
    y = (np.arange(20) >= 10).astype(int)
    seqs, labels, future = create_sequences_for_forecasting(probs, y, window_size=5)
    assert seqs.shape == (15, 5) and labels.shape == (15, 5) and future.shape == (15,)
    np.testing.assert_allclose(seqs[0], probs[:5, 1])
    assert future[0] == y[5]
    # too-short series
    s, l, f = create_sequences_for_forecasting(probs[:3], y[:3], window_size=5)
    assert len(s) == 0
