"""Evaluation harness + stats toolkit vs sklearn/scipy oracles."""

import numpy as np
import pytest
from scipy import stats as spstats
from sklearn import metrics as skm

from eegflow.analyze import (
    binary_metrics,
    bootstrap_ci,
    cohens_d,
    evaluate_model,
    interpret_cohens_d,
    mcnemar_test,
    paired_t_test,
)
from eegflow.analyze.evaluate import f1_binary, matthews_corrcoef, roc_auc


@pytest.fixture(scope="module")
def preds(rng):
    y_true = (rng.random(500) > 0.4).astype(int)
    y_prob = np.clip(y_true * 0.6 + rng.random(500) * 0.5, 0, 1)
    y_pred = (y_prob > 0.5).astype(int)
    return y_true, y_pred, y_prob


def test_metrics_match_sklearn(preds):
    y_true, y_pred, y_prob = preds
    m = binary_metrics(y_true, y_pred, y_prob)
    assert m["accuracy"] == pytest.approx(skm.accuracy_score(y_true, y_pred))
    assert m["precision"] == pytest.approx(skm.precision_score(y_true, y_pred))
    assert m["recall"] == pytest.approx(skm.recall_score(y_true, y_pred))
    assert m["f1"] == pytest.approx(skm.f1_score(y_true, y_pred))
    assert m["mcc"] == pytest.approx(skm.matthews_corrcoef(y_true, y_pred))
    assert m["auc"] == pytest.approx(skm.roc_auc_score(y_true, y_prob))
    np.testing.assert_array_equal(m["confusion_matrix"],
                                  skm.confusion_matrix(y_true, y_pred))


def test_auc_with_ties(rng):
    y_true = rng.integers(0, 2, 200)
    y_score = rng.integers(0, 5, 200).astype(float)  # heavy ties
    assert roc_auc(y_true, y_score) == pytest.approx(
        skm.roc_auc_score(y_true, y_score)
    )


def test_single_class_guards():
    y = np.ones(10, int)
    m = binary_metrics(y, y, np.ones(10) * 0.9)
    assert np.isnan(m["auc"])  # AUC undefined for single class (ref 03:614-620)
    assert m["accuracy"] == 1.0
    assert f1_binary(np.zeros(5), np.zeros(5)) == 0.0  # no positives
    assert matthews_corrcoef(np.zeros(5), np.zeros(5)) == 0.0


def test_bootstrap_ci_brackets_accuracy(preds):
    y_true, y_pred, _ = preds
    ci = bootstrap_ci(y_true, y_pred)
    acc = (y_true == y_pred).mean()
    assert ci["lower"] <= acc <= ci["upper"]
    assert ci["upper"] - ci["lower"] < 0.15
    # deterministic under seed
    assert bootstrap_ci(y_true, y_pred) == ci


def test_evaluate_model_contract(preds):
    y_true, y_pred, y_prob = preds
    res = evaluate_model(y_true, y_pred, y_prob, model_name="m")
    for key in ("accuracy", "precision", "recall", "f1", "auc", "mcc",
                "confusion_matrix", "accuracy_ci_95", "y_pred", "y_prob"):
        assert key in res
    import json
    json.dumps(res)  # must be JSON-serializable (result-file contract)


def test_cohens_d():
    a = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    b = a + 1.0
    d = cohens_d(b, a)
    assert d == pytest.approx(1.0 / a.std(ddof=1))
    assert interpret_cohens_d(0.1) == "negligible"
    assert interpret_cohens_d(0.3) == "small"
    assert interpret_cohens_d(0.6) == "medium"
    assert interpret_cohens_d(1.2) == "large"


def test_mcnemar_exact_small_discordant():
    y = np.zeros(100, int)
    pred_a = np.zeros(100, int)
    pred_b = np.zeros(100, int)
    pred_b[:5] = 1  # b=5 (A right, B wrong), c=0
    res = mcnemar_test(y, pred_a, pred_b)
    assert res["method"] == "exact" and res["b"] == 5 and res["c"] == 0
    assert res["p_value"] == pytest.approx(min(1.0, 2 * spstats.binom.cdf(0, 5, 0.5)))


def test_mcnemar_chi2_large_discordant():
    y = np.zeros(200, int)
    pred_a = np.zeros(200, int)
    pred_b = np.zeros(200, int)
    pred_a[:10] = 1   # c: A wrong, B right = 10
    pred_b[10:40] = 1  # b: A right, B wrong = 30
    res = mcnemar_test(y, pred_a, pred_b)
    assert res["method"] == "chi2_cc"
    expected_stat = (abs(30 - 10) - 1) ** 2 / 40
    assert res["statistic"] == pytest.approx(expected_stat)
    assert res["p_value"] == pytest.approx(spstats.chi2.sf(expected_stat, 1))


def test_mcnemar_identical_predictions():
    y = np.zeros(50, int)
    res = mcnemar_test(y, y, y)
    assert res["p_value"] == 1.0


def test_paired_t():
    rng = np.random.default_rng(0)
    a = rng.random(100)
    b = a + 0.1 + rng.random(100) * 0.01
    res = paired_t_test(a, b)
    t_ref, p_ref = spstats.ttest_rel(a, b)
    assert res["t_statistic"] == pytest.approx(float(t_ref))
    assert res["p_value"] == pytest.approx(float(p_ref))
