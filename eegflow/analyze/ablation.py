"""Architecture ablation + statistical comparison (stage 09).

Reference: 09_sensitivity_analysis.py:265-519. Six configs (Full /
No-Attention / Unidirectional / 1-layer / 2-layer / Minimal), quick-trained
on a <=20k-sample subset for 10 epochs with plain CE + AdamW (lr 1e-3), then
compared against the Full model with McNemar, Cohen's d, and paired t-tests,
plus 1000-draw bootstrap CIs and component-contribution deltas.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eegflow.analyze.evaluate import binary_metrics, bootstrap_ci
from eegflow.analyze.stats import cohens_d, interpret_cohens_d, mcnemar_test, paired_t_test
from eegflow.core.config import ModelConfig
from eegflow.nn.losses import cross_entropy_loss
from eegflow.nn.model import classifier_apply, classifier_init
from eegflow.train.data import batch_iterator
from eegflow.train.loop import predict_probs

ABLATION_CONFIGS: List[Dict[str, object]] = [
    {"name": "Full Model", "bidirectional": True, "use_attention": True, "num_layers": 3},
    {"name": "No Attention", "bidirectional": True, "use_attention": False, "num_layers": 3},
    {"name": "Unidirectional", "bidirectional": False, "use_attention": True, "num_layers": 3},
    {"name": "1 Layer", "bidirectional": True, "use_attention": True, "num_layers": 1},
    {"name": "2 Layers", "bidirectional": True, "use_attention": True, "num_layers": 2},
    {"name": "Minimal", "bidirectional": False, "use_attention": False, "num_layers": 1},
]


def quick_train_evaluate(
    model_cfg: ModelConfig,
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_test: np.ndarray,
    y_test: np.ndarray,
    epochs: int = 10,
    batch_size: int = 512,
    lr: float = 1e-3,
    max_train: int = 20000,
    seed: int = 42,
    bf16: bool = True,
) -> Tuple[Dict[str, float], np.ndarray]:
    """Quick train (plain CE + AdamW) + test metrics (ref 09:265-327)."""
    rng = np.random.default_rng(seed)
    if len(x_train) > max_train:
        idx = rng.choice(len(x_train), max_train, replace=False)
        x_train, y_train = x_train[idx], y_train[idx]

    params = classifier_init(jax.random.key(seed), model_cfg)
    tx = optax.adamw(lr)
    opt_state = tx.init(params)
    compute_dtype = jnp.bfloat16 if bf16 else None

    @jax.jit
    def step(params, opt_state, x, y, key):
        def loss_fn(p):
            logits = classifier_apply(p, x, model_cfg, train=True,
                                      dropout_key=key, compute_dtype=compute_dtype)
            return cross_entropy_loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    root = jax.random.key(seed)
    bs = min(batch_size, max(len(y_train) // 2, 1))
    for epoch in range(epochs):
        order = rng.permutation(len(y_train))
        for b, (xb, yb) in enumerate(batch_iterator(x_train, y_train, bs, order)):
            key = jax.random.fold_in(root, epoch * 10007 + b)
            params, opt_state, _ = step(params, opt_state, jnp.asarray(xb),
                                        jnp.asarray(yb), key)

    probs = predict_probs(params, x_test, model_cfg, batch_size * 2, bf16=bf16)
    preds = probs.argmax(axis=1)
    m = binary_metrics(y_test, preds)
    return (
        {"accuracy": m["accuracy"], "f1": m["f1"], "mcc": m["mcc"]},
        preds,
    )


def run_architecture_ablation(
    x_train, y_train, x_test, y_test,
    input_size: Optional[int] = None,
    hidden_size: int = 256,
    epochs: int = 10,
    max_train: int = 20000,
    configs: Optional[List[Dict[str, object]]] = None,
    bf16: bool = True,
    batch_size: int = 512,
    lr: float = 1e-3,
) -> Tuple[Dict[str, object], Dict[str, np.ndarray]]:
    """All ablation configs -> metrics + per-config test predictions
    (ref 09:330-378)."""
    input_size = input_size or x_train.shape[2]
    results: Dict[str, object] = {}
    predictions: Dict[str, np.ndarray] = {}
    for cfg in configs or ABLATION_CONFIGS:
        model_cfg = ModelConfig(
            input_size=input_size, hidden_size=hidden_size,
            num_layers=int(cfg["num_layers"]), dropout=0.4,
            bidirectional=bool(cfg["bidirectional"]),
            use_attention=bool(cfg["use_attention"]),
        )
        metrics, preds = quick_train_evaluate(
            model_cfg, x_train, y_train, x_test, y_test,
            epochs=epochs, max_train=max_train, bf16=bf16,
            batch_size=batch_size, lr=lr,
        )
        results[str(cfg["name"])] = {
            "config": {k: v for k, v in cfg.items() if k != "name"},
            "metrics": metrics,
        }
        predictions[str(cfg["name"])] = preds
    return results, predictions


def run_statistical_comparison(
    y_test: np.ndarray,
    predictions: Dict[str, np.ndarray],
    reference_name: str = "Full Model",
) -> Dict[str, object]:
    """Each variant vs the Full model: McNemar + Cohen's d + paired t
    (ref 09:381-421)."""
    ref_pred = predictions[reference_name]
    ref_correct = (ref_pred == y_test).astype(np.float64)
    out: Dict[str, object] = {}
    for name, preds in predictions.items():
        if name == reference_name:
            continue
        correct = (preds == y_test).astype(np.float64)
        d = cohens_d(ref_correct, correct)
        out[name] = {
            "mcnemar": mcnemar_test(y_test, ref_pred, preds),
            "cohens_d": d,
            "effect_size": interpret_cohens_d(d),
            "paired_t": paired_t_test(ref_correct, correct),
        }
    return out


def compute_bootstrap_intervals(
    y_test: np.ndarray, predictions: Dict[str, np.ndarray], n_bootstrap: int = 1000
) -> Dict[str, Dict[str, float]]:
    """1000-draw accuracy CI per config (ref 09:464-489)."""
    return {name: bootstrap_ci(y_test, preds, n_bootstrap)
            for name, preds in predictions.items()}


def analyze_component_contribution(
    results: Dict[str, object], reference_name: str = "Full Model"
) -> Dict[str, float]:
    """Full-model accuracy minus each ablated accuracy (ref 09:492-519)."""
    full_acc = results[reference_name]["metrics"]["accuracy"]
    contributions = {}
    mapping = {
        "attention": "No Attention",
        "bidirectional": "Unidirectional",
        "depth": "1 Layer",
    }
    for component, ablated in mapping.items():
        if ablated in results:
            contributions[component] = float(
                full_acc - results[ablated]["metrics"]["accuracy"]
            )
    return contributions
