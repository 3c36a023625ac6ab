"""Permutation channel importance (ref 07_explainability.py:287-361).

Per channel: shuffle that channel's values across samples (n_permutations
repeats) and record the accuracy drop vs baseline. Inference is jitted and
batched; the permuted copies for all repeats of one channel are evaluated as
one stacked batch.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from eegflow.core.config import ModelConfig
from eegflow.train.loop import predict_probs
from eegflow.train.steps import make_eval_step


def permutation_channel_importance(
    params,
    model_cfg: ModelConfig,
    x: np.ndarray,
    y: np.ndarray,
    n_permutations: int = 5,
    n_samples: int = 1000,
    batch_size: int = 5120,
    seed: int = 42,
    channel_names: Optional[Sequence[str]] = None,
    mesh=None,
) -> Dict[str, object]:
    """``mesh`` shards every stacked-permutation batch over the mesh's data
    axis (61 channels x 5 repeats of jitted inference is an explainability
    cost center, SURVEY §2.6/§5)."""
    rng = np.random.RandomState(seed)
    if len(x) > n_samples:
        idx = rng.choice(len(x), n_samples, replace=False)
        x, y = x[idx], y[idx]
    n = len(x)
    n_channels = x.shape[2]
    eval_step = make_eval_step(model_cfg)

    def predictions(data: np.ndarray) -> np.ndarray:
        probs = predict_probs(params, data, model_cfg, batch_size,
                              eval_step=eval_step, mesh=mesh)
        return probs.argmax(1)

    baseline_acc = float((predictions(x) == y).mean())

    importance = []
    for ch in range(n_channels):
        # all repeats of this channel evaluate as ONE stacked batch
        stacked = np.tile(x, (n_permutations, 1, 1))
        for r in range(n_permutations):
            perm = rng.permutation(n)
            stacked[r * n : (r + 1) * n, :, ch] = x[perm, :, ch]
        preds = predictions(stacked).reshape(n_permutations, n)
        accs = (preds == y[None, :]).mean(axis=1)
        importance.append(float(np.mean(baseline_acc - accs)))

    names = list(channel_names) if channel_names else [
        f"Ch{i+1}" for i in range(n_channels)
    ]
    order = np.argsort(-np.asarray(importance))
    return {
        "channels": names,
        "importance": importance,
        "baseline_accuracy": baseline_acc,
        "ranking": [names[i] for i in order],
        "method": "permutation",
    }
