"""Preprocessing: z-score, windowing, subject-wise splits, recording pipeline.

Re-implements the reference's stage-02 semantics (ref 02_preprocessing.py:
134-285) with vectorized/jit-able primitives. Deliberately preserved quirks
(documented, see SURVEY.md §7 "exact-semantics traps"):

* the FIRST training recording's per-channel stats become the global
  normalization parameters reused for every later recording (ref 02:300-311);
* windows are length 256 with step ``int(256*(1-overlap))`` (ref 02:166);
* subject split 70/15/15 with session-then-time fallbacks (ref 02:226-285).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from eegflow.core.config import PreprocessConfig
from eegflow.signal.filters import bandpass_filter


def normalize(
    data: np.ndarray,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
    std_floor: float = 1e-10,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-channel z-score over time (ref 02:134-152).

    ``data (C, T)``; returns (normalized, mean (C,), std (C,)). Pre-computed
    stats are reused when given (val/test use train stats).
    """
    data = np.asarray(data)
    if mean is None:
        mean = np.mean(data, axis=1, keepdims=True)
    else:
        mean = np.asarray(mean).reshape(-1, 1)
    if std is None:
        std = np.std(data, axis=1, keepdims=True)
        std = np.where(std < std_floor, std_floor, std)
    else:
        std = np.asarray(std).reshape(-1, 1)
    return (data - mean) / std, mean.ravel(), std.ravel()


def create_sequences(
    data: np.ndarray, label: int, seq_length: int, overlap: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Overlapping windows (ref 02:155-180): ``(C, T) -> (N, seq_length, C)``.

    Zero-copy via stride tricks, then one transpose — no Python loop.
    """
    data = np.ascontiguousarray(data)
    n_channels, n_samples = data.shape
    step = int(seq_length * (1 - overlap))
    if n_samples < seq_length:
        return (np.empty((0, seq_length, n_channels), data.dtype),
                np.empty((0,), np.int64))
    n_seq = (n_samples - seq_length) // step + 1
    windows = np.lib.stride_tricks.as_strided(
        data,
        shape=(n_channels, n_seq, seq_length),
        strides=(data.strides[0], step * data.strides[1], data.strides[1]),
        writeable=False,
    )
    x = np.ascontiguousarray(windows.transpose(1, 2, 0))  # (N, L, C)
    y = np.full(n_seq, label, dtype=np.int64)
    return x, y


def split_subjects(
    recordings: Sequence[Dict[str, Any]],
    train_frac: float = 0.70,
    val_frac: float = 0.15,
    seed: int = 42,
) -> Dict[str, List[Dict[str, Any]]]:
    """Subject-wise 70/15/15 split with degenerate-data fallbacks (ref 02:226-285).

    <3 subjects -> split by session; <3 sessions -> mark for time-based split
    (handled downstream by carving windows).
    """
    rng = np.random.RandomState(seed)
    subjects = sorted({r["subject"] for r in recordings})

    if len(subjects) >= 3:
        order = list(subjects)
        rng.shuffle(order)
        n_train = max(1, int(len(order) * train_frac))
        n_val = max(1, int(len(order) * val_frac))
        train_s = set(order[:n_train])
        val_s = set(order[n_train : n_train + n_val])
        test_s = set(order[n_train + n_val :])
        if not test_s:  # ensure non-empty test
            test_s = {order[-1]}
            val_s.discard(order[-1])
        return {
            "train": [r for r in recordings if r["subject"] in train_s],
            "val": [r for r in recordings if r["subject"] in val_s],
            "test": [r for r in recordings if r["subject"] in test_s],
        }

    sessions = sorted({(r["subject"], r["session"]) for r in recordings})
    if len(sessions) >= 3:
        order = list(sessions)
        rng.shuffle(order)
        n_train = max(1, int(len(order) * train_frac))
        n_val = max(1, int(len(order) * val_frac))
        train_s = set(order[:n_train])
        val_s = set(order[n_train : n_train + n_val])
        return {
            "train": [r for r in recordings if (r["subject"], r["session"]) in train_s],
            "val": [r for r in recordings if (r["subject"], r["session"]) in val_s],
            "test": [r for r in recordings
                     if (r["subject"], r["session"]) not in train_s | val_s],
        }

    # time-based fallback: all recordings in train; downstream carves windows
    return {"train": list(recordings), "val": [], "test": [], "time_split": True}


def preprocess_recording(
    data: np.ndarray,
    label: int,
    config: PreprocessConfig,
    norm_mean: Optional[np.ndarray] = None,
    norm_std: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Filter -> z-score -> window one recording (ref 02:183-223).

    ``data (C, T)`` in volts. Returns (X (N,L,C), y (N,), mean, std).
    """
    filtered = np.asarray(
        bandpass_filter(
            jnp.asarray(data, jnp.float32),
            config.lowcut, config.highcut, config.sampling_rate,
            config.filter_order, method=config.filter_method,
        )
    )
    normalized, mean, std = normalize(
        filtered, norm_mean, norm_std, std_floor=config.std_floor
    )
    x, y = create_sequences(normalized, label, config.sequence_length, config.overlap)
    return x, y, mean, std


def process_recordings(
    loaded: Dict[str, List[Tuple[Dict[str, Any], np.ndarray]]],
    config: PreprocessConfig,
) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Process pre-split recordings into the stage-02 artifact arrays.

    ``loaded`` maps split -> list of (recording_info, raw (C,T) array).
    The first *train* recording fixes the global normalization stats
    (reference parity, ref 02:300-311).
    """
    norm_mean: Optional[np.ndarray] = None
    norm_std: Optional[np.ndarray] = None
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {
        "sampling_rate": config.sampling_rate,
        "sequence_length": config.sequence_length,
        "overlap": config.overlap,
        "filter": {
            "lowcut": config.lowcut, "highcut": config.highcut,
            "order": config.filter_order, "method": config.filter_method,
        },
        "splits": {},
    }

    for split in ("train", "val", "test"):
        xs, ys, subjects = [], [], []
        for info, raw in loaded.get(split, []):
            x, y, mean, std = preprocess_recording(
                raw, info["label"], config, norm_mean, norm_std
            )
            if split == "train" and norm_mean is None:
                norm_mean, norm_std = mean, std
                meta["normalization"] = {"mean": mean.tolist(), "std": std.tolist()}
            xs.append(x)
            ys.append(y)
            subjects.append(info["subject"])
        if xs:
            arrays[f"X_{split}"] = np.concatenate(xs, axis=0).astype(np.float32)
            arrays[f"y_{split}"] = np.concatenate(ys, axis=0)
        else:
            seq, nch = config.sequence_length, None
            nch = loaded["train"][0][1].shape[0] if loaded.get("train") else 0
            arrays[f"X_{split}"] = np.empty((0, seq, nch), np.float32)
            arrays[f"y_{split}"] = np.empty((0,), np.int64)
        meta["splits"][split] = {
            "n_sequences": int(arrays[f"y_{split}"].shape[0]),
            "subjects": sorted(set(subjects)),
        }
    return arrays, meta
