"""Artifact store: processed-data archives, model checkpoints, result JSONs.

Mirrors the reference's on-disk contract — ``processed_sequences.npz`` +
``preprocessing_metadata.json`` (ref 02_preprocessing.py:393-414), a model
checkpoint embedding its architectural config and training history
(ref 04_lstm_model.py:921-933), and per-stage JSON result files — but stores
params as a JAX pytree (msgpack via flax.serialization) instead of a torch
state dict. Every downstream stage reconstructs models from the embedded
config, which is the serialization contract.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import numpy as np

from eegflow.core.config import ModelConfig


# ---------------------------------------------------------------------------
# processed-data archive (stage 02 contract)
# ---------------------------------------------------------------------------

SPLIT_KEYS = ("X_train", "y_train", "X_val", "y_val", "X_test", "y_test")


def save_processed(
    out_dir: str | Path,
    arrays: Dict[str, np.ndarray],
    metadata: Dict[str, Any],
    name: str = "processed_sequences",
) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    npz_path = out_dir / f"{name}.npz"
    np.savez_compressed(npz_path, **arrays)
    (out_dir / "preprocessing_metadata.json").write_text(
        json.dumps(_jsonable(metadata), indent=2)
    )
    return npz_path


def load_processed(
    path: str | Path, mmap: bool = True
) -> Tuple[Dict[str, np.ndarray], Optional[Dict[str, Any]]]:
    """Load the processed archive (+ metadata if present).

    ``mmap`` loads lazily like the reference's fast path (ref 03:71-104);
    compressed archives fall back to eager load.
    """
    path = Path(path)
    data = np.load(path, mmap_mode="r" if mmap else None, allow_pickle=False)
    arrays = {k: data[k] for k in data.files}
    meta_path = path.parent / "preprocessing_metadata.json"
    metadata = json.loads(meta_path.read_text()) if meta_path.exists() else None
    return arrays, metadata


# ---------------------------------------------------------------------------
# model checkpoint (stage 04 contract)
# ---------------------------------------------------------------------------


def save_checkpoint(
    path: str | Path,
    params: Any,
    model_config: ModelConfig,
    history: Optional[Dict[str, Any]] = None,
    extra: Optional[Dict[str, Any]] = None,
    backend: str = "msgpack",
) -> Path:
    """Save params pytree + config + history to a checkpoint directory.

    ``backend='msgpack'`` (flax serialization, single file) or ``'orbax'``
    (orbax.checkpoint PyTree handler — the production TPU checkpointing
    stack, async-capable and sharding-aware for multi-chip runs).
    """
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    params = jax_to_numpy(params)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save((path / "orbax").absolute(), params, force=True)
        ckptr.wait_until_finished()
    else:
        from flax import serialization

        (path / "params.msgpack").write_bytes(serialization.to_bytes(params))
    cfg = {f: getattr(model_config, f) for f in model_config.__dataclass_fields__}
    payload = {"model_config": cfg, "history": _jsonable(history or {}),
               "extra": _jsonable(extra or {}), "backend": backend,
               # model-family tag: classifier_init/apply dispatch on the
               # config TYPE, so the checkpoint must round-trip it
               "model_type": type(model_config).__name__}
    (path / "checkpoint.json").write_text(json.dumps(payload, indent=2))
    return path


def load_checkpoint(path: str | Path, params_template: Any = None):
    """Load (params, ModelConfig, history, extra) from a checkpoint directory.

    If ``params_template`` is None the raw msgpack dict-of-arrays is returned
    (flax state-dict form); with a template the exact pytree structure is
    restored.
    """
    from flax import serialization

    path = Path(path)
    payload = json.loads((path / "checkpoint.json").read_text())
    from eegflow.core.config import TransformerConfig

    cfg_cls = {"ModelConfig": ModelConfig,
               "TransformerConfig": TransformerConfig}[
        payload.get("model_type", "ModelConfig")]
    cfg = cfg_cls(**payload["model_config"])
    if payload.get("backend") == "orbax":
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        params = ckptr.restore((path / "orbax").absolute(),
                               target=params_template)
        if params_template is None:
            params = _restore_lists(params)
    else:
        raw = (path / "params.msgpack").read_bytes()
        if params_template is None:
            params = _restore_lists(serialization.msgpack_restore(raw))
        else:
            params = serialization.from_bytes(params_template, raw)
    return params, cfg, payload.get("history", {}), payload.get("extra", {})


def _restore_lists(tree: Any) -> Any:
    """msgpack stores Python lists as {"0": ..., "1": ...} dicts; undo that so
    restored params match the init-time pytree structure."""
    if isinstance(tree, dict):
        restored = {k: _restore_lists(v) for k, v in tree.items()}
        keys = set(restored.keys())
        # only convert when the keys are exactly {"0"..."n-1"} — a user dict
        # that merely happens to have digit keys (or sparse ones) stays a dict
        if keys and keys == {str(i) for i in range(len(keys))}:
            return [restored[str(i)] for i in range(len(keys))]
        return restored
    return tree


# ---------------------------------------------------------------------------
# result JSONs (per-stage contract, ref outputs/results/*.json)
# ---------------------------------------------------------------------------


def save_results(path: str | Path, results: Dict[str, Any]) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(_jsonable(results), indent=2))
    return path


def load_results(path: str | Path) -> Dict[str, Any]:
    return json.loads(Path(path).read_text())


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def jax_to_numpy(tree: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _jsonable(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {str(k): _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.bool_,)):
        return bool(obj)
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            return obj
    return obj
