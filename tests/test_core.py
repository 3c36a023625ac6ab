"""Core-module tests: config tree round-trip, artifact store contracts,
PRNG streams, timing registry."""

import json

import jax
import numpy as np
import pytest

from eegflow.core.artifacts import (
    load_checkpoint,
    load_processed,
    save_checkpoint,
    save_processed,
    save_results,
    load_results,
)
from eegflow.core.config import ModelConfig, ODEConfig, PipelineConfig, TrainConfig
from eegflow.core.prng import KeyRing, key_chain, seed_everything
from eegflow.core.timing import Timer, timed


def test_config_roundtrip_json(tmp_path):
    cfg = PipelineConfig(
        model=ModelConfig(input_size=32, hidden_size=64),
        train=TrainConfig(epochs=7, lstm_impl="pallas"),
        ode=ODEConfig(de_maxiter=5),
    )
    path = tmp_path / "cfg.json"
    cfg.to_json(path)
    restored = PipelineConfig.from_json(path)
    assert restored == cfg
    assert restored.ode.bounds == cfg.ode.bounds  # tuples survive round-trip
    assert restored.model.resolved_hidden() == 64


def test_config_defaults_match_reference():
    cfg = PipelineConfig()
    assert cfg.preprocess.sequence_length == 256
    assert cfg.preprocess.overlap == 0.5
    assert cfg.preprocess.lowcut == 1.0 and cfg.preprocess.highcut == 45.0
    assert cfg.train.batch_size == 512 and cfg.train.accumulation_steps == 4
    assert cfg.train.patience == 15 and cfg.train.warmup_epochs == 5
    assert cfg.ode.rates()["k_ap"] == 0.1
    assert cfg.coupling.coupling_strength == 0.5


def test_processed_archive_roundtrip(tmp_path, rng):
    arrays = {
        "X_train": rng.standard_normal((10, 16, 4)).astype(np.float32),
        "y_train": rng.integers(0, 2, 10),
    }
    meta = {"sampling_rate": 500.0, "note": np.float64(1.5)}
    npz = save_processed(tmp_path, arrays, meta)
    loaded, meta2 = load_processed(npz)
    np.testing.assert_array_equal(loaded["X_train"], arrays["X_train"])
    assert meta2["sampling_rate"] == 500.0
    assert isinstance(meta2["note"], float)  # numpy scalars JSON-ified


def test_checkpoint_roundtrip_nested_pytree(tmp_path):
    from eegflow.nn.model import classifier_init

    cfg = ModelConfig(input_size=4, hidden_size=8, num_layers=2)
    params = classifier_init(jax.random.key(0), cfg)
    save_checkpoint(tmp_path / "ckpt", params, cfg,
                    history={"val_f1": [0.5, 0.6]}, extra={"note": "x"})
    params2, cfg2, history, extra = load_checkpoint(tmp_path / "ckpt")
    assert cfg2 == cfg
    assert history["val_f1"] == [0.5, 0.6]
    assert extra["note"] == "x"
    # structure restored: lstm is a list of per-layer dicts
    assert isinstance(params2["lstm"], list) and len(params2["lstm"]) == 2
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_results_json(tmp_path):
    res = {"acc": np.float32(0.5), "cm": np.array([[1, 2], [3, 4]])}
    p = save_results(tmp_path / "r.json", res)
    loaded = load_results(p)
    assert loaded["acc"] == 0.5 and loaded["cm"] == [[1, 2], [3, 4]]


def test_prng_streams_deterministic():
    root = seed_everything(42)
    ring1 = KeyRing(root)
    ring2 = KeyRing(root)
    a1, a2 = ring1("dropout"), ring1("dropout")
    b1 = ring2("dropout")
    assert jax.random.bits(a1) == jax.random.bits(b1)  # same stream, same seq
    assert jax.random.bits(a1) != jax.random.bits(a2)  # advances within stream
    chain = key_chain(root)
    k1, k2 = next(chain), next(chain)
    assert jax.random.bits(k1) != jax.random.bits(k2)


def test_timer_registry():
    timer = Timer()

    @timed("work", timer)
    def work():
        return 1

    work()
    work()
    s = timer.summary()["work"]
    assert s["count"] == 2 and s["total_s"] >= 0


def test_checkpoint_orbax_backend(tmp_path):
    from eegflow.nn.model import classifier_init

    cfg = ModelConfig(input_size=4, hidden_size=8, num_layers=1)
    params = classifier_init(jax.random.key(1), cfg)
    save_checkpoint(tmp_path / "ckpt_orbax", params, cfg, backend="orbax")
    params2, cfg2, _, _ = load_checkpoint(tmp_path / "ckpt_orbax")
    assert cfg2 == cfg
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_periodic_checkpoint(tmp_path, rng):
    from eegflow.core.config import TrainConfig
    from eegflow.train import train_classifier

    cfg_m = ModelConfig(input_size=3, hidden_size=8, num_layers=1, dropout=0.0)
    cfg_t = TrainConfig(epochs=4, batch_size=16, eval_batch_size=32,
                        accumulation_steps=1, warmup_epochs=1, patience=10,
                        bf16=False, augment=False)
    x = rng.standard_normal((64, 16, 3)).astype(np.float32)
    y = rng.integers(0, 2, 64)
    res = train_classifier(x[:48], y[:48], x[48:], y[48:], cfg_m, cfg_t,
                           verbose=False, checkpoint_dir=tmp_path / "snap",
                           checkpoint_every=2)
    params2, _, hist, extra = load_checkpoint(tmp_path / "snap")
    assert extra["resumable"] is True
    assert extra["epoch"] in (2, 4)


def test_train_resume_matches_uninterrupted(tmp_path, rng):
    """Interrupt at epoch 2 of 4, resume, and match the uninterrupted run."""
    import dataclasses

    from eegflow.core.config import TrainConfig
    from eegflow.train import train_classifier

    cfg_m = ModelConfig(input_size=3, hidden_size=8, num_layers=1, dropout=0.0)
    base = TrainConfig(epochs=4, batch_size=16, eval_batch_size=32,
                       accumulation_steps=1, warmup_epochs=1, patience=10,
                       bf16=False, augment=False)
    x = rng.standard_normal((96, 16, 3)).astype(np.float32)
    y = (x[:, :, 0].mean(1) > 0).astype(np.int64)
    args = (x[:48], y[:48], x[48:], y[48:], cfg_m)

    full = train_classifier(*args, base, verbose=False)

    half_cfg = dataclasses.replace(base, epochs=2)
    train_classifier(*args, half_cfg, verbose=False,
                     checkpoint_dir=tmp_path / "snap", checkpoint_every=2)
    resumed = train_classifier(*args, base, verbose=False,
                               resume_from=tmp_path / "snap")

    assert resumed.epochs_run == 4
    assert len(resumed.history["val_f1"]) == 4
    np.testing.assert_allclose(resumed.history["val_f1"],
                               full.history["val_f1"], atol=1e-5)
    np.testing.assert_allclose(resumed.history["train_loss"],
                               full.history["train_loss"], atol=1e-4)


def test_metrics_registry():
    from eegflow.core.registry import available_metrics, compute_metrics, get_metric

    y_true = np.array([0, 1, 1, 0, 1])
    y_pred = np.array([0, 1, 0, 0, 1])
    y_prob = np.array([0.1, 0.9, 0.4, 0.2, 0.8])
    out = compute_metrics(["accuracy", "f1", "auc", "mcc"], y_true, y_pred, y_prob)
    assert out["accuracy"] == 0.8
    assert 0 < out["f1"] <= 1 and 0 <= out["auc"] <= 1
    assert "precision" in available_metrics()
    import pytest as _pytest
    with _pytest.raises(KeyError):
        get_metric("nope")


def test_restore_lists_only_converts_exact_ranges():
    from eegflow.core.artifacts import _restore_lists

    # exact {"0".."n-1"} -> list
    assert _restore_lists({"0": 1, "1": 2, "2": 3}) == [1, 2, 3]
    # sparse digit keys stay a dict (used to raise KeyError)
    assert _restore_lists({"0": 1, "2": 3}) == {"0": 1, "2": 3}
    # non-zero-based digit keys stay a dict (used to be silently converted)
    assert _restore_lists({"1": "a", "2": "b"}) == {"1": "a", "2": "b"}
    # nested inside history-like payloads
    out = _restore_lists({"hist": {"0": 1.0, "1": 2.0}, "epochs": {"3": "x"}})
    assert out == {"hist": [1.0, 2.0], "epochs": {"3": "x"}}


def test_orbax_sharded_checkpoint_roundtrip(tmp_path, rng, eight_device_mesh):
    """Sharded TrainState-like pytree survives an orbax round trip with its
    shardings intact (the multi-chip checkpointing path, SURVEY §5)."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = eight_device_mesh
    data = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    sharded = jax.device_put(data, NamedSharding(mesh, P("data")))
    replicated = jax.device_put(jnp.arange(9.0).reshape(3, 3),
                                NamedSharding(mesh, P()))
    tree = {"params": {"w": replicated}, "batch_stats": sharded}

    ckptr = ocp.StandardCheckpointer()
    ckptr.save((tmp_path / "ck").absolute(), tree, force=True)
    ckptr.wait_until_finished()

    target = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
        tree)
    restored = ckptr.restore((tmp_path / "ck").absolute(), target=target)
    assert restored["batch_stats"].sharding.is_equivalent_to(
        sharded.sharding, sharded.ndim)
    assert restored["params"]["w"].sharding.is_equivalent_to(
        replicated.sharding, replicated.ndim)
    np.testing.assert_array_equal(np.asarray(restored["batch_stats"]),
                                  np.asarray(data))
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(replicated))
