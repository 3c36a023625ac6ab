"""Training-stack tests: schedule parity, sampling/augmentation semantics,
end-to-end learning on separable synthetic data, 8-device mesh sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegflow.core.config import ModelConfig, TrainConfig
from eegflow.train import (
    augment_data,
    class_weight_array,
    make_data_mesh,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train_classifier,
    warmup_cosine_schedule,
    weighted_epoch_indices,
)
from eegflow.train.data import padded_eval_batches
from eegflow.train.loop import predict_probs
from eegflow.train.mesh import make_spmd_train_step, replicate_to_mesh, shard_batch
from eegflow.train.schedule import lr_trace
from eegflow.train.steps import TrainState


def _toy_data(rng, n=256, t=32, c=4):
    """Separable: class 1 has a strong 8-sample sine; class 0 is noise."""
    y = (rng.random(n) > 0.5).astype(np.int64)
    x = rng.standard_normal((n, t, c)).astype(np.float32)
    wave = np.sin(2 * np.pi * np.arange(t) / 8.0).astype(np.float32)
    x[y == 1] += 2.0 * wave[None, :, None]
    return x, y


TOY_MODEL = ModelConfig(input_size=4, hidden_size=16, num_layers=1, dropout=0.1)
TOY_TRAIN = TrainConfig(
    epochs=12, batch_size=32, eval_batch_size=64, accumulation_steps=1,
    learning_rate=3e-3, warmup_epochs=2, patience=10, bf16=False, augment=False,
)


def test_lr_trace_matches_reference_lambda():
    base, epochs, warm = 3e-4, 100, 5
    trace = lr_trace(base, epochs, warm)
    for e in [0, 1, 4, 5, 50, 99]:
        if e < warm:
            expected = base * (e + 1) / warm
        else:
            expected = base * 0.5 * (1 + np.cos(np.pi * (e - warm) / (epochs - warm)))
        assert trace[e] == pytest.approx(expected)


def test_schedule_fn_matches_trace():
    sched = warmup_cosine_schedule(3e-4, 100, 5, updates_per_epoch=7)
    trace = lr_trace(3e-4, 100, 5)
    for e in [0, 3, 5, 42]:
        assert float(sched(e * 7)) == pytest.approx(trace[e], rel=1e-6)
        assert float(sched(e * 7 + 6)) == pytest.approx(trace[e], rel=1e-6)


def test_class_weight_array_reference_semantics():
    y = np.array([0] * 90 + [1] * 10)
    w = class_weight_array(y)
    expected = np.array([1 / 90, 1 / 10])
    expected = expected / expected.sum() * 2
    np.testing.assert_allclose(w, expected, rtol=1e-6)


def test_weighted_sampling_balances_classes(rng):
    y = np.array([0] * 900 + [1] * 100)
    idx = weighted_epoch_indices(y, rng)
    assert len(idx) == len(y)
    frac_minority = (y[idx] == 1).mean()
    assert 0.42 < frac_minority < 0.58


def test_augment_data_3x(rng):
    x = rng.standard_normal((10, 16, 3)).astype(np.float32)
    y = rng.integers(0, 2, 10)
    xa, ya = augment_data(x, y, rng, noise_std=0.05, max_shift=5)
    assert xa.shape == (30, 16, 3) and ya.shape == (30,)
    np.testing.assert_array_equal(xa[:10], x)          # originals
    np.testing.assert_array_equal(ya, np.tile(y, 3))
    noise_delta = np.abs(xa[10:20] - x)
    assert 0 < noise_delta.mean() < 0.2                # noise copy
    # shifted copy: every sample is a circular roll of the original
    for i in range(10):
        diffs = [np.abs(np.roll(x[i], s, axis=0) - xa[20 + i]).max()
                 for s in range(-5, 6)]
        assert min(diffs) < 1e-6


def test_padded_eval_batches_mask():
    x = np.arange(10 * 2 * 3, dtype=np.float32).reshape(10, 2, 3)
    y = np.arange(10)
    batches = list(padded_eval_batches(x, y, 4))
    assert len(batches) == 3
    assert batches[-1][0].shape == (4, 2, 3)
    assert batches[-1][2].sum() == 2  # last batch has 2 valid
    recon = np.concatenate([b[1][b[2]] for b in batches])
    np.testing.assert_array_equal(recon, y)


def test_train_step_decreases_loss(rng):
    x, y = _toy_data(rng)
    tx = make_optimizer(TOY_TRAIN, updates_per_epoch=8)
    from eegflow.nn.model import classifier_init

    params = classifier_init(jax.random.key(0), TOY_MODEL)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step = make_train_step(TOY_MODEL, TOY_TRAIN, tx, donate=False)
    losses = []
    for i in range(20):
        xb = jnp.asarray(x[(i % 8) * 32 : (i % 8 + 1) * 32])
        yb = jnp.asarray(y[(i % 8) * 32 : (i % 8 + 1) * 32])
        state, m = step(state, xb, yb, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_classifier_learns_separable(rng):
    x, y = _toy_data(rng, n=512)
    res = train_classifier(x[:384], y[:384], x[384:], y[384:], TOY_MODEL, TOY_TRAIN,
                           verbose=False)
    assert res.best_val_f1 > 0.9
    assert set(res.history) >= {"train_loss", "val_loss", "train_acc", "val_acc",
                                "val_f1", "learning_rates"}
    assert res.epochs_run <= TOY_TRAIN.epochs
    probs = predict_probs(res.params, x[384:], TOY_MODEL, batch_size=64, bf16=False)
    acc = (probs.argmax(1) == y[384:]).mean()
    assert acc > 0.9


def test_early_stopping_triggers(rng):
    x, y = _toy_data(rng, n=128)
    cfg = TrainConfig(epochs=30, batch_size=32, eval_batch_size=64,
                      accumulation_steps=1, learning_rate=0.0,  # frozen → no improvement
                      warmup_epochs=1, patience=3, bf16=False, augment=False)
    res = train_classifier(x[:96], y[:96], x[96:], y[96:], TOY_MODEL, cfg,
                           verbose=False)
    assert res.epochs_run <= 1 + 3 + 1  # first epoch sets best, then patience


def test_sharded_train_step_8_devices(rng, eight_device_mesh):
    mesh = eight_device_mesh
    x, y = _toy_data(rng, n=64)
    tx = make_optimizer(TOY_TRAIN, updates_per_epoch=1)
    from eegflow.nn.model import classifier_init

    params = classifier_init(jax.random.key(0), TOY_MODEL)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(TOY_MODEL, TOY_TRAIN, tx, mesh=mesh, donate=False)
    xb, yb = shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
    state2, m = step(state, xb, yb, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    # parity with single-device step on the same inputs
    state_s = TrainState(params, tx.init(params), jnp.asarray(0))
    step_s = make_train_step(TOY_MODEL, TOY_TRAIN, tx, donate=False)
    _, m_s = step_s(state_s, jnp.asarray(x), jnp.asarray(y), jax.random.key(0))
    assert float(m["loss"]) == pytest.approx(float(m_s["loss"]), rel=1e-4)


def test_spmd_explicit_train_step(rng, eight_device_mesh):
    mesh = eight_device_mesh
    x, y = _toy_data(rng, n=64)
    tx = make_optimizer(TOY_TRAIN, updates_per_epoch=1)
    from eegflow.nn.model import classifier_init

    params = classifier_init(jax.random.key(0), TOY_MODEL)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step = make_spmd_train_step(TOY_MODEL, TOY_TRAIN, tx, mesh)
    state2, m = step(state, jnp.asarray(x), jnp.asarray(y), jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert int(m["correct"]) <= len(y)
    # params actually changed
    changed = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree_util.tree_leaves(changed)) > 0


def test_train_with_mesh_end_to_end(rng, eight_device_mesh):
    x, y = _toy_data(rng, n=256)
    cfg = TrainConfig(epochs=4, batch_size=64, eval_batch_size=64,
                      accumulation_steps=1, learning_rate=3e-3, warmup_epochs=1,
                      patience=10, bf16=False, augment=False)
    res = train_classifier(x[:192], y[:192], x[192:], y[192:], TOY_MODEL, cfg,
                           mesh=eight_device_mesh, verbose=False)
    assert res.epochs_run == 4
    assert np.isfinite(res.history["train_loss"]).all()


def test_training_fully_deterministic(rng):
    """Same seed -> bitwise-identical history (the framework's determinism
    control, replacing the reference's cudnn.deterministic flag)."""
    x, y = _toy_data(rng, n=128)
    cfg = TrainConfig(epochs=3, batch_size=32, eval_batch_size=64,
                      accumulation_steps=1, learning_rate=3e-3, warmup_epochs=1,
                      patience=10, bf16=False, augment=False)
    r1 = train_classifier(x[:96], y[:96], x[96:], y[96:], TOY_MODEL, cfg,
                          verbose=False)
    r2 = train_classifier(x[:96], y[:96], x[96:], y[96:], TOY_MODEL, cfg,
                          verbose=False)
    assert r1.history["train_loss"] == r2.history["train_loss"]
    assert r1.history["val_f1"] == r2.history["val_f1"]
    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_array_equal(a, b)


def test_resume_restores_best_params_when_no_later_improvement(tmp_path, rng):
    """Regression: resume used to discard the checkpointed best params, so a
    resumed run with no later improvement returned non-best params."""
    import dataclasses

    from eegflow.core.artifacts import load_checkpoint
    from eegflow.core.config import TrainConfig
    from eegflow.train import train_classifier

    cfg_m = ModelConfig(input_size=3, hidden_size=8, num_layers=1, dropout=0.0)
    base = TrainConfig(epochs=4, batch_size=16, eval_batch_size=32,
                       accumulation_steps=1, warmup_epochs=1, patience=10,
                       bf16=False, augment=False)
    x = rng.standard_normal((96, 16, 3)).astype(np.float32)
    y = (x[:, :, 0].mean(1) > 0).astype(np.int64)
    args = (x[:48], y[:48], x[48:], y[48:], cfg_m)

    half_cfg = dataclasses.replace(base, epochs=2)
    train_classifier(*args, half_cfg, verbose=False,
                     checkpoint_dir=tmp_path / "snap", checkpoint_every=2)
    ckpt_params, *_ = load_checkpoint(tmp_path / "snap")

    # resume with a frozen LR: no epoch can beat the checkpointed best F1,
    # so the returned params must be exactly the checkpointed best params
    frozen = dataclasses.replace(base, learning_rate=0.0)
    resumed = train_classifier(*args, frozen, verbose=False,
                               resume_from=tmp_path / "snap")
    flat_c = jax.tree_util.tree_leaves(ckpt_params)
    flat_r = jax.tree_util.tree_leaves(resumed.params)
    assert len(flat_c) == len(flat_r)
    for a, b in zip(flat_c, flat_r):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_augment_mixup_and_channel_dropout(rng):
    from eegflow.train.data import augment_data

    x = rng.standard_normal((20, 16, 4)).astype(np.float32)
    y = rng.integers(0, 2, 20)
    ax, ay = augment_data(x, y, np.random.default_rng(0), mixup=True,
                          channel_dropout=0.3)
    assert ax.shape == (100, 16, 4) and ay.shape == (100,)
    np.testing.assert_array_equal(ay, np.tile(y, 5))
    # mixup copy stays within the convex hull of its class
    mix = ax[60:80]
    for cls in (0, 1):
        members = x[y == cls]
        lo, hi = members.min(), members.max()
        m = mix[y == cls]
        assert m.min() >= lo - 1e-5 and m.max() <= hi + 1e-5
    # channel-dropout copy: some channels exactly zero, others rescaled
    cd = ax[80:]
    zero_frac = (np.abs(cd).max(axis=1) == 0).mean()
    assert 0.05 < zero_frac < 0.6
    # reference 3x semantics preserved by default
    bx, by = augment_data(x, y, np.random.default_rng(0))
    assert bx.shape == (60, 16, 4)
    np.testing.assert_array_equal(bx[:20], x)


def test_augment_phase_surrogate(rng):
    from eegflow.train.data import augment_data, phase_surrogate

    x = rng.standard_normal((8, 32, 3)).astype(np.float32)
    x[0] -= 2.0  # negative-mean window: DC sign must be preserved
    s = phase_surrogate(x, np.random.default_rng(1))
    assert s.shape == x.shape and s.dtype == x.dtype
    # amplitude spectrum preserved per sample/channel, waveform randomized
    np.testing.assert_allclose(np.abs(np.fft.rfft(s, axis=1)),
                               np.abs(np.fft.rfft(x, axis=1)),
                               rtol=0, atol=1e-3)
    assert np.abs(s - x).max() > 0.1
    # DC kept verbatim (not |DC|): per-window-channel means survive exactly
    np.testing.assert_allclose(s.mean(axis=1), x.mean(axis=1), atol=1e-5)
    # two surrogate copies through augment_data are distinct draws
    y = rng.integers(0, 2, 8)
    ax, ay = augment_data(x, y, np.random.default_rng(2), phase_surrogates=2)
    assert ax.shape == (40, 32, 3)
    np.testing.assert_array_equal(ay, np.tile(y, 5))
    assert np.abs(ax[24:32] - ax[32:]).max() > 0.1


def test_surrogate_refresher_device_side(rng):
    from eegflow.train.data import augment_data, make_surrogate_refresher

    x = rng.standard_normal((6, 32, 3)).astype(np.float32)
    y = rng.integers(0, 2, 6)
    ax, _ = augment_data(x, y, np.random.default_rng(3), phase_surrogates=2)
    refresh = make_surrogate_refresher(6, 2, seed=0)
    r1 = np.asarray(refresh(jnp.asarray(ax), jnp.asarray(0)))
    r2 = np.asarray(refresh(jnp.asarray(ax), jnp.asarray(1)))
    # head rows (original + noise + shift copies) untouched
    np.testing.assert_array_equal(r1[:18], ax[:18])
    # tails are fresh draws per epoch, distinct from each other...
    assert np.abs(r1[18:] - r2[18:]).max() > 0.1
    # ...but keep the originals' amplitude spectrum (per copy block)
    for r in (r1, r2):
        for blk in (r[18:24], r[24:30]):
            np.testing.assert_allclose(np.abs(np.fft.rfft(blk, axis=1)),
                                       np.abs(np.fft.rfft(x, axis=1)),
                                       rtol=0, atol=2e-3)


def test_train_classifier_epoch_transform_hook(rng):
    """epoch_transform runs per epoch on the HBM-resident training array
    without breaking the loop (labels/shape preserved)."""
    x, y = _toy_data(rng)
    calls = []

    def transform(xd, epoch):
        calls.append(int(epoch))
        return xd

    import dataclasses
    cfg = dataclasses.replace(TOY_TRAIN, epochs=2, patience=5)
    from eegflow.train.loop import train_classifier
    res = train_classifier(x, y, x[:16], y[:16], TOY_MODEL, cfg,
                           verbose=False, epoch_transform=transform)
    assert res.epochs_run >= 1 and calls[:2] == [0, 1]
