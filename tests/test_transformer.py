"""EEGFormer (eegflow.nn.transformer) — the second model family.

The transformer is selected purely by config TYPE (``TransformerConfig``),
so these tests drive it through the SAME entry points as the flagship:
``classifier_init/apply``, ``make_train_step``, ``train_classifier``,
``predict_probs``, checkpointing, and the 8-device mesh step — proving the
framework is model-agnostic, not LSTM-shaped.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegflow.core.artifacts import load_checkpoint, save_checkpoint
from eegflow.core.config import TrainConfig, TransformerConfig
from eegflow.nn.model import classifier_apply, classifier_init, model_flops_per_window
from eegflow.nn.transformer import sinusoidal_positions
from eegflow.train import make_optimizer, make_train_step, train_classifier
from eegflow.train.loop import predict_probs
from eegflow.train.steps import TrainState

TOY_TF = TransformerConfig(input_size=4, d_model=16, num_layers=2,
                           num_heads=2, mlp_ratio=2, dropout=0.1)
TOY_TRAIN = TrainConfig(
    epochs=12, batch_size=32, eval_batch_size=64, accumulation_steps=1,
    learning_rate=1e-3, warmup_epochs=2, patience=10, bf16=False, augment=False,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def _toy_data(rng, n=256, t=32, c=4):
    y = (rng.random(n) > 0.5).astype(np.int64)
    x = rng.standard_normal((n, t, c)).astype(np.float32)
    wave = np.sin(2 * np.pi * np.arange(t) / 8.0).astype(np.float32)
    x[y == 1] += 2.0 * wave[None, :, None]
    return x, y


def test_forward_shapes_and_attention_simplex(rng):
    params = classifier_init(jax.random.key(0), TOY_TF)
    x = jnp.asarray(rng.standard_normal((8, 32, 4)), jnp.float32)
    logits, attn = classifier_apply(params, x, TOY_TF, return_attention=True)
    assert logits.shape == (8, 2)
    assert attn.shape == (8, 32)
    np.testing.assert_allclose(np.asarray(attn).sum(axis=1), 1.0, atol=1e-5)


def test_eval_is_deterministic_and_t_flexible(rng):
    params = classifier_init(jax.random.key(0), TOY_TF)
    x = jnp.asarray(rng.standard_normal((4, 32, 4)), jnp.float32)
    a = classifier_apply(params, x, TOY_TF)
    b = classifier_apply(params, x, TOY_TF)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # sinusoidal positions carry no T-dependent params: other lengths work
    x48 = jnp.asarray(rng.standard_normal((4, 48, 4)), jnp.float32)
    assert classifier_apply(params, x48, TOY_TF).shape == (4, 2)


def test_bf16_close_to_f32(rng):
    params = classifier_init(jax.random.key(0), TOY_TF)
    x = jnp.asarray(rng.standard_normal((8, 32, 4)), jnp.float32)
    f32 = np.asarray(classifier_apply(params, x, TOY_TF))
    bf16 = np.asarray(classifier_apply(params, x, TOY_TF,
                                       compute_dtype=jnp.bfloat16))
    assert np.abs(f32 - bf16).max() < 0.15 * max(1.0, np.abs(f32).max())


def test_sinusoidal_positions_properties():
    enc = np.asarray(sinusoidal_positions(32, 16))
    assert enc.shape == (32, 16)
    assert np.abs(enc).max() <= 1.0 + 1e-6
    # position 0: sin terms 0, cos terms 1
    np.testing.assert_allclose(enc[0, :8], 0.0, atol=1e-6)
    np.testing.assert_allclose(enc[0, 8:], 1.0, atol=1e-6)
    enc17 = np.asarray(sinusoidal_positions(4, 17))  # odd D pads
    assert enc17.shape == (4, 17)


def test_train_step_decreases_loss_through_shared_stack(rng):
    x, y = _toy_data(rng)
    tx = make_optimizer(TOY_TRAIN, updates_per_epoch=8)
    params = classifier_init(jax.random.key(0), TOY_TF)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step = make_train_step(TOY_TF, TOY_TRAIN, tx, donate=False)
    losses = []
    for i in range(20):
        xb = jnp.asarray(x[(i % 8) * 32 : (i % 8 + 1) * 32])
        yb = jnp.asarray(y[(i % 8) * 32 : (i % 8 + 1) * 32])
        state, m = step(state, xb, yb, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_classifier_learns_separable(rng):
    x, y = _toy_data(rng, n=512)
    res = train_classifier(x[:384], y[:384], x[384:], y[384:], TOY_TF,
                           TOY_TRAIN, verbose=False)
    assert res.best_val_f1 > 0.9
    probs = predict_probs(res.params, x[384:], TOY_TF, batch_size=64,
                          bf16=False)
    acc = (probs.argmax(1) == y[384:]).mean()
    assert acc > 0.9


def test_checkpoint_roundtrip_preserves_model_family(tmp_path, rng):
    params = classifier_init(jax.random.key(0), TOY_TF)
    save_checkpoint(tmp_path / "ckpt", params, TOY_TF,
                    history={"val_f1": [0.5]})
    params2, cfg2, hist, _ = load_checkpoint(tmp_path / "ckpt")
    assert isinstance(cfg2, TransformerConfig)
    assert cfg2 == TOY_TF
    x = jnp.asarray(rng.standard_normal((4, 32, 4)), jnp.float32)
    a = np.asarray(classifier_apply(params, x, TOY_TF))
    b = np.asarray(classifier_apply(params2, x, cfg2))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_mesh_train_step_runs_sharded(rng):
    from eegflow.train import make_data_mesh
    from eegflow.train.mesh import replicate_to_mesh, shard_batch

    mesh = make_data_mesh(8)
    x, y = _toy_data(rng, n=64)
    tx = make_optimizer(TOY_TRAIN, updates_per_epoch=2)
    params = classifier_init(jax.random.key(0), TOY_TF)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    state = replicate_to_mesh(state, mesh)
    step = make_train_step(TOY_TF, TOY_TRAIN, tx, mesh=mesh, donate=False)
    xb, yb = shard_batch((jnp.asarray(x[:32]), jnp.asarray(y[:32])), mesh)
    state, m = step(state, xb, yb, jax.random.key(0))
    assert np.isfinite(float(m["loss"]))


def test_explain_stack_finds_signal_channel(rng):
    """The explain stack is model-family agnostic: train the transformer on
    data where only channel 2 is informative (same recipe as the LSTM's
    tests/test_explain.py fixture); permutation importance must single it
    out, and gradient attribution must produce a valid distribution (plain
    gradients saturate on near-separable transformers, so only permutation
    gets the ranking assertion)."""
    from eegflow.explain.gradient import gradient_channel_importance
    from eegflow.explain.permutation import permutation_channel_importance

    n, t = 384, 32
    y = (rng.random(n) > 0.5).astype(np.int64)
    x = rng.standard_normal((n, t, 4)).astype(np.float32)
    wave = np.sin(2 * np.pi * np.arange(t) / 8.0).astype(np.float32)
    x[y == 1, :, 2] += 2.5 * wave
    res = train_classifier(x[:256], y[:256], x[256:], y[256:], TOY_TF,
                           TOY_TRAIN, verbose=False)
    assert res.best_val_f1 > 0.8
    perm = permutation_channel_importance(res.params, TOY_TF, x[256:],
                                          y[256:], n_permutations=3,
                                          n_samples=128)
    assert int(np.argmax(perm["importance"])) == 2
    grad = gradient_channel_importance(res.params, TOY_TF, x[256:],
                                       n_samples=64)
    imp = np.asarray(grad["importance"])
    assert imp.shape == (4,) and np.all(np.isfinite(imp))
    np.testing.assert_allclose(imp.sum(), 1.0, atol=1e-6)


def test_flops_dispatch_positive():
    fl = model_flops_per_window(TOY_TF, seq_len=32)
    assert fl > 0
    # attention-only model: quadratic-in-T term present
    assert model_flops_per_window(TOY_TF, 64) > 2 * fl
