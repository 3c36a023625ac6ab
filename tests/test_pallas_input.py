"""Fused input-projection block (eegflow.nn.pallas_input) vs the XLA oracle.

The block is ``gelu(LayerNorm(x @ W + b))`` (ref 04_lstm_model.py:173-178);
the fused kernel pair must match the composition of dense_apply +
layer_norm_apply + gelu (eegflow.nn.layers) in values AND gradients,
including the recomputing backward's LN statistics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eegflow.nn.layers import (dense_apply, dense_init, gelu,
                               layer_norm_apply, layer_norm_init)
from eegflow.nn.pallas_input import input_block_fused


def _setup(b=8, t=16, c=13, h=32, seed=0):
    proj = dense_init(jax.random.key(seed), c, h)
    norm = layer_norm_init(h)
    # non-trivial LN params so dgamma/dbeta are exercised
    norm = {"scale": norm["scale"] * 1.3 + 0.1, "bias": norm["bias"] + 0.05}
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    return proj, norm, x


def _oracle(proj, norm, x, compute_dtype=None):
    return gelu(layer_norm_apply(norm, dense_apply(proj, x, compute_dtype)))


@pytest.mark.parametrize("bf16", [False, True])
def test_input_block_forward_matches_oracle(bf16):
    proj, norm, x = _setup()
    y = input_block_fused(proj, norm, x, bf16=bf16)
    y_ref = _oracle(proj, norm, x, jnp.bfloat16 if bf16 else None)
    tol = 2e-2 if bf16 else 1e-5
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("bf16", [False, True])
def test_input_block_grads_match_oracle(bf16):
    proj, norm, x = _setup(seed=3)

    def loss_fused(proj, norm, x):
        return jnp.sum(jnp.tanh(input_block_fused(proj, norm, x, bf16=bf16)))

    def loss_ref(proj, norm, x):
        return jnp.sum(jnp.tanh(_oracle(
            proj, norm, x, jnp.bfloat16 if bf16 else None)))

    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(
        proj, norm, x)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(proj, norm, x)
    rtol = 0.03 if bf16 else 2e-4
    assert abs(float(v_f) - float(v_r)) / (abs(float(v_r)) + 1e-8) < rtol
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8) < rtol


def test_input_block_pads_odd_batch():
    """B not a multiple of the batch tile: padding is applied and sliced."""
    proj, norm, x = _setup(b=5, t=16, seed=7)
    y = input_block_fused(proj, norm, x)
    y_ref = _oracle(proj, norm, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    g = jax.grad(lambda xv: jnp.sum(input_block_fused(proj, norm, xv)))(x)
    g_ref = jax.grad(lambda xv: jnp.sum(_oracle(proj, norm, xv)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-4, rtol=2e-4)


def test_classifier_with_fused_input_matches_default(monkeypatch):
    """EEGFLOW_FUSED_INPUT=1 end-to-end through classifier_apply (pallas
    impl, interpret mode) stays close to the default XLA front-end."""
    from eegflow.core.config import ModelConfig
    from eegflow.nn.model import classifier_apply, classifier_init

    cfg = ModelConfig(input_size=13, hidden_size=16, num_layers=2)
    params = classifier_init(jax.random.key(11), cfg)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((8, 16, 13)), jnp.float32)

    def run():
        jax.clear_caches()
        return classifier_apply(params, x, cfg, train=False,
                                compute_dtype=jnp.bfloat16,
                                lstm_impl="pallas")

    base = run()
    monkeypatch.setenv("EEGFLOW_FUSED_INPUT", "1")
    fused = run()
    monkeypatch.delenv("EEGFLOW_FUSED_INPUT")
    jax.clear_caches()
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=5e-2, rtol=5e-2)


def test_input_block_folded_dropout_semantics():
    """out_keep < 1 with an explicit out_mask: the block's output is the
    inverted-dropout copy of its undropped output, exactly."""
    proj, norm, x = _setup(seed=21)
    keep = 0.7
    rng = np.random.default_rng(21)
    h = proj["w"].shape[1]
    om = jnp.asarray(rng.random((x.shape[0], x.shape[1], h)) < keep,
                     jnp.uint8)
    y = input_block_fused(proj, norm, x)
    yd = input_block_fused(proj, norm, x, out_keep=keep, out_mask=om)
    expect = np.where(np.asarray(om) != 0, np.asarray(y) / keep, 0.0)
    np.testing.assert_allclose(np.asarray(yd), expect, atol=1e-6, rtol=1e-6)


def test_classifier_folded_input_dropout_bit_identical(monkeypatch):
    """FUSED_INPUT=1 + FWD_DROPW=2 (input dropout folded into the block's
    output write + inter-layer dropped copies from the kernels) is
    bit-identical in loss and every gradient to FUSED_INPUT=1 alone (select
    dropout on the same mask streams) — the full train-mode classifier."""
    from eegflow.core.config import ModelConfig
    from eegflow.nn.model import classifier_apply, classifier_init

    cfg = ModelConfig(input_size=13, hidden_size=16, num_layers=3)
    params = classifier_init(jax.random.key(31), cfg)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal((8, 16, 13)), jnp.float32)
    dk = jax.random.key(32)

    def run(dropw):
        monkeypatch.setenv("EEGFLOW_FUSED_INPUT", "1")
        if dropw:
            monkeypatch.setenv("EEGFLOW_FWD_DROPW", "2")
        try:
            jax.clear_caches()

            def loss(p):
                logits = classifier_apply(p, x, cfg, train=True,
                                          dropout_key=dk,
                                          compute_dtype=jnp.bfloat16,
                                          lstm_impl="pallas")
                return jnp.sum(jax.nn.log_softmax(logits))

            return jax.value_and_grad(loss)(params)
        finally:
            monkeypatch.delenv("EEGFLOW_FUSED_INPUT", raising=False)
            monkeypatch.delenv("EEGFLOW_FWD_DROPW", raising=False)
            jax.clear_caches()

    v0, g0 = run(False)
    v2, g2 = run(True)
    assert float(v0) == float(v2)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g2)):
        assert jnp.array_equal(a, b)
