"""Pallas LSTM kernel vs the scan reference, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegflow.nn.lstm import bilstm_stack_apply, bilstm_stack_init, lstm_layer_apply, lstm_layer_init
from eegflow.nn.pallas_lstm import (
    pallas_bilstm_stack_apply,
    pallas_lstm_layer_apply,
)


@pytest.mark.parametrize("b,t,d,h", [(8, 32, 12, 16), (5, 24, 8, 8)])
def test_pallas_layer_matches_scan(b, t, d, h):
    params = lstm_layer_init(jax.random.key(0), d, h)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((b, t, d)), jnp.float32)
    ref = np.asarray(lstm_layer_apply(params, x))
    ours = np.asarray(pallas_lstm_layer_apply(params, x, interpret=True,
                                              batch_tile=4, t_chunk=8))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_pallas_layer_reverse_matches_scan():
    params = lstm_layer_init(jax.random.key(1), 8, 8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 16, 8)), jnp.float32)
    ref = np.asarray(lstm_layer_apply(params, x, reverse=True))
    ours = np.asarray(pallas_lstm_layer_apply(params, x, reverse=True,
                                              interpret=True, batch_tile=4,
                                              t_chunk=4))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_pallas_stack_matches_scan_stack():
    stack = bilstm_stack_init(jax.random.key(2), 6, 8, num_layers=2,
                              bidirectional=True)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 16, 6)), jnp.float32)
    ref = np.asarray(bilstm_stack_apply(stack, x))
    ours = np.asarray(pallas_bilstm_stack_apply(stack, x, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_pallas_handles_nondivisible_batch():
    """Batch 7 with tile 4 -> padded to 8, pad rows dropped."""
    params = lstm_layer_init(jax.random.key(3), 4, 8)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((7, 8, 4)), jnp.float32)
    ref = np.asarray(lstm_layer_apply(params, x))
    ours = np.asarray(pallas_lstm_layer_apply(params, x, interpret=True,
                                              batch_tile=4, t_chunk=4))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_fused_layer_gradients_match_scan():
    """custom_vjp: Pallas forward + scan-derived backward == pure scan grads."""
    from eegflow.nn.pallas_lstm import lstm_layer_fused

    params = lstm_layer_init(jax.random.key(4), 6, 8)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((4, 16, 6)), jnp.float32)

    def loss_fused(p, x):
        return jnp.sum(lstm_layer_fused(p["w_ih"], p["w_hh"], p["b"], x, False) ** 2)

    def loss_scan(p, x):
        return jnp.sum(lstm_layer_apply(p, x) ** 2)

    g_fused = jax.grad(loss_fused)(params, x)
    g_scan = jax.grad(loss_scan)(params, x)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_fused[k]), np.asarray(g_scan[k]),
                                   atol=3e-4, rtol=3e-4)


def test_classifier_pallas_impl_matches_scan():
    from eegflow.core.config import ModelConfig
    from eegflow.nn.model import classifier_apply, classifier_init

    cfg = ModelConfig(input_size=6, hidden_size=8, num_layers=2, dropout=0.0)
    params = classifier_init(jax.random.key(5), cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((4, 16, 6)), jnp.float32)
    ref = np.asarray(classifier_apply(params, x, cfg, lstm_impl="scan"))
    ours = np.asarray(classifier_apply(params, x, cfg, lstm_impl="pallas"))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_pallas_bf16_option_close_to_f32():
    params = lstm_layer_init(jax.random.key(6), 16, 16)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((4, 16, 16)), jnp.float32)
    gates = jnp.einsum("btd,dg->btg", x, params["w_ih"]) + params["b"]
    from eegflow.nn.pallas_lstm import lstm_recurrence_pallas

    f32 = np.asarray(lstm_recurrence_pallas(gates, params["w_hh"], batch_tile=4,
                                            t_chunk=8, interpret=True))
    bf16 = np.asarray(lstm_recurrence_pallas(gates, params["w_hh"], batch_tile=4,
                                             t_chunk=8, interpret=True, bf16=True))
    assert np.max(np.abs(f32 - bf16)) < 0.05
    assert np.corrcoef(f32.ravel(), bf16.ravel())[0, 1] > 0.999


def test_fused_backward_bf16_option_close_to_f32():
    from eegflow.nn.pallas_lstm import _fused_pipeline_fwd, lstm_recurrence_backward

    params = lstm_layer_init(jax.random.key(7), 8, 16)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((8, 16, 8)), jnp.float32)
    _, (gates, h_pad, c_pad), _ = _fused_pipeline_fwd(
        params["w_ih"], params["w_hh"], params["b"], x, False)
    g = jnp.ones((8, 16, 16), jnp.float32)
    dg_f32, dw_f32 = lstm_recurrence_backward(
        gates, h_pad, c_pad, params["w_hh"], g, batch_tile=8, t_chunk=8,
        interpret=True)
    dg_bf, dw_bf = lstm_recurrence_backward(
        gates, h_pad, c_pad, params["w_hh"], g, batch_tile=8, t_chunk=8,
        interpret=True, bf16=True)
    assert np.corrcoef(np.asarray(dg_f32).ravel(),
                       np.asarray(dg_bf).ravel())[0, 1] > 0.995
    assert np.corrcoef(np.asarray(dw_f32).ravel(),
                       np.asarray(dw_bf).ravel())[0, 1] > 0.995


@pytest.mark.parametrize("rev", [False, True])
def test_fully_fused_amp_layer_grads_close_to_scan(rev):
    """The bf16-policy path (in-kernel projection fwd, in-kernel dx/dW/db
    bwd) matches scan autodiff to AMP tolerance, both directions."""
    from eegflow.nn.pallas_lstm import lstm_layer_fused

    params = lstm_layer_init(jax.random.key(9), 24, 16)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((12, 32, 24)),
                    jnp.float32)

    out = np.asarray(lstm_layer_fused(params["w_ih"], params["w_hh"],
                                      params["b"], x, rev, True))
    ref = np.asarray(lstm_layer_apply(params, x, reverse=rev))
    assert out.dtype == np.float32
    assert np.max(np.abs(out - ref)) < 0.02

    def loss_fused(p, x):
        return jnp.sum(jnp.tanh(
            lstm_layer_fused(p["w_ih"], p["w_hh"], p["b"], x, rev, True)))

    def loss_scan(p, x):
        return jnp.sum(jnp.tanh(lstm_layer_apply(p, x, reverse=rev)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    g_scan = jax.grad(loss_scan, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_scan)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)
        assert rel < 0.02, rel
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.999


@pytest.mark.parametrize("bf16", [True, False])
def test_fused_layer_parts_match_concat_input(bf16):
    """Feeding the input as two feature-axis parts (the bidirectional
    inter-layer path that skips the HBM concat) gives the same output and
    gradients as the concatenated single input."""
    from eegflow.nn.pallas_lstm import lstm_layer_fused_parts

    d1, d2, hid = 16, 8, 16
    params = lstm_layer_init(jax.random.key(11), d1 + d2, hid)
    rng = np.random.default_rng(11)
    x1 = jnp.asarray(rng.standard_normal((8, 16, d1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((8, 16, d2)), jnp.float32)
    x = jnp.concatenate([x1, x2], axis=-1)

    out_parts = lstm_layer_fused_parts(params["w_ih"], params["w_hh"],
                                       params["b"], (x1, x2), False, bf16)
    out_full = lstm_layer_fused_parts(params["w_ih"], params["w_hh"],
                                      params["b"], (x,), False, bf16)
    np.testing.assert_allclose(np.asarray(out_parts), np.asarray(out_full),
                               atol=1e-5)

    def loss(p, xs):
        return jnp.sum(jnp.tanh(lstm_layer_fused_parts(
            p["w_ih"], p["w_hh"], p["b"], xs, False, bf16)))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, (x1, x2))
    gp_full, gx_full = jax.grad(loss, argnums=(0, 1))(params, (x,))
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gp_full)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(gx, axis=-1)), np.asarray(gx_full[0]),
        atol=1e-5)


@pytest.mark.parametrize("bf16", [True, False])
def test_fused_layer_in_kernel_dropout_mask(bf16):
    """The uint8 dropout masks applied inside the kernels equal explicitly
    masking the input and running the plain layer (fwd and all grads)."""
    from eegflow.nn.pallas_lstm import lstm_layer_fused_parts

    d_in, hid, keep = 16, 16, 0.75
    params = lstm_layer_init(jax.random.key(21), d_in, hid)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((8, 16, d_in)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, x.shape), jnp.uint8)
    x_dropped = jnp.where(mask != 0, x / keep, 0.0)

    out = lstm_layer_fused_parts(params["w_ih"], params["w_hh"], params["b"],
                                 (x,), False, bf16, (mask,), keep)
    ref = np.asarray(lstm_layer_apply(params, x_dropped))
    tol = 0.02 if bf16 else 3e-4
    assert np.max(np.abs(np.asarray(out) - ref)) < tol

    def loss_fused(p, xs):
        return jnp.sum(jnp.tanh(lstm_layer_fused_parts(
            p["w_ih"], p["w_hh"], p["b"], xs, False, bf16, (mask,), keep)))

    def loss_ref(p, xd):
        return jnp.sum(jnp.tanh(lstm_layer_apply(p, xd)))

    gp, (gx,) = jax.grad(loss_fused, argnums=(0, 1))(params, (x,))
    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x_dropped)
    # chain rule: d/dx = mask/keep * d/dx_dropped
    gx_ref = np.where(np.asarray(mask) != 0, np.asarray(gx_ref) / keep, 0.0)
    rtol = 0.03 if bf16 else 2e-3
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gp_ref)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8) < rtol
    assert np.max(np.abs(np.asarray(gx) - gx_ref)) / (
        np.max(np.abs(gx_ref)) + 1e-8) < rtol


def test_pallas_stack_train_dropout_masks_finite():
    """Stack-level smoke: pallas training path with input + inter-layer
    dropout masks produces finite outputs and gradients."""
    from eegflow.nn.lstm import bilstm_stack_init, bilstm_stack_apply

    layers = bilstm_stack_init(jax.random.key(3), 12, 8, num_layers=2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((8, 16, 12)),
                    jnp.float32)

    def loss(ls):
        out = bilstm_stack_apply(
            ls, x, inter_dropout=0.3, train=True,
            dropout_key=jax.random.key(7), compute_dtype=jnp.bfloat16,
            impl="pallas", input_dropout=0.15,
            input_dropout_key=jax.random.key(8))
        return jnp.sum(out ** 2)

    val, grads = jax.value_and_grad(loss)(layers)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fully_fused_amp_layer_pads_batch():
    from eegflow.nn.pallas_lstm import lstm_layer_fused

    params = lstm_layer_init(jax.random.key(10), 8, 8)
    x = jnp.asarray(np.random.default_rng(10).standard_normal((7, 16, 8)),
                    jnp.float32)
    out = lstm_layer_fused(params["w_ih"], params["w_hh"], params["b"], x,
                           False, True)
    assert out.shape == (7, 16, 8)
    g = jax.grad(lambda w: jnp.sum(
        lstm_layer_fused(w, params["w_hh"], params["b"], x, False, True)
    ))(params["w_ih"])
    assert np.isfinite(np.asarray(g)).all()


def test_fused_layer_grad_batch_96():
    """Regression: B in (64, 128) used to hit a non-dividing backward tile
    (forward pads to B itself, backward hard-coded 64)."""
    from eegflow.nn.pallas_lstm import lstm_layer_fused

    params = lstm_layer_init(jax.random.key(8), 4, 8)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((96, 8, 4)),
                    jnp.float32)

    def loss_fused(p, x):
        return jnp.sum(lstm_layer_fused(p["w_ih"], p["w_hh"], p["b"], x, False) ** 2)

    def loss_scan(p, x):
        return jnp.sum(lstm_layer_apply(p, x) ** 2)

    g_fused = jax.grad(loss_fused)(params, x)
    g_scan = jax.grad(loss_scan)(params, x)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_fused[k]), np.asarray(g_scan[k]),
                                   atol=3e-4, rtol=3e-4)


@pytest.mark.parametrize("bf16", [True, False])
def test_bilstm_pair_matches_two_singles(bf16):
    """The paired bidirectional custom VJP (dx summed in the second backward
    kernel) matches two independent single-direction layers."""
    from eegflow.nn.pallas_lstm import (bilstm_layer_fused_parts,
                                       lstm_layer_fused_parts)

    d1, d2, hid = 16, 8, 16
    pf = lstm_layer_init(jax.random.key(41), d1 + d2, hid)
    pb = lstm_layer_init(jax.random.key(42), d1 + d2, hid)
    rng = np.random.default_rng(41)
    xs = (jnp.asarray(rng.standard_normal((8, 16, d1)), jnp.float32),
          jnp.asarray(rng.standard_normal((8, 16, d2)), jnp.float32))

    def loss_pair(pf, pb, xs):
        hf, hr = bilstm_layer_fused_parts(pf, pb, xs, bf16)
        return jnp.sum(jnp.tanh(hf)) + jnp.sum(jnp.cos(hr))

    def loss_single(pf, pb, xs):
        hf = lstm_layer_fused_parts(pf["w_ih"], pf["w_hh"], pf["b"], xs,
                                    False, bf16)
        hr = lstm_layer_fused_parts(pb["w_ih"], pb["w_hh"], pb["b"], xs,
                                    True, bf16)
        return jnp.sum(jnp.tanh(hf)) + jnp.sum(jnp.cos(hr))

    v1, g1 = jax.value_and_grad(loss_pair, argnums=(0, 1, 2))(pf, pb, xs)
    v2, g2 = jax.value_and_grad(loss_single, argnums=(0, 1, 2))(pf, pb, xs)
    assert abs(float(v1) - float(v2)) < 1e-4
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("bf16", [True, False])
def test_mask_from_x_recovers_dropout_backward(bf16):
    """With mask_from_x, feeding an already-dropped input recovers the full
    inverted-dropout VJP (dx masked + rescaled in-kernel from x's zeros)."""
    from eegflow.nn.pallas_lstm import lstm_layer_fused_parts

    d_in, hid, keep = 12, 16, 0.75
    params = lstm_layer_init(jax.random.key(51), d_in, hid)
    rng = np.random.default_rng(51)
    x = jnp.asarray(rng.standard_normal((8, 16, d_in)), jnp.float32)
    mask = jnp.asarray(rng.random(x.shape) < keep, jnp.float32)
    x_drop = x * mask / keep

    def loss_fused(p, xds):
        return jnp.sum(jnp.tanh(lstm_layer_fused_parts(
            p["w_ih"], p["w_hh"], p["b"], xds, False, bf16, None, keep,
            None, True)))

    def loss_ref(p, xd):
        return jnp.sum(jnp.tanh(lstm_layer_apply(p, xd)))

    gp, (gx,) = jax.grad(loss_fused, argnums=(0, 1))(params, (x_drop,))
    gp_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x_drop)
    # chain rule through dropout: d/dx = mask/keep * d/dx_drop
    gx_ref = np.asarray(gx_ref) * np.asarray(mask) / keep
    rtol = 0.03 if bf16 else 2e-3
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gp_ref)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8) < rtol
    assert np.max(np.abs(np.asarray(gx) - gx_ref)) / (
        np.max(np.abs(gx_ref)) + 1e-8) < rtol


def test_stack_xla_dropout_grads_finite_and_masked():
    """Stack-level: pallas + XLA dropout + mask_from_x produces finite grads
    and the input gradient respects the input-dropout mask zeros."""
    from eegflow.nn.lstm import bilstm_stack_apply, bilstm_stack_init

    layers = bilstm_stack_init(jax.random.key(5), 12, 8, num_layers=2)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((8, 16, 12)),
                    jnp.float32)

    def loss(ls, x):
        out = bilstm_stack_apply(
            ls, x, inter_dropout=0.3, train=True,
            dropout_key=jax.random.key(9), compute_dtype=jnp.bfloat16,
            impl="pallas", input_dropout=0.2,
            input_dropout_key=jax.random.key(10))
        return jnp.sum(out ** 2)

    val, (g_l, g_x) = jax.value_and_grad(loss, argnums=(0, 1))(layers, x)
    assert np.isfinite(float(val))
    for leaf in jax.tree.leaves(g_l):
        assert np.isfinite(np.asarray(leaf)).all()
    # positions dropped by the input mask must have zero input-gradient —
    # derive the expected mask through dropout() itself so the oracle tracks
    # whatever PRNG path is active (threefry / rbg default / DROP8)
    from eegflow.nn.layers import dropout as _dropout

    mask = np.asarray(_dropout(jnp.ones(x.shape), 0.2, jax.random.key(10),
                               True)) != 0.0
    assert np.all(np.asarray(g_x)[~mask] == 0.0)


def test_stack_input_dropout_grads_match_scan_exactly():
    """1-layer bidirectional stack with input dropout: the pallas XLA-mode
    path (forward-only dropout + in-kernel mask_from_x backward) must equal
    the scan path's full autodiff — both draw the SAME mask from the same
    key, so f32 grads must agree tightly. Catches double-masking."""
    from eegflow.nn.lstm import bilstm_stack_apply, bilstm_stack_init

    layers = bilstm_stack_init(jax.random.key(7), 10, 8, num_layers=1)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((8, 16, 10)),
                    jnp.float32)
    kw = dict(inter_dropout=0.0, train=True, dropout_key=jax.random.key(3),
              input_dropout=0.25, input_dropout_key=jax.random.key(4))

    def loss(ls, x, impl):
        return jnp.sum(bilstm_stack_apply(ls, x, impl=impl, **kw) ** 2)

    gp_l, gp_x = jax.grad(lambda l, xx: loss(l, xx, "pallas"),
                          argnums=(0, 1))(layers, x)
    gs_l, gs_x = jax.grad(lambda l, xx: loss(l, xx, "scan"),
                          argnums=(0, 1))(layers, x)
    for a, b in zip(jax.tree.leaves(gp_l), jax.tree.leaves(gs_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gs_x),
                               atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("extra_env", [{}, {"EEGFLOW_DROP8": "1"}],
                         ids=["bernoulli", "drop8"])
def test_stack_mask_dropout_mode_matches_default(monkeypatch, extra_env):
    """EEGFLOW_MASK_DROPOUT=1 (uint8 masks applied in-kernel, the dropped
    tensors never exist in HBM) must reproduce the default select path's
    outputs AND gradients exactly: both draw the same mask patterns from
    the same per-part keys via layers.dropout_mask (whatever PRNG flags are
    active — threefry / rbg / DROP8), only where the multiply happens
    differs."""
    import eegflow.nn.layers as nn_layers
    from eegflow.nn.lstm import bilstm_stack_apply, bilstm_stack_init

    layers = bilstm_stack_init(jax.random.key(0), 12, 8, num_layers=2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((8, 16, 12)),
                    jnp.float32)

    def loss(ls, xx):
        out = bilstm_stack_apply(
            ls, xx, inter_dropout=0.3, train=True,
            dropout_key=jax.random.key(9), impl="pallas",
            input_dropout=0.15, input_dropout_key=jax.random.key(10))
        return jnp.sum(out ** 2)

    try:
        for k, v in extra_env.items():
            monkeypatch.setenv(k, v)
        nn_layers.refresh_flags()
        monkeypatch.delenv("EEGFLOW_MASK_DROPOUT", raising=False)
        v0, (gl0, gx0) = jax.value_and_grad(loss, argnums=(0, 1))(layers, x)
        monkeypatch.setenv("EEGFLOW_MASK_DROPOUT", "1")
        v1, (gl1, gx1) = jax.value_and_grad(loss, argnums=(0, 1))(layers, x)
    finally:
        # monkeypatch restores the env at teardown, but the module globals
        # are snapshots — re-sync them to the ORIGINAL env here
        for k in extra_env:
            monkeypatch.delenv(k, raising=False)
        nn_layers.refresh_flags()
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gl0), jax.tree.leaves(gl1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               atol=1e-5, rtol=1e-5)


def test_fwd_kernel_writes_dropped_copy_semantics():
    """``out_keep < 1`` with an explicit ``out_mask``: the forward kernel's
    h_drop output equals where(mask, h/keep, 0) of the UNDROPPED h it also
    returns — both traversal directions (the forward-kernel-writes-the-
    dropped-copy mode, EEGFLOW_FWD_DROPW, which removes the inter-layer XLA
    dropout fusion; ref dropout semantics 04_lstm_model.py:181-188)."""
    from eegflow.nn.pallas_lstm import lstm_fwd_fused_proj

    d_in, hid, keep = 8, 16, 0.7
    params = lstm_layer_init(jax.random.key(61), d_in, hid)
    rng = np.random.default_rng(61)
    x = jnp.asarray(rng.standard_normal((8, 16, d_in)), jnp.float32)
    om = jnp.asarray(rng.random((8, 16, hid)) < keep, jnp.uint8)
    for reverse in (False, True):
        h, _, _, _, _, _, hd = lstm_fwd_fused_proj(
            (x,), params["w_ih"], params["b"], params["w_hh"],
            out_keep=keep, out_mask=om, batch_tile=8, t_chunk=8,
            interpret=True, reverse=reverse)
        expect = np.where(np.asarray(om) != 0, np.asarray(h) / keep, 0.0)
        np.testing.assert_allclose(np.asarray(hd), expect, atol=1e-6)
    # drop rate sanity on the realized zeros
    frac = float((np.asarray(hd) == 0.0).mean())
    assert abs(frac - (1 - keep)) < 0.05, frac


def test_fwd_dropw_mode2_bit_identical_to_select():
    """EEGFLOW_FWD_DROPW=2 (forward kernels write the inter-layer dropped
    copies from XLA-generated uint8 masks) is BIT-IDENTICAL to the default
    select path — identical dropout_mask streams, identical mask_from_x
    backward — for stack outputs AND every gradient leaf."""
    import os

    from eegflow.nn.lstm import bilstm_stack_apply, bilstm_stack_init

    layers = bilstm_stack_init(jax.random.key(71), 12, 16, 3)
    x = jax.random.normal(jax.random.key(72), (8, 16, 12), jnp.float32)
    dk, idk = jax.random.key(73), jax.random.key(74)

    def run(mode):
        os.environ["EEGFLOW_FWD_DROPW"] = mode
        try:
            jax.clear_caches()

            def loss(ls):
                out = bilstm_stack_apply(
                    ls, x, inter_dropout=0.4, train=True, dropout_key=dk,
                    compute_dtype=jnp.bfloat16, impl="pallas",
                    input_dropout=0.3, input_dropout_key=idk)
                return jnp.sum(jnp.tanh(out)), out

            return jax.value_and_grad(loss, has_aux=True)(layers)
        finally:
            os.environ.pop("EEGFLOW_FWD_DROPW", None)
            jax.clear_caches()

    (l0, o0), g0 = run("0")
    (l2, o2), g2 = run("2")
    assert float(l0) == float(l2)
    assert jnp.array_equal(o0, o2)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g2)):
        assert jnp.array_equal(a, b)
