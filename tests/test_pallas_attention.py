"""Fused attention-pooling kernel vs the reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegflow.nn.attention import additive_attention_apply, additive_attention_init
from eegflow.nn.pallas_attention import pallas_attention_apply


@pytest.mark.parametrize("b,t,d", [(8, 32, 16), (5, 24, 32)])
def test_pallas_attention_matches_reference(b, t, d):
    params = additive_attention_init(jax.random.key(0), d)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((b, t, d)), jnp.float32)
    ctx_ref, w_ref = additive_attention_apply(params, x)
    ctx, w = pallas_attention_apply(params, x, batch_tile=4, t_chunk=8,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)


def test_pallas_attention_online_softmax_stability():
    """Large score magnitudes must not overflow (online max-rescaling)."""
    d = 16
    params = additive_attention_init(jax.random.key(1), d)
    # scale up inputs so raw scores are large
    x = jnp.asarray(50.0 * np.random.default_rng(1).standard_normal((4, 16, d)),
                    jnp.float32)
    ctx_ref, w_ref = additive_attention_apply(params, x)
    ctx, w = pallas_attention_apply(params, x, batch_tile=4, t_chunk=4,
                                    interpret=True)
    assert np.isfinite(np.asarray(ctx)).all()
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("use_ln", [True, False])
@pytest.mark.parametrize("n_parts", [1, 2])
def test_pool_head_fused_matches_xla(use_ln, n_parts):
    """Fused LN+attention pool head (fwd + custom VJP) matches the XLA
    LayerNorm -> additive-attention reference on parts, incl. all grads."""
    from eegflow.nn.attention import additive_attention_apply, additive_attention_init
    from eegflow.nn.layers import layer_norm_apply, layer_norm_init
    from eegflow.nn.pallas_attention import pool_head_fused

    d_p, t, b = 16, 16, 8
    d = d_p * n_parts
    rng = np.random.default_rng(31)
    attn = additive_attention_init(jax.random.key(31), d)
    ln = layer_norm_init(d)
    ln = {"scale": jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1 + 1.0,
          "bias": jnp.asarray(rng.standard_normal(d), jnp.float32) * 0.1}
    xs = tuple(jnp.asarray(rng.standard_normal((b, t, d_p)), jnp.float32)
               for _ in range(n_parts))
    x = xs[0] if n_parts == 1 else jnp.concatenate(xs, axis=-1)

    def ref_fn(ln_p, attn_p, xc):
        h = layer_norm_apply(ln_p, xc) if use_ln else xc
        ctx, w = additive_attention_apply(attn_p, h)
        return ctx, w

    ctx_ref, w_ref = ref_fn(ln, attn, x)

    ctx_parts, scores = pool_head_fused(ln if use_ln else None, attn, xs,
                                        use_ln=use_ln, bf16=False)
    ctx = (ctx_parts[0] if n_parts == 1
           else jnp.concatenate(ctx_parts, axis=-1))
    w = jax.nn.softmax(scores + attn["score"]["b"][0], axis=-1)
    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=2e-6)

    def loss_fused(ln_p, attn_p, xs):
        cps, sc = pool_head_fused(ln_p if use_ln else None, attn_p, xs,
                                  use_ln=use_ln, bf16=False)
        c = cps[0] if len(cps) == 1 else jnp.concatenate(cps, axis=-1)
        return jnp.sum(jnp.tanh(c)) + jnp.sum(jnp.sin(sc))

    def loss_ref(ln_p, attn_p, xc):
        h = layer_norm_apply(ln_p, xc) if use_ln else xc
        scores = jnp.squeeze(
            jnp.einsum("btk,ko->bto",
                       jnp.tanh(jnp.einsum("btd,dk->btk", h, attn_p["proj"]["w"])
                                + attn_p["proj"]["b"]),
                       attn_p["score"]["w"]), -1)
        wgt = jax.nn.softmax(scores, axis=1)
        ctx = jnp.sum(wgt[..., None] * h, axis=1)
        # fused scores exclude b2 (softmax-invariant); mirror that here
        return jnp.sum(jnp.tanh(ctx)) + jnp.sum(jnp.sin(scores))

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(ln, attn, xs)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(ln, attn, x)
    # x grads: concat fused parts
    gx_f = (g_f[2][0] if n_parts == 1
            else jnp.concatenate(g_f[2], axis=-1))
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(g_r[2]),
                               atol=3e-5, rtol=1e-3)
    if use_ln:
        for k in ("scale", "bias"):
            np.testing.assert_allclose(np.asarray(g_f[0][k]),
                                       np.asarray(g_r[0][k]),
                                       atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f[1]["proj"]["w"]),
                               np.asarray(g_r[1]["proj"]["w"]),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f[1]["proj"]["b"]),
                               np.asarray(g_r[1]["proj"]["b"]),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_f[1]["score"]["w"]),
                               np.asarray(g_r[1]["score"]["w"]),
                               atol=3e-5, rtol=1e-3)
