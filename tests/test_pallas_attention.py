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
