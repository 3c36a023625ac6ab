"""Attention pooling modules.

* :func:`additive_attention_*` — the reference's ``Attention`` (additive /
  Bahdanau-style pooling: Linear(H -> H/2) -> tanh -> Linear(H/2 -> 1) ->
  softmax over time -> weighted sum; ref 04_lstm_model.py:112-128). This is
  what the shipped model uses.
* :func:`multihead_attention_*` — the reference's ``MultiHeadAttention``
  (4-head QKV self-attention with head-averaged weights; ref 04:73-109).
  Declared-but-unused in the reference model; provided here as a usable,
  tested component for architecture experiments.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from eegflow.nn.layers import dense_apply, dense_init


def additive_attention_init(key: jax.Array, hidden: int) -> Dict[str, Dict[str, jnp.ndarray]]:
    k1, k2 = jax.random.split(key)
    return {
        "proj": dense_init(k1, hidden, hidden // 2),
        "score": dense_init(k2, hidden // 2, 1),
    }


def additive_attention_apply(
    params: Dict[str, Dict[str, jnp.ndarray]], x: jnp.ndarray, compute_dtype=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, H) -> (context (B, H), weights (B, T)); softmax over time."""
    scores = dense_apply(
        params["score"], jnp.tanh(dense_apply(params["proj"], x, compute_dtype)),
        compute_dtype,
    )  # (B, T, 1)
    weights = jax.nn.softmax(scores, axis=1)
    context = jnp.sum(weights * x, axis=1)
    return context, weights[..., 0]


def multihead_attention_init(
    key: jax.Array, hidden: int, num_heads: int = 4
) -> Dict[str, object]:
    del num_heads  # head count is an apply-time arg: params hold ONLY arrays
    ks = jax.random.split(key, 4)
    return {
        "query": dense_init(ks[0], hidden, hidden),
        "key": dense_init(ks[1], hidden, hidden),
        "value": dense_init(ks[2], hidden, hidden),
        "out": dense_init(ks[3], hidden, hidden),
    }


def multihead_attention_apply(
    params: Dict[str, object], x: jnp.ndarray, num_heads: int = 4,
    compute_dtype=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, H) -> (output (B, T, H), head+query-averaged weights (B, T)).

    ``num_heads`` is a static argument, not a params leaf — an int leaf
    would break ``jax.grad`` over the params pytree (non-inexact dtype).
    """
    b, t, hdim = x.shape
    n_heads = num_heads
    head_dim = hdim // n_heads

    def split_heads(y):
        return jnp.swapaxes(y.reshape(b, t, n_heads, head_dim), 1, 2)  # (B, nh, T, hd)

    q = split_heads(dense_apply(params["query"], x, compute_dtype))
    k = split_heads(dense_apply(params["key"], x, compute_dtype))
    v = split_heads(dense_apply(params["value"], x, compute_dtype))

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (head_dim**-0.5)
    weights = jax.nn.softmax(scores, axis=-1)
    context = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    context = jnp.swapaxes(context, 1, 2).reshape(b, t, hdim)
    out = dense_apply(params["out"], context, compute_dtype)
    avg_weights = jnp.mean(weights, axis=(1, 2))  # (B, T): mean over heads+queries
    return out, avg_weights
