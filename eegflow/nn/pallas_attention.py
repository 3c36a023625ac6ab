"""Fused Pallas kernel for additive-attention pooling.

Computes the reference's attention pooling (ref 04_lstm_model.py:112-128) —
``scores = tanh(h @ W1 + b1) @ w2``, softmax over time, weighted sum — in one
pass over time chunks with an ONLINE softmax (the flash-attention trick):
running max / denominator / weighted accumulator live in VMEM scratch, so the
(B, T) score matrix is never re-read and the (B, T, D) sequence streams
through VMEM exactly once.

The score projection's second stage is a (D/2,)-weighted reduction rather
than a 1-wide matmul (TPU lanes want >=128-wide last dims). ``b2`` shifts all
scores by a constant, which softmax ignores; it is added to the returned raw
scores outside the kernel for exact parity.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_pool_kernel(
    h_ref, w1_ref, b1_ref, w2_ref, scores_out_ref, ctx_out_ref,
    m_ref, l_ref, acc_ref, scores_scratch, *, t_chunk: int,
):
    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _reset():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = h_ref[:]  # (Bt, Tc, D)
    bt, tc, d = h.shape
    proj = jnp.tanh(
        jnp.dot(h.reshape(bt * tc, d), w1_ref[:],
                preferred_element_type=jnp.float32) + b1_ref[0, :]
    )  # (Bt*Tc, D/2)
    s = jnp.sum(proj * w2_ref[0, :], axis=-1).reshape(bt, tc)  # (Bt, Tc)
    # chunk index is a leading (untiled) scratch dim — lane-alignment-safe
    scores_scratch[j] = s

    m_old = m_ref[:]  # (Bt, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    scale = jnp.exp(m_old - m_new)
    p = jnp.exp(s - m_new)  # (Bt, Tc)
    l_ref[:] = l_ref[:] * scale + jnp.sum(p, axis=-1, keepdims=True)
    # batched-dim dot_general doesn't lower in Mosaic; multiply-reduce on the
    # VPU instead (p broadcasts over the feature axis)
    acc_ref[:] = acc_ref[:] * scale + jnp.sum(p[:, :, None] * h, axis=1)
    m_ref[:] = m_new

    @pl.when(j == n_chunks - 1)
    def _finalize():
        ctx_out_ref[:] = acc_ref[:] / l_ref[:]
        # static per-chunk copies into the (Bt, T) output layout
        for c in range(scores_scratch.shape[0]):
            scores_out_ref[:, c * t_chunk : (c + 1) * t_chunk] = scores_scratch[c]


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "t_chunk", "interpret")
)
def attention_pool_pallas(
    h: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    batch_tile: int = 128,
    t_chunk: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, D) -> (context (B, D), raw scores (B, T)).

    B must be a multiple of ``batch_tile``, T of ``t_chunk`` (callers pad).
    """
    b, t, d = h.shape
    assert b % batch_tile == 0 and t % t_chunk == 0
    d_half = w1.shape[1]

    kernel = functools.partial(_attention_pool_kernel, t_chunk=t_chunk)
    scores, ctx = pl.pallas_call(
        kernel,
        grid=(b // batch_tile, t // t_chunk),
        in_specs=[
            pl.BlockSpec((batch_tile, t_chunk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d_half), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_half), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_half), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((batch_tile, t), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch_tile, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, 1), jnp.float32),         # running max
            pltpu.VMEM((batch_tile, 1), jnp.float32),         # running denom
            pltpu.VMEM((batch_tile, d), jnp.float32),         # weighted acc
            pltpu.VMEM((t // t_chunk, batch_tile, t_chunk), jnp.float32),  # scores
        ],
        interpret=interpret,
    )(h.astype(jnp.float32), w1.astype(jnp.float32),
      b1.reshape(1, -1).astype(jnp.float32), w2.reshape(1, -1).astype(jnp.float32))
    return ctx, scores


def pallas_attention_apply(
    params: Dict[str, Dict[str, jnp.ndarray]],
    x: jnp.ndarray,
    batch_tile: int = 128,
    t_chunk: int = 8,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for eegflow.nn.attention.additive_attention_apply:
    (B, T, H) -> (context (B, H), weights (B, T))."""
    from eegflow.nn.pallas_lstm import _auto_interpret, _pick_tile

    w1 = params["proj"]["w"]
    b1 = params["proj"]["b"]
    w2 = params["score"]["w"][:, 0]
    b2 = params["score"]["b"][0]

    b_sz, t, d = x.shape
    bt = _pick_tile(b_sz, batch_tile) if b_sz < batch_tile else batch_tile
    pad_b = (-b_sz) % bt
    if pad_b:
        x = jnp.pad(x, ((0, pad_b), (0, 0), (0, 0)))
    tc = _pick_tile(t, t_chunk)

    ctx, scores = attention_pool_pallas(
        x, w1, b1, w2, batch_tile=bt, t_chunk=tc,
        interpret=_auto_interpret(interpret),
    )
    weights = jax.nn.softmax(scores[:b_sz] + b2, axis=-1)
    return ctx[:b_sz], weights
