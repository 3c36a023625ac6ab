"""Fused Pallas TPU kernel for the LSTM recurrence.

The scan-based layer (eegflow.nn.lstm) already hoists the input projection
``x @ W_ih`` into one large MXU matmul; what remains sequential is the
recurrence ``h @ W_hh`` + gate math over T steps. This kernel runs that
recurrence with the hidden/cell state pinned in VMEM across ALL timesteps:

* grid = (batch_tiles, time_chunks), time innermost — the TPU grid executes
  sequentially, so VMEM scratch (h, c) carries across time chunks, and
  Pallas' pipeline machinery double-buffers the (B_tile, T_chunk, 4H) gate
  blocks from HBM behind the compute (the guide's accumulator pattern);
* W_hh lives in VMEM for the whole kernel (one (H, 4H) buffer);
* each grid step computes T_chunk cell updates, each a (B_tile, H) x (H, 4H)
  MXU matmul plus VPU gate math, writing the (B_tile, T_chunk, H) output
  block in place.

State resets when a new batch tile begins (time index 0). The reverse
direction reuses the same kernel on a time-flipped gate tensor.

Numerics match eegflow.nn.lstm.lstm_layer_apply exactly in f32 (tested in
interpret mode on CPU and compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_chunk_kernel(gates_ref, w_hh_ref, out_ref, h_ref, c_ref, *,
                       t_chunk: int, hidden: int):
    """One (batch_tile, time_chunk) grid step of the recurrence."""

    @pl.when(pl.program_id(1) == 0)
    def _reset_state():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def step(i, _):
        h = h_ref[:]
        c = c_ref[:]
        z = gates_ref[:, i, :] + jnp.dot(
            h, w_hh_ref[:], preferred_element_type=jnp.float32
        )
        gi = jax.nn.sigmoid(z[:, :hidden])
        gf = jax.nn.sigmoid(z[:, hidden : 2 * hidden])
        gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
        go = jax.nn.sigmoid(z[:, 3 * hidden :])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        out_ref[:, i, :] = h_new
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "t_chunk", "interpret")
)
def lstm_recurrence_pallas(
    gates_all: jnp.ndarray,
    w_hh: jnp.ndarray,
    batch_tile: int = 128,
    t_chunk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, T, 4H) precomputed gates + (H, 4H) W_hh -> (B, T, H) hidden states.

    B must be a multiple of ``batch_tile`` and T of ``t_chunk`` (callers pad).
    """
    b, t, g4 = gates_all.shape
    hidden = g4 // 4
    assert b % batch_tile == 0 and t % t_chunk == 0

    grid = (b // batch_tile, t // t_chunk)
    kernel = functools.partial(_lstm_chunk_kernel, t_chunk=t_chunk, hidden=hidden)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, t_chunk, 4 * hidden),
                lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (hidden, 4 * hidden), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, t_chunk, hidden),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # h
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # c
        ],
        interpret=interpret,
    )(gates_all.astype(jnp.float32), w_hh.astype(jnp.float32))


def _auto_interpret(interpret: Optional[bool]) -> bool:
    """Default to interpret mode off-TPU (CPU tests, dry runs)."""
    if interpret is not None:
        return interpret
    return jax.default_backend() != "tpu"


def _pick_tile(n: int, preferred: int) -> int:
    """Largest divisor of n that is <= preferred (>=1)."""
    tile = min(preferred, n)
    while n % tile:
        tile -= 1
    return tile


def pallas_lstm_layer_apply(
    params: Dict[str, jnp.ndarray],
    x: jnp.ndarray,
    reverse: bool = False,
    compute_dtype=None,
    batch_tile: int = 128,
    t_chunk: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Drop-in replacement for eegflow.nn.lstm.lstm_layer_apply.

    Input projection stays an XLA einsum (it's already one big MXU matmul);
    the recurrence runs in the fused kernel. Batch is padded up to the tile
    size; time uses the largest chunk dividing T.
    """
    w_ih, w_hh, b_vec = params["w_ih"], params["w_hh"], params["b"]
    if compute_dtype is not None:
        gates_all = (
            jnp.einsum(
                "btd,dg->btg", x.astype(compute_dtype), w_ih.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ) + b_vec
        )
    else:
        gates_all = jnp.einsum("btd,dg->btg", x, w_ih) + b_vec

    if reverse:
        gates_all = jnp.flip(gates_all, axis=1)

    b_sz, t, _ = gates_all.shape
    bt = _pick_tile(b_sz, batch_tile) if b_sz < batch_tile else batch_tile
    pad_b = (-b_sz) % bt
    if pad_b:
        gates_all = jnp.pad(gates_all, ((0, pad_b), (0, 0), (0, 0)))
    tc = _pick_tile(t, t_chunk)

    out = lstm_recurrence_pallas(gates_all, w_hh, batch_tile=bt, t_chunk=tc,
                                 interpret=_auto_interpret(interpret))
    out = out[:b_sz]
    if reverse:
        out = jnp.flip(out, axis=1)
    return out


def pallas_bilstm_stack_apply(
    layers,
    x: jnp.ndarray,
    compute_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Bidirectional multi-layer stack on the Pallas recurrence (inference
    path — no inter-layer dropout)."""
    out = x
    for layer in layers:
        fwd = pallas_lstm_layer_apply(layer["fwd"], out,
                                      compute_dtype=compute_dtype,
                                      interpret=interpret)
        if "bwd" in layer:
            bwd = pallas_lstm_layer_apply(layer["bwd"], out, reverse=True,
                                          compute_dtype=compute_dtype,
                                          interpret=interpret)
            out = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            out = fwd
    return out


# ---------------------------------------------------------------------------
# Training-safe fused layer: Pallas forward, scan-derived backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_layer_fused(w_ih, w_hh, b, x, reverse: bool = False):
    """LSTM layer with the Pallas forward and an exact backward.

    The backward pass re-runs the reference ``lax.scan`` implementation under
    ``jax.vjp`` (rematerialization) — gradients are identical to the pure-scan
    layer because the Pallas forward is bit-exact, while the forward half of
    every training step gets the fused-kernel speedup.
    """
    return pallas_lstm_layer_apply({"w_ih": w_ih, "w_hh": w_hh, "b": b}, x,
                                   reverse=reverse)


def _fused_fwd(w_ih, w_hh, b, x, reverse):
    out = pallas_lstm_layer_apply({"w_ih": w_ih, "w_hh": w_hh, "b": b}, x,
                                  reverse=reverse)
    return out, (w_ih, w_hh, b, x)


def _fused_bwd(reverse, residuals, g):
    from eegflow.nn.lstm import lstm_layer_apply

    w_ih, w_hh, b, x = residuals

    def ref_fn(w_ih, w_hh, b, x):
        return lstm_layer_apply({"w_ih": w_ih, "w_hh": w_hh, "b": b}, x,
                                reverse=reverse)

    _, vjp = jax.vjp(ref_fn, w_ih, w_hh, b, x)
    return vjp(g)


lstm_layer_fused.defvjp(_fused_fwd, _fused_bwd)
