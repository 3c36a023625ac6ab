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


def _lstm_chunk_kernel(gates_ref, w_hh_ref, out_ref, cell_out_ref, h_ref, c_ref, *,
                       t_chunk: int, hidden: int, bf16: bool = False):
    """One (batch_tile, time_chunk) grid step of the recurrence.

    ``bf16`` runs the recurrent matmul in bfloat16 (W_hh arrives bf16, h is
    cast per step) with f32 accumulation; the carried state stays f32.
    """

    @pl.when(pl.program_id(1) == 0)
    def _reset_state():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    def step(i, _):
        h = h_ref[:]
        c = c_ref[:]
        h_mm = h.astype(jnp.bfloat16) if bf16 else h
        z = gates_ref[:, i, :] + jnp.dot(
            h_mm, w_hh_ref[:], preferred_element_type=jnp.float32
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
        if cell_out_ref is not None:
            cell_out_ref[:, i, :] = c_new
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)


@functools.partial(
    jax.jit,
    static_argnames=("batch_tile", "t_chunk", "interpret", "collect_cell", "bf16"),
)
def lstm_recurrence_pallas(
    gates_all: jnp.ndarray,
    w_hh: jnp.ndarray,
    batch_tile: int = 128,
    t_chunk: int = 8,
    interpret: bool = False,
    collect_cell: bool = False,
    bf16: bool = False,
):
    """(B, T, 4H) precomputed gates + (H, 4H) W_hh -> (B, T, H) hidden states
    (plus the cell-state sequence when ``collect_cell`` — the training path
    saves it as the backward kernel's residual).

    B must be a multiple of ``batch_tile`` and T of ``t_chunk`` (callers pad).
    """
    b, t, g4 = gates_all.shape
    hidden = g4 // 4
    assert b % batch_tile == 0 and t % t_chunk == 0

    grid = (b // batch_tile, t // t_chunk)
    block = pl.BlockSpec((batch_tile, t_chunk, hidden), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)

    if collect_cell:
        kernel = functools.partial(_lstm_chunk_kernel, t_chunk=t_chunk,
                                   hidden=hidden, bf16=bf16)
        out_specs = (block, block)
        out_shape = (jax.ShapeDtypeStruct((b, t, hidden), jnp.float32),
                     jax.ShapeDtypeStruct((b, t, hidden), jnp.float32))
    else:
        def kernel(gates_ref, w_hh_ref, out_ref, h_ref, c_ref):
            _lstm_chunk_kernel(gates_ref, w_hh_ref, out_ref, None, h_ref, c_ref,
                               t_chunk=t_chunk, hidden=hidden, bf16=bf16)

        out_specs = block
        out_shape = jax.ShapeDtypeStruct((b, t, hidden), jnp.float32)

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
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # h
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # c
        ],
        interpret=interpret,
    )(gates_all.astype(jnp.float32),
      w_hh.astype(jnp.bfloat16 if bf16 else jnp.float32))


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
# Backward kernel: reverse-time recurrence, dW_hh accumulated in VMEM
# ---------------------------------------------------------------------------


def _lstm_bwd_chunk_kernel(
    gates_ref, hprev_ref, cprev_ref, c_ref, g_ref, w_hh_ref,
    dgates_ref, dwhh_ref, dh_ref, dc_ref, *, t_chunk: int, hidden: int,
    bf16: bool = False,
):
    """One reverse-time (batch_tile, time_chunk) grid step of LSTM backprop.

    Standard LSTM adjoint, gate order i,f,g,o:
        do = dh . tanh(c);  dc += dh . o . (1 - tanh^2 c)
        di = dc.g  df = dc.c_prev  dg = dc.i;  dc_carry = dc.f
        dz = [di i(1-i), df f(1-f), dg (1-g^2), do o(1-o)]
        dh_carry = dz @ W_hh^T;  dW_hh += h_prev^T dz
    The (h, c, dh, dc) carries live in VMEM scratch across time chunks; the
    per-batch-tile dW_hh accumulates in its revisited output block.
    """

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)

    def step(s, _):
        i_t = t_chunk - 1 - s  # iterate the chunk in reverse time
        h_prev = hprev_ref[:, i_t, :].astype(jnp.float32)
        c_prev = cprev_ref[:, i_t, :].astype(jnp.float32)
        c_t = c_ref[:, i_t, :].astype(jnp.float32)
        h_mm = h_prev.astype(jnp.bfloat16) if bf16 else h_prev
        z = gates_ref[:, i_t, :].astype(jnp.float32) + jnp.dot(
            h_mm, w_hh_ref[:], preferred_element_type=jnp.float32
        )
        gi = jax.nn.sigmoid(z[:, :hidden])
        gf = jax.nn.sigmoid(z[:, hidden : 2 * hidden])
        gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
        go = jax.nn.sigmoid(z[:, 3 * hidden :])
        tc = jnp.tanh(c_t)

        dh = g_ref[:, i_t, :].astype(jnp.float32) + dh_ref[:]
        do = dh * tc
        dc = dh * go * (1.0 - tc * tc) + dc_ref[:]
        di = dc * gg
        df = dc * c_prev
        dg = dc * gi
        dc_ref[:] = dc * gf

        dz = jnp.concatenate(
            [di * gi * (1.0 - gi), df * gf * (1.0 - gf),
             dg * (1.0 - gg * gg), do * go * (1.0 - go)],
            axis=-1,
        )
        dgates_ref[:, i_t, :] = dz
        dz_mm = dz.astype(jnp.bfloat16) if bf16 else dz
        dh_ref[:] = jnp.dot(dz_mm, w_hh_ref[:].T,
                            preferred_element_type=jnp.float32)
        dwhh_ref[0, :, :] += jnp.dot(
            (h_mm if bf16 else h_prev).T, dz_mm,
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, t_chunk, step, 0)


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "t_chunk", "interpret", "bf16")
)
def lstm_recurrence_backward(
    gates_all: jnp.ndarray,
    h_seq: jnp.ndarray,
    c_seq: jnp.ndarray,
    w_hh: jnp.ndarray,
    g_out: jnp.ndarray,
    batch_tile: int = 64,
    t_chunk: int = 8,
    interpret: bool = False,
    bf16: bool = False,
):
    """Backward through the recurrence: returns (dgates (B,T,4H), dw_hh (H,4H)).

    Gate pre-activations are recomputed from ``gates_all`` + the saved hidden
    sequence (cheaper than storing z). Time chunks are visited newest-first
    via a reversed index map; dW_hh accumulates per batch tile and is summed
    across tiles at the end. ``bf16`` runs the three per-step matmuls in
    bfloat16 with f32 accumulation (W_hh bf16-resident; sequence blocks stay
    f32 — Mosaic's 16-row bf16 sublane tiles preclude dynamic time indexing
    into bf16 sequence blocks at t_chunk=8).
    """
    b, t, g4 = gates_all.shape
    hidden = g4 // 4
    assert b % batch_tile == 0 and t % t_chunk == 0
    n_btiles = b // batch_tile
    n_chunks = t // t_chunk

    zeros_first = jnp.zeros((b, 1, hidden), jnp.float32)
    h_prev_seq = jnp.concatenate(
        [zeros_first, h_seq[:, :-1, :].astype(jnp.float32)], axis=1)
    c_prev_seq = jnp.concatenate(
        [zeros_first, c_seq[:, :-1, :].astype(jnp.float32)], axis=1)

    def rev(i, j):
        return (i, n_chunks - 1 - j, 0)

    seq_spec = lambda width: pl.BlockSpec(
        (batch_tile, t_chunk, width), rev, memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_lstm_bwd_chunk_kernel, t_chunk=t_chunk,
                               hidden=hidden, bf16=bf16)
    dgates, dwhh_tiles = pl.pallas_call(
        kernel,
        grid=(n_btiles, n_chunks),
        in_specs=[
            seq_spec(4 * hidden),                       # gates
            seq_spec(hidden),                           # h_prev
            seq_spec(hidden),                           # c_prev
            seq_spec(hidden),                           # c
            seq_spec(hidden),                           # g_out
            pl.BlockSpec((hidden, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),      # w_hh
        ],
        out_specs=(
            seq_spec(4 * hidden),                       # dgates
            pl.BlockSpec((1, hidden, 4 * hidden), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),      # dw_hh per batch tile
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, 4 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((n_btiles, hidden, 4 * hidden), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dh carry
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dc carry
        ],
        interpret=interpret,
    )(
        gates_all.astype(jnp.float32), h_prev_seq, c_prev_seq,
        c_seq.astype(jnp.float32), g_out.astype(jnp.float32),
        w_hh.astype(jnp.bfloat16 if bf16 else jnp.float32),
    )
    return dgates, jnp.sum(dwhh_tiles, axis=0)


# ---------------------------------------------------------------------------
# Training-safe fused layer: Pallas forward, Pallas backward
# ---------------------------------------------------------------------------


_FUSED_BATCH_TILE = 128
_FUSED_T_CHUNK = 8


def _fused_pipeline_fwd(w_ih, w_hh, b, x, reverse, bf16=False):
    """Shared forward: gates einsum -> (flip) -> pad -> Pallas recurrence."""
    if bf16:
        gates = jnp.einsum(
            "btd,dg->btg", x.astype(jnp.bfloat16), w_ih.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ) + b
    else:
        gates = jnp.einsum("btd,dg->btg", x, w_ih) + b
    if reverse:
        gates = jnp.flip(gates, axis=1)
    b_sz, t, _ = gates.shape
    bt = _pick_tile(b_sz, _FUSED_BATCH_TILE) if b_sz < _FUSED_BATCH_TILE \
        else _FUSED_BATCH_TILE
    pad_b = (-b_sz) % bt
    if pad_b:
        gates = jnp.pad(gates, ((0, pad_b), (0, 0), (0, 0)))
    tc = _pick_tile(t, _FUSED_T_CHUNK)
    h_pad, c_pad = lstm_recurrence_pallas(
        gates, w_hh, batch_tile=bt, t_chunk=tc,
        interpret=_auto_interpret(None), collect_cell=True, bf16=bf16,
    )
    return gates, h_pad, c_pad, bt, tc, b_sz


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lstm_layer_fused(w_ih, w_hh, b, x, reverse: bool = False, bf16: bool = False):
    """LSTM layer with Pallas forward AND Pallas backward kernels.

    Gradients match the pure ``lax.scan`` layer (the adjoint recursion is
    exact, tested to 1e-4); both time directions of every training step run
    the fused VMEM-resident recurrence. ``bf16`` applies the mixed-precision
    policy (bf16 matmuls, f32 accumulation/state) in both kernels.
    """
    _, h_pad, _, _, _, b_sz = _fused_pipeline_fwd(w_ih, w_hh, b, x, reverse,
                                                  bf16)
    out = h_pad[:b_sz]
    return jnp.flip(out, axis=1) if reverse else out


def _fused_fwd(w_ih, w_hh, b, x, reverse, bf16):
    gates, h_pad, c_pad, bt, tc, b_sz = _fused_pipeline_fwd(w_ih, w_hh, b, x,
                                                            reverse, bf16)
    out = h_pad[:b_sz]
    if reverse:
        out = jnp.flip(out, axis=1)
    return out, (w_ih, w_hh, x, gates, h_pad, c_pad)


def _fused_bwd(reverse, bf16, residuals, g):
    w_ih, w_hh, x, gates, h_pad, c_pad = residuals
    b_sz = x.shape[0]
    pad_b = gates.shape[0] - b_sz
    # TPU tiling: the block's sublane dim (t_chunk) must divide by 8, so the
    # backward uses t_chunk=8 with a smaller batch tile to stay in VMEM.
    # always pick a tile that divides the padded batch (the forward pads to
    # its OWN tile, e.g. B=96 stays 96, which 64 does not divide)
    bwd_bt = 64
    bt = _pick_tile(gates.shape[0], bwd_bt)
    tc = _pick_tile(gates.shape[1], _FUSED_T_CHUNK)

    g_in = jnp.flip(g, axis=1) if reverse else g  # into the flipped-time domain
    if pad_b:
        g_in = jnp.pad(g_in, ((0, pad_b), (0, 0), (0, 0)))

    dgates_pad, dw_hh = lstm_recurrence_backward(
        gates, h_pad, c_pad, w_hh, g_in, batch_tile=bt, t_chunk=tc,
        interpret=_auto_interpret(None), bf16=bf16,
    )
    dgates = dgates_pad[:b_sz]
    if reverse:
        dgates = jnp.flip(dgates, axis=1)  # back to input-time domain

    if bf16:
        dw_ih = jnp.einsum("btd,btg->dg", x.astype(jnp.bfloat16),
                           dgates.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        dx = jnp.einsum("btg,dg->btd", dgates.astype(jnp.bfloat16),
                        w_ih.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    else:
        dw_ih = jnp.einsum("btd,btg->dg", x, dgates)
        dx = jnp.einsum("btg,dg->btd", dgates, w_ih)
    db = jnp.sum(dgates, axis=(0, 1))
    return dw_ih, dw_hh, db, dx


lstm_layer_fused.defvjp(_fused_fwd, _fused_bwd)
