"""Fused Pallas TPU kernels for the LSTM recurrence (forward AND backward).

The scan-based layer (eegflow.nn.lstm) already hoists the input projection
``x @ W_ih`` into one large MXU matmul; what remains sequential is the
recurrence ``h @ W_hh`` + gate math over T steps. These kernels run that
recurrence with the hidden/cell state pinned in VMEM across ALL timesteps:

* grid = (batch_tiles, time_chunks), time innermost — the TPU grid executes
  sequentially, so VMEM scratch (h, c) carries across time chunks, and
  Pallas' pipeline machinery double-buffers the (B_tile, T_chunk, 4H) gate
  blocks from HBM behind the compute;
* W_hh lives in VMEM for the whole kernel (one (H, 4H) buffer);
* the within-chunk time loop is UNROLLED (static sublane offsets — dynamic
  indices forced slow Mosaic paths, ~2 µs/step regardless of matmul count);
* the reverse direction runs IN-KERNEL by visiting time chunks (and steps
  within a chunk) in reverse, writing outputs at their natural positions —
  device profiles showed the old host-side ``jnp.flip`` pairs cost ~23 ms per
  train step at the reference batch size;
* the backward kernels read the chunk-boundary "previous" states from small
  strided side tensors instead of full shifted copies (the old
  concat-of-zeros pads cost ~5 ms/step);
* the AMP hot path (``lstm_layer_fused`` with ``bf16=True``) uses the
  fully-fused kernel pair further down: in-kernel input projection on the
  forward, in-kernel dx/dW_ih/dW_hh/db on the backward — see that section's
  header for the measured design rationale.

Numerics match eegflow.nn.lstm.lstm_layer_apply to ~1e-4 in f32 (sigmoid is
evaluated via the tanh identity — see _sigmoid — the only deviation source;
tested in interpret mode on CPU and compiled on TPU); gradients match the
scan layer's autodiff to ~1e-4 relative (f32) / ~0.4% relative under the
bf16 matmul policy. Replaces the reference's cuDNN fused LSTM
(ref 04_lstm_model.py:181-188).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def refresh_flags() -> None:
    """(Re-)read every EEGFLOW_* kernel experiment flag (docs/DESIGN.md §5)
    from the environment into this module's globals.

    Called once at import. In-process A/B sweeps (tools/profile_multi.py)
    call it again between configs so ONE process can measure many flag sets
    without paying per-process device init through the axon tunnel. Callers
    flipping flags in-process MUST also call ``jax.clear_caches()``: the
    fused entry points are module-level ``jax.jit``s whose cached traces
    baked the previous flag values in (each flag set is a different traced
    program, invisible to the jit cache key). The per-flag rationale lives
    in comments at each flag's section of this file.
    """
    env = _os.environ.get
    g = globals()
    g["_BWD_TC"] = int(env("EEGFLOW_BWD_TC", "0"))
    g["_RES_BF16"] = int(env("EEGFLOW_RES_BF16", "0"))
    # measured default (r4 A/B on v5e: 40.15 vs 40.58 ms/step at B=512);
    # EEGFLOW_ADJOINT_RES=0 restores the raw-gate-residual schedule
    g["_ADJ_RES"] = int(env("EEGFLOW_ADJOINT_RES", "1"))
    # measured defaults (r5 ab_multi sweep on v5e, docs/ab_r5/ab_multi.json):
    # dual_both 39.77 ms/step (MFU 43.6%) vs 40.15 single-chain; 2-way is
    # the measured optimum (4-way chains regressed to 40.39)
    g["_FWD_DUAL"] = int(env("EEGFLOW_FWD_DUAL", "1"))
    g["_FWD_CHAINS"] = (int(env("EEGFLOW_FWD_CHAINS", "0"))
                        or (2 if g["_FWD_DUAL"] else 1))
    g["_BWD_CHAINS_ENV"] = int(env("EEGFLOW_BWD_CHAINS", "0"))
    g["_BWD_V2"] = int(env("EEGFLOW_BWD_V2", "0"))
    g["_BWD_PROBE_DUP"] = int(env("EEGFLOW_BWD_PROBE_DUP", "0"))
    g["_BWD_DUAL"] = int(env("EEGFLOW_BWD_DUAL", "1"))
    g["_BWD_CHAINS"] = g["_BWD_CHAINS_ENV"] or (2 if g["_BWD_DUAL"] else 1)
    g["_BWD_DUALDIR"] = int(env("EEGFLOW_BWD_DUALDIR", "0"))
    g["_DUALDIR_BT"] = int(env("EEGFLOW_DUALDIR_BT", "0"))
    g["_FUSED_BATCH_TILE"] = int(env("EEGFLOW_FUSED_BT", "128"))
    g["_FUSED_T_CHUNK"] = int(env("EEGFLOW_FUSED_TC", "8"))


refresh_flags()

# A/B flag: stream tanh(c) from the forward kernel as an extra residual so
# the backward kernel's serial adjoint chain drops its per-step tanh
# (the backward kernels are VPU-bound — see docs/ROUND3_RESULTS.md).
# _BWD_TC — read in refresh_flags() above.

# A/B flag: store the (B, T, 4H) post-activation gate residual in bf16
# instead of f32. The gates live in [-1, 1], so bf16 costs ~0.4% relative
# error on the adjoint's gate derivatives while halving the largest
# residual stream (537 MB -> 268 MB per layer-direction at B=512/T=256):
# the forward kernel is DMA-bound on residual writes and the backward
# re-reads the same bytes.
# _RES_BF16 — read in refresh_flags() above.

# A/B flag: precompute the adjoint's gate products in the FORWARD kernel
# (which is DMA-bound, i.e. has VPU slack) and store six bounded residual
# planes instead of the four raw gate activations:
#   A = g * i(1-i)        B = c_prev * f(1-f)     C = i * (1 - g^2)
#   E = o * (1 - tanh(c)^2)   F = f   G = tanh(c) * o(1-o)
# The VPU-bound backward chain then collapses to
#   dh = g_out + dh_carry; dc = dh*E + dc_carry;
#   dz = [dc*A, dc*B, dc*C, dh*G]; dc_carry = dc*F
# (~8 elementwise H-ops/step vs ~35, no transcendental) and needs NEITHER
# the c stream NOR c boundaries — B absorbs c_prev — so total backward DMA
# is unchanged (6H residual + h vs 4H + c + h) and the forward drops the
# (B, T, H) c_seq output entirely. Exact reassociation of the same math
# (f32-path kernel tests pass at 1e-5 vs scan autodiff). DEFAULT since
# round 5 (measured 40.15 vs 40.58 ms/step, /tmp→docs/traces/r4_k_adjres).
# _ADJ_RES — read in refresh_flags() above.

# A/B flag: split the FORWARD batch tile into two independent recurrence
# chains (row halves) — same ILP rationale as EEGFLOW_BWD_DUAL: the
# per-step chain is carry-matmul -> 4 transcendentals -> state update, and
# two interleavable chains let the scheduler overlap one half's matmul
# with the other half's VPU work.
# _FWD_DUAL — read in refresh_flags() above.

# A/B flag: generalize the dual-chain split to N independent chains per
# batch tile (the round-4 follow-on scoped in docs/ROADMAP.md: if 2 chains
# confirm the latency-bound hypothesis, deeper splits keep filling stalls
# until the VPU saturates). EEGFLOW_{FWD,BWD}_CHAINS=N (2 or 4) overrides;
# the DUAL flags remain aliases for 2. Each chain slice must stay
# (8, 128)-tile aligned, so batch_tile % (8 * chains) == 0 gates the split.
# _FWD_CHAINS / _BWD_CHAINS_ENV — read in refresh_flags() above.


def _sigmoid(x):
    """sigmoid via the tanh identity: Mosaic's tanh is ~2x cheaper than the
    exp+divide lowering of jax.nn.sigmoid, and the recurrence kernels are
    VPU-transcendental-bound (measured 2.10 -> 1.24 ms/layer-direction at
    B=512, T=256, H=256). Deviation from the exp form is ~5e-5 over a full
    256-step recurrence (different polynomial approximation, same function)."""
    return 0.5 * jnp.tanh(0.5 * x) + 0.5


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _lstm_chunk_kernel(gates_ref, w_hh_ref, out_ref, cell_out_ref, h_ref, c_ref,
                       *, t_chunk: int, hidden: int, reverse: bool,
                       bf16: bool = False):
    """One (batch_tile, time_chunk) grid step of the recurrence.

    ``bf16`` runs the recurrent matmul in bfloat16 (W_hh arrives bf16, h is
    cast per step) with f32 accumulation; the carried state stays f32.
    ``reverse`` iterates the chunk newest-first (the grid index map visits
    chunks newest-first too), producing the backward-direction sequence
    without any host-side flip.
    """

    @pl.when(pl.program_id(1) == 0)
    def _reset_state():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    for s in range(t_chunk):  # unrolled: static sublane offsets
        i = t_chunk - 1 - s if reverse else s
        h = h_ref[:]
        c = c_ref[:]
        h_mm = h.astype(jnp.bfloat16) if bf16 else h
        z = gates_ref[:, i, :] + jnp.dot(
            h_mm, w_hh_ref[:], preferred_element_type=jnp.float32
        )
        gi = _sigmoid(z[:, :hidden])
        gf = _sigmoid(z[:, hidden : 2 * hidden])
        gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
        go = _sigmoid(z[:, 3 * hidden :])
        c_new = gf * c + gi * gg
        h_new = go * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        out_ref[:, i, :] = h_new
        if cell_out_ref is not None:
            cell_out_ref[:, i, :] = c_new


@functools.partial(
    jax.jit,
    static_argnames=("batch_tile", "t_chunk", "interpret", "collect_cell",
                     "bf16", "reverse"),
)
def lstm_recurrence_pallas(
    gates_all: jnp.ndarray,
    w_hh: jnp.ndarray,
    batch_tile: int = 128,
    t_chunk: int = 8,
    interpret: bool = False,
    collect_cell: bool = False,
    bf16: bool = False,
    reverse: bool = False,
):
    """(B, T, 4H) precomputed gates + (H, 4H) W_hh -> (B, T, H) hidden states
    (plus the cell-state sequence when ``collect_cell`` — the training path
    saves it as the backward kernel's residual).

    With ``reverse`` the recurrence consumes time newest-first and writes each
    state at its natural position: ``out[t]`` is the state after consuming
    inputs T-1..t — exactly ``flip(scan(flip(gates)))`` without the flips.

    B must be a multiple of ``batch_tile`` and T of ``t_chunk`` (callers pad).
    """
    b, t, g4 = gates_all.shape
    hidden = g4 // 4
    assert b % batch_tile == 0 and t % t_chunk == 0
    n_chunks = t // t_chunk

    grid = (b // batch_tile, n_chunks)
    if reverse:
        seq_idx = lambda i, j: (i, n_chunks - 1 - j, 0)
    else:
        seq_idx = lambda i, j: (i, j, 0)
    block = pl.BlockSpec((batch_tile, t_chunk, hidden), seq_idx,
                         memory_space=pltpu.VMEM)

    if collect_cell:
        kernel = functools.partial(_lstm_chunk_kernel, t_chunk=t_chunk,
                                   hidden=hidden, reverse=reverse, bf16=bf16)
        out_specs = (block, block)
        out_shape = (jax.ShapeDtypeStruct((b, t, hidden), jnp.float32),
                     jax.ShapeDtypeStruct((b, t, hidden), jnp.float32))
    else:
        def kernel(gates_ref, w_hh_ref, out_ref, h_ref, c_ref):
            _lstm_chunk_kernel(gates_ref, w_hh_ref, out_ref, None, h_ref, c_ref,
                               t_chunk=t_chunk, hidden=hidden, reverse=reverse,
                               bf16=bf16)

        out_specs = block
        out_shape = jax.ShapeDtypeStruct((b, t, hidden), jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, t_chunk, 4 * hidden), seq_idx,
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
    the recurrence runs in the fused kernel, with the reverse direction
    handled by the kernel's traversal order (no flips). Batch is padded up to
    the tile size; time uses the largest chunk dividing T.
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

    b_sz, t, _ = gates_all.shape
    bt = _pick_tile(b_sz, batch_tile) if b_sz < batch_tile else batch_tile
    pad_b = (-b_sz) % bt
    if pad_b:
        gates_all = jnp.pad(gates_all, ((0, pad_b), (0, 0), (0, 0)))
    tc = _pick_tile(t, t_chunk)

    out = lstm_recurrence_pallas(gates_all, w_hh, batch_tile=bt, t_chunk=tc,
                                 interpret=_auto_interpret(interpret),
                                 reverse=reverse)
    return out[:b_sz]


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
# Fully-fused AMP training kernels (the bf16-policy hot path)
#
# Measured design notes (v5e device traces): the recurrence kernels are
# DMA/VPU-floor-bound, NOT HBM-bandwidth-bound, so bf16 storage of the
# sequence tensors LOSES — the (2,1)-packed sublane pack/unpack costs more
# VPU time than the halved DMA saves (bwd kernel: 2.57 ms with f32 streams
# vs 4.21 ms with bf16 streams at B=512, T=256, H=256). All HBM streams stay
# f32; only the MXU matmuls run bf16 with f32 accumulation (the AMP policy,
# torch analogue ref 04_lstm_model.py:486-489).
#
# * forward (`lstm_fwd_fused_proj`): the input projection x @ W_ih runs
#   INSIDE the kernel (W_ih VMEM-resident), so the (B, T, 4H) input-gates
#   tensor never exists in HBM — both the XLA einsum's write of it and the
#   kernel's read of it are gone. The kernel stores the POST-activation
#   gates (i,f,g,o) as the backward residual along with (h, c) and the
#   chunk-boundary carries, so the adjoint is transcendental-free except
#   one tanh(c).
# * backward (`lstm_bwd_fused`): consumes (gates, c, g, h, x) and produces dx,
#   dW_ih, dW_hh, db all in-kernel: dgates never touches HBM and the three
#   large XLA einsums (dW_ih, dW_hh, dx) disappear. The weight-gradient
#   blocks live VMEM-resident across the whole grid (constant index maps)
#   and accumulate in f32; the per-step dW matmuls contract over the batch
#   tile (K=128 — the MXU's native contraction width).
#
# Measured at (B=512, T=256, H=256, D=512): fwd 1.8 ms, bwd 4.1 ms per
# layer-direction vs ~3.2 / ~8.4 ms for the unfused einsum+kernel pipeline.
# Replaces the reference's cuDNN fused LSTM + autograd (ref
# 04_lstm_model.py:181-188, 486-507).
# ---------------------------------------------------------------------------


def _split_rows(w: jnp.ndarray, widths) -> list:
    """Split (D, G) row-wise into blocks of the given widths (static)."""
    out, off = [], 0
    for wd in widths:
        out.append(w[off : off + wd])
        off += wd
    return out


def _masked(x, mask_ref, i, inv_keep: float, sl=slice(None)):
    """Apply an inverted-dropout mask block (uint8, 0=drop) to a time slice."""
    return jnp.where(mask_ref[sl, i, :] != 0, x * inv_keep, 0.0)


#: seed-mixing constants (splitmix64/murmur finalizer multipliers, as int32)
_MIX1 = np.int32(np.uint32(0x9E3779B9))
_MIX2 = np.int32(np.uint32(0x85EBCA6B))
_MIX3 = np.int32(np.uint32(0xC2B2AE35))


def _keep_threshold(keep: float) -> np.uint32:
    return np.uint32(min(int(keep * 2.0 ** 32), 2 ** 32 - 1))


def _prng_block_masks(seed_ref, i_b, seq_chunk, n_parts, shapes, keep: float,
                      salt0: int = 0):
    """Generate per-part PRE-SCALED f32 mask blocks (0 or 1/keep) from the
    TPU hardware PRNG.

    Seeded by (seed words, batch-tile index, seq chunk, part), so the
    forward and backward kernels — whatever order their grids visit chunks
    in — regenerate bit-identical masks for the same logical block. Masks
    never exist in HBM, and uint32 compares are VPU-native (the uint8
    mask-input path measured ~2x kernel slowdown from int8 lane unpacking).
    The select happens ONCE per block here; the per-step application is a
    plain multiply (keeps VPU work off the serial recurrence chain).
    ``salt0`` offsets the per-part salt so logically distinct mask streams
    (e.g. the forward kernel's OUTPUT-dropout masks, salted per direction)
    never collide with the input-part streams.
    """
    thresh = _keep_threshold(keep)
    inv_keep = 1.0 / keep
    out = []
    for p in range(n_parts):
        part_salt = np.uint32(((p + 1 + salt0) * 0x85EBCA6B) % (1 << 32)).astype(
            np.int32)
        s0 = seed_ref[0] ^ (i_b * _MIX1) ^ part_salt
        s1 = seed_ref[1] ^ (seq_chunk * _MIX3)
        pltpu.prng_seed(s0, s1)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shapes[p]), jnp.uint32)
        out.append(jnp.where(bits < thresh, inv_keep, 0.0))
    return out


def _prng_masked(x, maskv, i):
    """Apply a pre-scaled f32 mask block to a time slice (one multiply)."""
    return x * maskv[:, i, :]


def _fwd_proj_kernel(*refs, t_chunk: int, hidden: int, reverse: bool,
                     n_parts: int, n_masks: int, keep: float,
                     prng_dropout: bool, n_chunks: int,
                     stream_tc: bool = False, adjoint_res: bool = False,
                     emit_residuals: bool = True, chains: int = 1,
                     out_keep: float = 1.0, out_mask: bool = False,
                     out_prng: bool = False, out_salt: int = 16):
    """One (batch_tile, time_chunk) grid step: project + recurrence, storing
    (h, c, gates) f32 residuals. The projection matmuls are independent across
    steps, so the MXU pipelines them behind the serial recurrence chain.

    The input arrives as ``n_parts`` separate refs (a bidirectional layer's
    fwd/rev halves) with W_ih split row-wise to match — the halves are never
    concatenated in HBM (the concat copies cost ~0.4 ms each on a v5e).
    Dropout applies in-kernel, so the dropped tensor and its XLA select
    fusion never exist in HBM: from the hardware PRNG when ``prng_dropout``
    (compiled TPU path — see _prng_block_masks), else from optional uint8
    mask inputs (``n_masks`` of them — the interpret-mode oracle path).

    ``out_keep < 1`` makes the kernel ALSO write the inverted-dropout copy
    of its own output (the next layer's input) as a second sequence output:
    the inter-layer XLA dropout fusion — read h, generate bits, select,
    write the dropped copy — never exists, and this kernel is the DMA-bound
    one with VPU slack to pay for the mask. The mask comes from the hardware
    PRNG (``out_prng``, salted per direction so the two directions'
    output streams are independent) or a uint8 mask input (``out_mask`` —
    the CPU-testable path, fed the same dropout_mask stream as the XLA
    select mode). The consumer recovers the mask from the dropped zeros
    (mask_from_x), exactly as with the XLA-select default."""
    x_refs = refs[:n_parts]
    mask_refs = refs[n_parts : n_parts + n_masks]
    o = n_parts + n_masks
    if out_mask:
        out_mask_ref = refs[o]
        o += 1
    if prng_dropout or out_prng:
        seed_ref = refs[o]
        o += 1
    wih_refs = refs[o : o + n_parts]
    o += n_parts
    b_ref, whh_ref, h_out = refs[o : o + 3]
    o += 3
    drop_out = out_keep < 1.0
    hd_out = None
    if drop_out:
        hd_out = refs[o]
        o += 1
    if not emit_residuals:
        # inference/primal mode: the VJP will never run, so skip every
        # residual stream (gates, c_seq, boundaries) — at B=512/H=256 that
        # is ~800 MB of pure-waste HBM writes per layer-direction
        h_sc, c_sc = refs[o : o + 2]
        c_out = z_out = tc_out = hb_out = cb_out = None
    elif adjoint_res:
        # no c_seq output and no c boundaries: the precomputed residuals
        # absorb c_prev (B) and tanh(c) (E, G), so the adjoint never reads
        # the cell state at all
        z_out, hb_out, h_sc, c_sc = refs[o : o + 4]
        c_out = tc_out = cb_out = None
    elif stream_tc:
        c_out, z_out, tc_out, hb_out, cb_out, h_sc, c_sc = refs[o : o + 7]
    else:
        c_out, z_out, hb_out, cb_out, h_sc, c_sc = refs[o : o + 6]
        tc_out = None

    @pl.when(pl.program_id(1) == 0)
    def _reset_state():
        h_sc[:] = jnp.zeros_like(h_sc)
        c_sc[:] = jnp.zeros_like(c_sc)

    if emit_residuals:
        # chunk-boundary carries for the backward pass, written here so the
        # adjoint never strided-slices the big (B, T, H) sequences (XLA
        # lowers that to a full 134 MB layout-transposing copy per tensor
        # at B=512)
        hb_out[:] = h_sc[:]
        if cb_out is not None:
            cb_out[:] = c_sc[:]

    inv_keep = 1.0 / keep
    if prng_dropout or out_prng:
        j = pl.program_id(1)
        seq_chunk = (n_chunks - 1 - j) if reverse else j
    if prng_dropout:
        maskv = _prng_block_masks(seed_ref, pl.program_id(0), seq_chunk,
                                  n_parts, [r.shape for r in x_refs], keep)
    if out_prng:
        # one pre-scaled mask block for THIS kernel's output, salted per
        # direction (out_salt) so it never collides with input-part streams
        omask = _prng_block_masks(seed_ref, pl.program_id(0), seq_chunk, 1,
                                  [h_out.shape], out_keep, salt0=out_salt)[0]

    def fwd_step(i, sl=slice(None)):
        """One recurrence step over the row slice ``sl`` of the batch tile
        (the dual-chain ILP mode runs two independent half-tile chains)."""
        z = b_ref[0:1, :] + jnp.dot(
            h_sc[sl, :].astype(jnp.bfloat16), whh_ref[:],
            preferred_element_type=jnp.float32)
        for p in range(n_parts):
            xv = x_refs[p][sl, i, :]
            if prng_dropout:
                xv = _prng_masked(xv, maskv[p][sl], i)
            elif n_masks:
                xv = _masked(xv, mask_refs[p], i, inv_keep, sl=sl)
            z += jnp.dot(xv.astype(jnp.bfloat16), wih_refs[p][:],
                         preferred_element_type=jnp.float32)
        gi = _sigmoid(z[:, :hidden])
        gf = _sigmoid(z[:, hidden : 2 * hidden])
        gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
        go = _sigmoid(z[:, 3 * hidden :])
        c_prev = c_sc[sl, :]
        c_new = gf * c_prev + gi * gg
        tc_new = jnp.tanh(c_new)
        h_new = go * tc_new
        h_sc[sl, :] = h_new
        c_sc[sl, :] = c_new
        h_out[sl, i, :] = h_new
        if hd_out is not None:
            # the inverted-dropout copy of this output, written here so the
            # XLA inter-layer dropout fusion never exists (see docstring)
            if out_prng:
                hd_out[sl, i, :] = h_new * omask[sl, i, :]
            else:
                hd_out[sl, i, :] = _masked(h_new, out_mask_ref, i,
                                           1.0 / out_keep, sl=sl)
        if not emit_residuals:
            return
        if adjoint_res:
            # precomputed adjoint residuals (see _ADJ_RES): the forward has
            # VPU slack (it is DMA-bound), the backward does not
            z_out[sl, i, :] = jnp.concatenate(
                [gg * (gi * (1.0 - gi)),
                 c_prev * (gf * (1.0 - gf)),
                 gi * (1.0 - gg * gg),
                 go * (1.0 - tc_new * tc_new),
                 gf,
                 tc_new * (go * (1.0 - go))],
                axis=-1).astype(z_out.dtype)
            return
        c_out[sl, i, :] = c_new
        if stream_tc:
            # stream tanh(c) (computed here anyway) so the VPU-bound adjoint
            # kernel reads it instead of re-evaluating a tanh per step
            tc_out[sl, i, :] = tc_new
        # residual = the POST-activation gates, not z: the adjoint then needs
        # only multiplies (gate'(z) in terms of the activation) + one tanh(c),
        # instead of re-evaluating 4 transcendental passes per step
        z_out[sl, i, :] = jnp.concatenate(
            [gi, gf, gg, go], axis=-1).astype(z_out.dtype)

    for s in range(t_chunk):  # unrolled: static sublane offsets
        i = t_chunk - 1 - s if reverse else s
        if chains > 1:
            # N independent recurrence chains over row slices of the tile:
            # one chain's carry matmul overlaps another's VPU work
            rows = h_sc.shape[0] // chains
            for k in range(chains):
                fwd_step(i, slice(k * rows, (k + 1) * rows))
        else:
            fwd_step(i)


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "t_chunk", "interpret", "reverse",
                              "keep", "need_residuals", "out_keep")
)
def lstm_fwd_fused_proj(
    xs,
    w_ih: jnp.ndarray,
    b: jnp.ndarray,
    w_hh: jnp.ndarray,
    masks=None,
    keep: float = 1.0,
    dropout_seed=None,
    out_keep: float = 1.0,
    out_seed=None,
    out_mask=None,
    batch_tile: int = 128,
    t_chunk: int = 8,
    need_residuals: bool = True,
    interpret: bool = False,
    reverse: bool = False,
):
    """Input parts (each (B, T, D_p), sum D_p = D) ->
    f32 (h_seq, c_seq, gates_seq, tc_seq, h_bound, c_bound, h_drop) where
    tc_seq is tanh(c_seq) when EEGFLOW_BWD_TC=1 (streamed for the adjoint
    kernel) and None otherwise, and h_drop is the inverted-dropout copy of
    h_seq when ``out_keep < 1`` (None otherwise).

    Weights bf16-resident; W_ih is split row-wise to match the parts so a
    bidirectional predecessor's halves are consumed without a concat. The
    (B, n_chunks*H) boundary outputs record the carry at each chunk start
    for the adjoint kernel. Dropout with rate ``1-keep`` applies to the
    input in-kernel: from ``dropout_seed`` ((2,) int32, hardware PRNG —
    compiled TPU only) or from ``masks`` (uint8 per part, 0=drop).
    OUTPUT dropout with rate ``1-out_keep`` is applied to the written
    ``h_drop`` copy: from ``out_seed`` ((2,) int32, hardware PRNG) or
    ``out_mask`` (uint8 (B, T, H), 0=drop — the CPU-testable path)."""
    if isinstance(xs, jnp.ndarray):
        xs = (xs,)
    masks = tuple(masks) if masks else ()
    prng = dropout_seed is not None
    drop_out = out_keep < 1.0
    out_prng = drop_out and out_mask is None
    if drop_out:
        assert out_mask is not None or out_seed is not None or prng, \
            "out_keep < 1 needs an out_mask, an out_seed, or (shared-seed " \
            "mode) an input dropout_seed"
        # one SMEM seed ref per kernel: when BOTH in-kernel input-PRNG and
        # output-PRNG dropout are active, the input seed seeds both streams
        # (they stay independent via the per-purpose salts)
        assert dropout_seed is None or out_seed is None, \
            "pass ONE seed: with input-PRNG active, output masks derive " \
            "from dropout_seed (salt-separated)"
    else:
        assert out_seed is None and out_mask is None
    seed_val = dropout_seed if dropout_seed is not None else out_seed
    need_seed = prng or out_prng
    bsz, t, _ = xs[0].shape
    hidden = w_hh.shape[0]
    assert bsz % batch_tile == 0 and t % t_chunk == 0
    assert not masks or len(masks) == len(xs)
    assert not (masks and prng)
    n_chunks = t // t_chunk
    widths = [p.shape[-1] for p in xs]
    w_parts = _split_rows(w_ih, widths)

    grid = (bsz // batch_tile, n_chunks)
    if reverse:
        seq_idx = lambda i, j: (i, n_chunks - 1 - j, 0)
        bound_idx = lambda i, j: (i, n_chunks - 1 - j)
    else:
        seq_idx = lambda i, j: (i, j, 0)
        bound_idx = lambda i, j: (i, j)
    blk = lambda width: pl.BlockSpec((batch_tile, t_chunk, width), seq_idx,
                                     memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    # boundary carries: (B, n_chunks*H) 2D (Mosaic-friendly lane blocking),
    # column block k = the carry state when seq chunk k began
    bound_spec = pl.BlockSpec((batch_tile, hidden), bound_idx,
                              memory_space=pltpu.VMEM)

    assert not (_ADJ_RES and _BWD_TC), "EEGFLOW_ADJOINT_RES subsumes BWD_TC"
    res_width = (6 if _ADJ_RES else 4) * hidden
    kernel = functools.partial(_fwd_proj_kernel, t_chunk=t_chunk,
                               hidden=hidden, reverse=reverse,
                               n_parts=len(xs), n_masks=len(masks),
                               keep=keep, prng_dropout=prng,
                               n_chunks=n_chunks, stream_tc=bool(_BWD_TC),
                               adjoint_res=bool(_ADJ_RES),
                               emit_residuals=need_residuals,
                               # chain slices must stay (8, 128)-tile aligned
                               chains=(_FWD_CHAINS
                                       if batch_tile % (8 * _FWD_CHAINS) == 0
                                       else 1),
                               out_keep=float(out_keep),
                               out_mask=out_mask is not None,
                               out_prng=out_prng,
                               # per-direction salt: the two directions'
                               # output-dropout streams must be independent
                               out_salt=16 + (1 if reverse else 0))
    seq_h = jax.ShapeDtypeStruct((bsz, t, hidden), jnp.float32)
    res_shape = jax.ShapeDtypeStruct(
        (bsz, t, res_width), jnp.bfloat16 if _RES_BF16 else jnp.float32)
    if need_residuals:
        bound_shape = jax.ShapeDtypeStruct((bsz, n_chunks * hidden),
                                           jnp.float32)
        n_bounds = 1 if _ADJ_RES else 2  # h always; c only if adjoint reads it
        extra_specs = ((() if _ADJ_RES else (blk(hidden),))
                       + (blk(res_width),)
                       + ((blk(hidden),) if _BWD_TC else ())
                       + (bound_spec,) * n_bounds)
        extra_shapes = ((() if _ADJ_RES else (seq_h,))
                        + (res_shape,)
                        + ((seq_h,) if _BWD_TC else ())
                        + (bound_shape,) * n_bounds)
    else:
        extra_specs, extra_shapes = (), ()
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk(w) for w in widths]
        + [blk(w) for w, _ in zip(widths, masks)]
        + ([blk(hidden)] if out_mask is not None else [])
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if need_seed else [])
        + [const(w, 4 * hidden) for w in widths]
        + [const(1, 4 * hidden), const(hidden, 4 * hidden)],
        out_specs=(blk(hidden),)
        + ((blk(hidden),) if drop_out else ())
        + extra_specs,
        out_shape=(seq_h,)
        + ((seq_h,) if drop_out else ())
        + extra_shapes,
        scratch_shapes=[
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # h
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # c
        ],
        # f32 blocks + double buffering exceed the compiler's 16 MB default
        # scoped-vmem limit; the v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[p.astype(jnp.float32) for p in xs],
      *[m.astype(jnp.uint8) for m in masks],
      *([out_mask.astype(jnp.uint8)] if out_mask is not None else []),
      *([jnp.asarray(seed_val, jnp.int32)] if need_seed else []),
      *[w.astype(jnp.bfloat16) for w in w_parts],
      b.reshape(1, -1).astype(jnp.float32), w_hh.astype(jnp.bfloat16))
    outs = list(outs)
    h = outs.pop(0)
    hd = outs.pop(0) if drop_out else None
    if not need_residuals:
        c = z = tc_seq = hb = cb = None
    elif _ADJ_RES:
        z, hb = outs
        c = tc_seq = cb = None
    elif _BWD_TC:
        c, z, tc_seq, hb, cb = outs
    else:
        c, z, hb, cb = outs
        tc_seq = None
    return h, c, z, tc_seq, hb, cb, hd


def _bwd_fused_kernel(*refs, t_chunk: int, hidden: int, reverse: bool,
                      n_parts: int, n_masks: int, keep: float,
                      prng_dropout: bool, n_chunks: int, n_dxadd: int = 0,
                      mask_from_x: bool = False, stream_tc: bool = False,
                      adjoint_res: bool = False, chains: int = 1):
    """Adjoint step producing per-part dx and accumulating (dW_ih parts,
    dW_hh, db) into VMEM-resident output blocks. Standard LSTM adjoint,
    gate order i,f,g,o. In-kernel dropout (PRNG seed or uint8 masks)
    reproduces the forward's masks exactly: the weight gradients contract
    against the masked input, and dx is masked on the way out.
    ``mask_from_x`` instead recovers the mask from the already-streamed
    dropped input (x==0 exactly at dropped positions):
    dx ← where(x==0, 0, dx/keep). This removes the XLA dropout-backward
    fusions (~4 ms/step at B=512) with ZERO extra DMA. Documented
    tradeoff: an UNDROPPED activation that is exactly 0.0 in f32 is
    misclassified as dropped (its dx is zeroed and siblings scaled by
    1/keep). The inputs here are gelu outputs (exactly 0.0 only when the
    pre-activation underflows, below about -5.9 where gelu(x) rounds to
    -0.0/0.0) and LSTM hidden states o*tanh(c) (exactly 0.0 when the
    output-gate pre-activation sits below about -18 or c is 0). Both are
    deep-saturation regimes that trained gates do not normally occupy;
    the affected quantity is one input-gradient element, not the loss. If
    saturated gates are ever observed, fall back to explicit uint8 masks
    (``n_masks > 0`` path, validated by tools/check_prng_dropout.py). ``n_dxadd`` extra per-part inputs are added into
    dx on the way out (the sibling direction's dx — fuses the XLA add of
    the two directions' input cotangents)."""
    if adjoint_res:
        # no c stream: the precomputed residuals absorb c_prev and tanh(c)
        z_ref, g_ref, h_ref, hb_ref = refs[:4]
        c_ref = cb_ref = None
        o = 4
    else:
        z_ref, c_ref, cb_ref, g_ref, h_ref, hb_ref = refs[:6]
        o = 6
    if stream_tc:
        tc_ref = refs[o]
        o += 1
    x_refs = refs[o : o + n_parts]
    mask_refs = refs[o + n_parts : o + n_parts + n_masks]
    o = o + n_parts + n_masks
    if prng_dropout:
        seed_ref = refs[o]
        o += 1
    dxadd_refs = refs[o : o + n_dxadd]
    o += n_dxadd
    whh_t_ref = refs[o]
    wih_t_refs = refs[o + 1 : o + 1 + n_parts]
    o = o + 1 + n_parts
    dx_refs = refs[o : o + n_parts]
    dwih_refs = refs[o + n_parts : o + 2 * n_parts]
    dwhh_ref, db_ref, dh_sc, dc_sc, *probe_sc = refs[o + 2 * n_parts :]

    inv_keep = 1.0 / keep
    if prng_dropout:
        j = pl.program_id(1)
        # the adjoint grid visits chunks opposite to the forward direction
        seq_chunk = j if reverse else (n_chunks - 1 - j)
        maskv = _prng_block_masks(seed_ref, pl.program_id(0), seq_chunk,
                                  n_parts, [r.shape for r in x_refs], keep)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        dh_sc[:] = jnp.zeros_like(dh_sc)
        dc_sc[:] = jnp.zeros_like(dc_sc)
        for r in probe_sc:
            r[:] = jnp.zeros_like(r)

    @pl.when(first)
    def _zero_accumulators():
        for dwih_ref in dwih_refs:
            dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    for s in range(t_chunk):  # unrolled: static sublane offsets
        # adjoint traversal is opposite to the forward direction's
        i_t = s if reverse else t_chunk - 1 - s
        if reverse:
            boundary = i_t == t_chunk - 1
            prev = i_t + 1
        else:
            boundary = i_t == 0
            prev = i_t - 1
        if boundary:
            h_prev = hb_ref[:]
        else:
            h_prev = h_ref[:, prev, :]
        if adjoint_res:
            res = z_ref[:, i_t, :].astype(jnp.float32)
        else:
            c_prev = cb_ref[:] if boundary else c_ref[:, prev, :]
            # post-activation gates saved by the forward (f32, or bf16 under
            # EEGFLOW_RES_BF16 — upcast per block in VMEM)
            g_act = z_ref[:, i_t, :].astype(jnp.float32)
            gi = g_act[:, :hidden]
            gf = g_act[:, hidden : 2 * hidden]
            gg = g_act[:, 2 * hidden : 3 * hidden]
            go = g_act[:, 3 * hidden :]
            # tanh(c): streamed from the forward when EEGFLOW_BWD_TC=1 (kills
            # a per-step transcendental in this VPU-bound kernel), else
            # recomputed
            tc_ = (tc_ref[:, i_t, :] if stream_tc
                   else jnp.tanh(c_ref[:, i_t, :]))

        def adjoint_chain(dh_carry, dc_carry, g_scale=None,
                          sl=slice(None)):
            # the serial gate-adjoint chain: everything between reading the
            # previous step's carries and producing this step's dz. ``sl``
            # restricts the chain to a row slice of the batch tile (the
            # dual-chain ILP mode below).
            dh = g_ref[sl, i_t, :] + dh_carry[sl, :]
            if g_scale is not None:  # probe only: defeat CSE with the primary
                dh = dh * g_scale
            if adjoint_res:
                # residuals [A, B, C, E, F, G] precomputed by the forward:
                # 7 multiplies + 2 adds per step, no transcendental
                dc = dh * res[sl, 3 * hidden : 4 * hidden] + dc_carry[sl, :]
                dc_carry[sl, :] = dc * res[sl, 4 * hidden : 5 * hidden]
                dz = jnp.concatenate(
                    [dc * res[sl, :hidden],
                     dc * res[sl, hidden : 2 * hidden],
                     dc * res[sl, 2 * hidden : 3 * hidden],
                     dh * res[sl, 5 * hidden :]],
                    axis=-1,
                )
            else:
                do = dh * tc_[sl]
                dc = dh * go[sl] * (1.0 - tc_[sl] * tc_[sl]) + dc_carry[sl, :]
                di = dc * gg[sl]
                df = dc * c_prev[sl]
                dg = dc * gi[sl]
                dc_carry[sl, :] = dc * gf[sl]
                dz = jnp.concatenate(
                    [di * gi[sl] * (1.0 - gi[sl]), df * gf[sl] * (1.0 - gf[sl]),
                     dg * (1.0 - gg[sl] * gg[sl]), do * go[sl] * (1.0 - go[sl])],
                    axis=-1,
                )
            dz16 = dz.astype(jnp.bfloat16)
            dh_carry[sl, :] = jnp.dot(dz16, whh_t_ref[:],
                                      preferred_element_type=jnp.float32)
            return dz, dz16

        if chains > 1:
            # N independent adjoint chains over the tile's row slices:
            # while one slice's carry matmul occupies the MXU, another
            # slice's VPU chain can issue (the per-step chain is latency-
            # bound, not throughput-bound). The off-chain dx/dW matmuls
            # below still run on the full tile.
            rows = dh_sc.shape[0] // chains
            dzs = [adjoint_chain(dh_sc, dc_sc,
                                 sl=slice(k * rows, (k + 1) * rows))[0]
                   for k in range(chains)]
            dz = jnp.concatenate(dzs, axis=0)
            dz16 = dz.astype(jnp.bfloat16)
        else:
            dz, dz16 = adjoint_chain(dh_sc, dc_sc)
        if probe_sc:
            # perf probe (EEGFLOW_BWD_PROBE_DUP=1): a second, independent
            # adjoint chain over the SAME blocks, merged at ~1e-30 scale so
            # Mosaic cannot DCE it. If the kernel runs in well under 2x the
            # single-chain time, the serial chain leaves stalls a combined
            # dual-direction kernel could fill.
            dz_b, dz16_b = adjoint_chain(probe_sc[0], probe_sc[1],
                                         jnp.float32(1.0000001))
            eps = jnp.float32(1e-30)
        # weight grads: contract over the batch tile (K = batch_tile)
        for p in range(n_parts):
            dxv = jnp.dot(dz16, wih_t_refs[p][:],
                          preferred_element_type=jnp.float32)
            if probe_sc:
                dxv += eps * jnp.dot(dz16_b, wih_t_refs[p][:],
                                     preferred_element_type=jnp.float32)
            xv = x_refs[p][:, i_t, :]
            if prng_dropout:
                dxv = _prng_masked(dxv, maskv[p], i_t)
                xv = _prng_masked(xv, maskv[p], i_t)
            elif n_masks:
                dxv = _masked(dxv, mask_refs[p], i_t, inv_keep)
                xv = _masked(xv, mask_refs[p], i_t, inv_keep)
            elif mask_from_x:
                # xv is the ALREADY-dropped input; dwih contracts it as-is
                dxv = jnp.where(xv == 0.0, 0.0, dxv * inv_keep)
            if n_dxadd:
                dxv = dxv + dxadd_refs[p][:, i_t, :]
            dx_refs[p][:, i_t, :] = dxv
            dwih_refs[p][:] += jax.lax.dot_general(
                xv.astype(jnp.bfloat16), dz16,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            if probe_sc:
                dwih_refs[p][:] += eps * jax.lax.dot_general(
                    xv.astype(jnp.bfloat16), dz16_b,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        dwhh_ref[:] += jax.lax.dot_general(
            h_prev.astype(jnp.bfloat16), dz16,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        if probe_sc:
            dwhh_ref[:] += eps * jax.lax.dot_general(
                h_prev.astype(jnp.bfloat16), dz16_b,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            db_ref[:] += eps * jnp.sum(dz_b, axis=0, keepdims=True)
        db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)


def _bwd_fused_kernel_v2(*refs, t_chunk: int, hidden: int, reverse: bool,
                         n_parts: int, n_masks: int, keep: float,
                         prng_dropout: bool, n_chunks: int, n_dxadd: int = 0,
                         mask_from_x: bool = False):
    """Two-pass variant of :func:`_bwd_fused_kernel` (same contract).

    The v1 kernel interleaves the serial adjoint recurrence with FOUR
    per-step matmuls; only the ``dz -> dh`` product is actually on the
    serial chain, yet the three big ones (dx, dW_ih, dW_hh) inherit its
    step granularity — (batch_tile, 4H) x (4H, ·) shapes whose MXU
    efficiency is capped by the dependency-chain stalls (measured ~50% of
    the FLOPs bound; the six backward kernels were 22.8 of a 41.8 ms train
    step at B=512).

    Pass 1 (serial, per step): gate adjoint VPU math, the small ``dz @
    W_hh^T`` carry matmul, and the f32 ``dz`` + bf16 ``h_prev`` rows
    written to VMEM scratch.
    Pass 2 (whole chunk): dx / dW_ih / dW_hh as single chunk-sized GEMMs —
    M = batch_tile*t_chunk = 1024 rows on the MXU with no serial
    dependency — plus block-wide dropout-mask application and the db sum.
    Weight-gradient accumulation order changes (one K=1024 contraction per
    block instead of t_chunk K=batch_tile ones); both accumulate in f32, so
    the reassociation noise is far below the bf16 AMP tolerance the tests
    pin."""
    z_ref, c_ref, cb_ref, g_ref, h_ref, hb_ref = refs[:6]
    x_refs = refs[6 : 6 + n_parts]
    mask_refs = refs[6 + n_parts : 6 + n_parts + n_masks]
    o = 6 + n_parts + n_masks
    if prng_dropout:
        seed_ref = refs[o]
        o += 1
    dxadd_refs = refs[o : o + n_dxadd]
    o += n_dxadd
    whh_t_ref = refs[o]
    wih_t_refs = refs[o + 1 : o + 1 + n_parts]
    o = o + 1 + n_parts
    dx_refs = refs[o : o + n_parts]
    dwih_refs = refs[o + n_parts : o + 2 * n_parts]
    (dwhh_ref, db_ref, dh_sc, dc_sc, dz_sc, hp_sc) = refs[o + 2 * n_parts :]

    inv_keep = 1.0 / keep
    if prng_dropout:
        j = pl.program_id(1)
        seq_chunk = j if reverse else (n_chunks - 1 - j)
        maskv = _prng_block_masks(seed_ref, pl.program_id(0), seq_chunk,
                                  n_parts, [r.shape for r in x_refs], keep)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        dh_sc[:] = jnp.zeros_like(dh_sc)
        dc_sc[:] = jnp.zeros_like(dc_sc)

    @pl.when(first)
    def _zero_accumulators():
        for dwih_ref in dwih_refs:
            dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    # ---- pass 1: serial adjoint recurrence --------------------------------
    for s in range(t_chunk):  # unrolled: static sublane offsets
        i_t = s if reverse else t_chunk - 1 - s
        if reverse:
            boundary = i_t == t_chunk - 1
            prev = i_t + 1
        else:
            boundary = i_t == 0
            prev = i_t - 1
        if boundary:
            c_prev = cb_ref[:]
            h_prev = hb_ref[:]
        else:
            c_prev = c_ref[:, prev, :]
            h_prev = h_ref[:, prev, :]
        # post-activation gates saved by the forward (f32 or bf16)
        g_act = z_ref[:, i_t, :].astype(jnp.float32)
        gi = g_act[:, :hidden]
        gf = g_act[:, hidden : 2 * hidden]
        gg = g_act[:, 2 * hidden : 3 * hidden]
        go = g_act[:, 3 * hidden :]
        tc_ = jnp.tanh(c_ref[:, i_t, :])

        dh = g_ref[:, i_t, :] + dh_sc[:]
        do = dh * tc_
        dc = dh * go * (1.0 - tc_ * tc_) + dc_sc[:]
        di = dc * gg
        df = dc * c_prev
        dg = dc * gi
        dc_sc[:] = dc * gf

        dz = jnp.concatenate(
            [di * gi * (1.0 - gi), df * gf * (1.0 - gf),
             dg * (1.0 - gg * gg), do * go * (1.0 - go)],
            axis=-1,
        )
        dz_sc[:, i_t, :] = dz
        hp_sc[:, i_t, :] = h_prev.astype(jnp.bfloat16)
        dh_sc[:] = jnp.dot(dz.astype(jnp.bfloat16), whh_t_ref[:],
                           preferred_element_type=jnp.float32)

    # ---- pass 2: whole-chunk GEMMs ----------------------------------------
    bt = dz_sc.shape[0]
    g4 = dz_sc.shape[2]
    dzmat = jnp.reshape(dz_sc[:], (bt * t_chunk, g4))
    dzmat16 = dzmat.astype(jnp.bfloat16)
    db_ref[:] += jnp.sum(dzmat, axis=0, keepdims=True)
    dwhh_ref[:] += jax.lax.dot_general(
        jnp.reshape(hp_sc[:], (bt * t_chunk, hidden)), dzmat16,
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    for p in range(n_parts):
        w = x_refs[p].shape[2]
        dx3 = jnp.reshape(jnp.dot(dzmat16, wih_t_refs[p][:],
                                  preferred_element_type=jnp.float32),
                          (bt, t_chunk, w))
        xv = x_refs[p][:]
        if prng_dropout:
            dx3 = dx3 * maskv[p]
            xv = xv * maskv[p]
        elif n_masks:
            m = mask_refs[p][:] != 0
            dx3 = jnp.where(m, dx3 * inv_keep, 0.0)
            xv = jnp.where(m, xv * inv_keep, 0.0)
        elif mask_from_x:
            # xv is the ALREADY-dropped input; dwih contracts it as-is
            dx3 = jnp.where(xv == 0.0, 0.0, dx3 * inv_keep)
        if n_dxadd:
            dx3 = dx3 + dxadd_refs[p][:]
        dx_refs[p][:] = dx3
        dwih_refs[p][:] += jax.lax.dot_general(
            jnp.reshape(xv.astype(jnp.bfloat16), (bt * t_chunk, w)), dzmat16,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


#: backward-kernel selector: 0 (default) = the per-step v1 kernel,
#: 1 = the two-pass v2 kernel. Measured on the v5e (B=512, T=256, H=256×3,
#: tools/profile_train.py): v1 40.58 ms/step (MFU 42.7%) vs v2 43.12 ms
#: (40.2%); v2 with t_chunk=16 48.1 ms. The hypothesis that the three big
#: per-step GEMMs were capped by the serial-chain stalls was wrong: Mosaic
#: already overlaps step s's independent GEMMs with step s+1's serial
#: carry matmul, and v2's scratch round-trip + end-of-block GEMM barrier
#: costs more than the larger-M MXU shapes save. Kept for A/B re-checks on
#: future compiler versions.
# _BWD_V2 — read in refresh_flags() at the top of this module.
# perf probe: duplicate the v1 adjoint chain in-kernel (see adjoint_chain)
# _BWD_PROBE_DUP — read in refresh_flags() at the top of this module.

# A/B flag: split the backward batch tile into two independent adjoint
# chains (row halves). The per-step chain is dependency-latency-bound
# (~25% MXU / ~16% VPU utilization at the measured 3.8 ms/kernel), so two
# interleavable chains let the scheduler overlap one half's carry matmul
# with the other half's VPU work. Composes with EEGFLOW_ADJOINT_RES.
# _BWD_DUAL / _BWD_CHAINS — read in refresh_flags() at the top of this module.


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "t_chunk", "interpret", "reverse",
                              "keep", "mask_from_x")
)
def lstm_bwd_fused(
    z_seq: jnp.ndarray,
    c_seq: jnp.ndarray,
    h_seq: jnp.ndarray,
    h_bound: jnp.ndarray,
    c_bound: jnp.ndarray,
    xs,
    g_out: jnp.ndarray,
    w_ih: jnp.ndarray,
    w_hh: jnp.ndarray,
    masks=None,
    keep: float = 1.0,
    dropout_seed=None,
    dx_add=None,
    mask_from_x: bool = False,
    tc_seq=None,
    batch_tile: int = 128,
    t_chunk: int = 8,
    interpret: bool = False,
    reverse: bool = False,
):
    """f32 (gates, c, h) residuals + boundary carries + input parts +
    upstream grad -> (dx parts, dw_ih, dw_hh, db).

    The chunk-boundary "previous" states are the (B, n_chunks*H) side
    outputs the forward kernel recorded (column block k = carry when seq
    chunk k began); everything else reads the streamed blocks at static
    offsets. ``masks``/``dropout_seed``/``keep`` must match the forward's
    in-kernel dropout. ``dx_add`` (parts) is accumulated into dx in-kernel
    (the sibling direction's input cotangents).
    """
    if isinstance(xs, jnp.ndarray):
        xs = (xs,)
    masks = tuple(masks) if masks else ()
    dx_add = tuple(dx_add) if dx_add else ()
    prng = dropout_seed is not None
    assert not masks or len(masks) == len(xs)
    assert not dx_add or len(dx_add) == len(xs)
    assert not (masks and prng)
    bsz, t, res_w = z_seq.shape
    # residual width: 4H raw gate activations, or 6H precomputed adjoint
    # products under EEGFLOW_ADJOINT_RES (which also drops the c stream)
    hidden = res_w // (6 if _ADJ_RES else 4)
    g4 = 4 * hidden
    widths = [p.shape[-1] for p in xs]
    w_parts = _split_rows(w_ih, widths)
    assert bsz % batch_tile == 0 and t % t_chunk == 0
    n_chunks = t // t_chunk

    if z_seq.dtype != jnp.bfloat16:
        # bf16 gate residuals stream in as-is (EEGFLOW_RES_BF16) — a host
        # upcast here would materialize the f32 copy in HBM and defeat the
        # halved stream; the kernel casts per block in VMEM instead
        z_seq = z_seq.astype(jnp.float32)
    if _ADJ_RES:
        assert c_seq is None and not _BWD_V2 and tc_seq is None
    else:
        c_seq = c_seq.astype(jnp.float32)
    h_seq = h_seq.astype(jnp.float32)
    if _BWD_V2:
        tc_seq = None  # the two-pass kernel keeps its own recompute
    stream_tc = tc_seq is not None

    if reverse:
        seq_idx = lambda i, j: (i, j, 0)                 # oldest-first
        bound_idx = lambda i, j: (i, j)
    else:
        seq_idx = lambda i, j: (i, n_chunks - 1 - j, 0)  # newest-first
        bound_idx = lambda i, j: (i, n_chunks - 1 - j)

    blk = lambda width: pl.BlockSpec((batch_tile, t_chunk, width), seq_idx,
                                     memory_space=pltpu.VMEM)
    bound_spec = pl.BlockSpec((batch_tile, hidden), bound_idx,
                              memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_fused_kernel_v2 if _BWD_V2 else _bwd_fused_kernel,
        t_chunk=t_chunk, hidden=hidden, reverse=reverse,
        n_parts=len(xs), n_masks=len(masks),
        keep=keep, prng_dropout=prng,
        n_chunks=n_chunks, n_dxadd=len(dx_add),
        mask_from_x=mask_from_x,
        **({} if _BWD_V2 else {"stream_tc": stream_tc,
                               "adjoint_res": bool(_ADJ_RES),
                               # chain slices must stay (8, 128)-tile aligned
                               "chains": (_BWD_CHAINS
                                          if batch_tile % (8 * _BWD_CHAINS) == 0
                                          else 1)}))
    n_p = len(xs)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz // batch_tile, n_chunks),
        in_specs=([
            blk(res_w),                                  # adjoint residuals
            blk(hidden),                                 # upstream grad
            blk(hidden),                                 # h
            bound_spec,                                  # h boundary
        ] if _ADJ_RES else [
            blk(g4),                                     # gates
            blk(hidden),                                 # c
            bound_spec,                                  # c boundary
            blk(hidden),                                 # upstream grad
            blk(hidden),                                 # h
            bound_spec,                                  # h boundary
        ])
        + ([blk(hidden)] if stream_tc else [])           # tanh(c) stream
        + [blk(w) for w in widths]                       # x parts
        + [blk(w) for w, _ in zip(widths, masks)]        # dropout masks
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if prng else [])
        + [blk(w) for w, _ in zip(widths, dx_add)]       # sibling dx to add
        + [const(g4, hidden)]                            # W_hh^T (bf16)
        + [const(g4, w) for w in widths],                # W_ih^T parts (bf16)
        out_specs=tuple([blk(w) for w in widths]
                        + [const(w, g4) for w in widths]
                        + [const(hidden, g4), const(1, g4)]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((bsz, t, w), jnp.float32) for w in widths]
            + [jax.ShapeDtypeStruct((w, g4), jnp.float32) for w in widths]
            + [jax.ShapeDtypeStruct((hidden, g4), jnp.float32),
               jax.ShapeDtypeStruct((1, g4), jnp.float32)]),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dh carry
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dc carry
        ] + ([
            pltpu.VMEM((batch_tile, t_chunk, g4), jnp.float32),  # dz rows (v2 pass 1→2)
            pltpu.VMEM((batch_tile, t_chunk, hidden), jnp.bfloat16),  # h_prev rows
        ] if _BWD_V2 else []) + ([
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # probe dup dh
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # probe dup dc
        ] if _BWD_PROBE_DUP and not _BWD_V2 else []),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        *((z_seq, g_out.astype(jnp.float32), h_seq, h_bound) if _ADJ_RES
          else (z_seq, c_seq, c_bound, g_out.astype(jnp.float32), h_seq,
                h_bound)),
        *([tc_seq.astype(jnp.float32)] if stream_tc else []),
        *[p.astype(jnp.float32) for p in xs],
        *[m.astype(jnp.uint8) for m in masks],
        *([jnp.asarray(dropout_seed, jnp.int32)] if prng else []),
        *[d.astype(jnp.float32) for d in dx_add],
        w_hh.astype(jnp.bfloat16).T,
        *[w.astype(jnp.bfloat16).T for w in w_parts],
    )
    dxs = tuple(outs[:n_p])
    dw_ih = (outs[n_p] if n_p == 1
             else jnp.concatenate(outs[n_p : 2 * n_p], axis=0))
    dw_hh, db = outs[2 * n_p], outs[2 * n_p + 1]
    return dxs, dw_ih, dw_hh, db[0]


# ---------------------------------------------------------------------------
# Fused dual-DIRECTION backward: both directions of a bidirectional layer in
# ONE kernel. The two adjoint recurrences are fully independent (they only
# share the input x), and each is dependency-latency-bound — so interleaving
# them lets the scheduler fill one direction's carry-matmul stalls with the
# other's VPU chain, without splitting the batch tile (which narrows the
# off-chain matmuls). The directions traverse time in opposite orders, so dx
# comes out per-direction (same grid step = different time chunks) and ONE
# XLA add outside the kernel produces the summed input cotangent — replacing
# the dx_add in-kernel stream of the two-launch path. A/B via
# EEGFLOW_BWD_DUALDIR=1. Composes with EEGFLOW_ADJOINT_RES / EEGFLOW_RES_BF16
# and with EEGFLOW_BWD_CHAINS (chains split WITHIN each direction).
# ---------------------------------------------------------------------------

# _BWD_DUALDIR — read in refresh_flags() at the top of this module.
# dual-direction doubles the streamed blocks per grid step; default to a
# halved batch tile (A/B override)
# _DUALDIR_BT — read in refresh_flags() at the top of this module.


def _bwd_dualdir_kernel(*refs, t_chunk: int, hidden: int, n_parts: int,
                        keep: float, n_chunks: int, mask_from_x: bool,
                        adjoint_res: bool, chains: int):
    """One grid step: direction F's adjoint on seq chunk ``n_chunks-1-j``
    AND direction R's adjoint on seq chunk ``j`` (each direction's BlockSpec
    index map delivers its own chunk). Per-direction logic mirrors
    ``_bwd_fused_kernel``'s v1 step (mask_from_x dropout recovery, gates- or
    adjoint-residuals, optional within-direction chain split)."""
    n_dir_in = 4 if adjoint_res else 6
    dir_in = [refs[d * n_dir_in : (d + 1) * n_dir_in] for d in range(2)]
    o = 2 * n_dir_in
    x_refs = [refs[o : o + n_parts], refs[o + n_parts : o + 2 * n_parts]]
    o += 2 * n_parts
    w_refs = [refs[o : o + 1 + n_parts], refs[o + 1 + n_parts : o + 2 * (1 + n_parts)]]
    o += 2 * (1 + n_parts)
    dx_refs = [refs[o : o + n_parts], refs[o + n_parts : o + 2 * n_parts]]
    o += 2 * n_parts
    dwih_refs = [refs[o : o + n_parts], refs[o + n_parts : o + 2 * n_parts]]
    o += 2 * n_parts
    dwhh_ref = refs[o : o + 2]
    db_ref = refs[o + 2 : o + 4]
    dh_sc = refs[o + 4 : o + 6]
    dc_sc = refs[o + 6 : o + 8]

    inv_keep = 1.0 / keep
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        for d in range(2):
            dh_sc[d][:] = jnp.zeros_like(dh_sc[d])
            dc_sc[d][:] = jnp.zeros_like(dc_sc[d])

    @pl.when(first)
    def _zero_accumulators():
        for d in range(2):
            for r in dwih_refs[d]:
                r[:] = jnp.zeros_like(r)
            dwhh_ref[d][:] = jnp.zeros_like(dwhh_ref[d])
            db_ref[d][:] = jnp.zeros_like(db_ref[d])

    def chain_step(d, s):
        """The serial adjoint-chain part of direction ``d``'s step ``s``:
        everything between reading the carries and producing dz."""
        reverse = d == 1
        if adjoint_res:
            z_ref, g_ref, h_ref, hb_ref = dir_in[d]
            c_ref = cb_ref = None
        else:
            z_ref, c_ref, cb_ref, g_ref, h_ref, hb_ref = dir_in[d]
        i_t = s if reverse else t_chunk - 1 - s
        boundary = (i_t == t_chunk - 1) if reverse else (i_t == 0)
        prev = i_t + 1 if reverse else i_t - 1
        h_prev = hb_ref[:] if boundary else h_ref[:, prev, :]
        if adjoint_res:
            res = z_ref[:, i_t, :].astype(jnp.float32)
        else:
            c_prev = cb_ref[:] if boundary else c_ref[:, prev, :]
            g_act = z_ref[:, i_t, :].astype(jnp.float32)
            gi = g_act[:, :hidden]
            gf = g_act[:, hidden : 2 * hidden]
            gg = g_act[:, 2 * hidden : 3 * hidden]
            go = g_act[:, 3 * hidden :]
            tc_ = jnp.tanh(c_ref[:, i_t, :])

        def one_chain(sl=slice(None)):
            dh = g_ref[sl, i_t, :] + dh_sc[d][sl, :]
            if adjoint_res:
                dc = dh * res[sl, 3 * hidden : 4 * hidden] + dc_sc[d][sl, :]
                dc_sc[d][sl, :] = dc * res[sl, 4 * hidden : 5 * hidden]
                dz = jnp.concatenate(
                    [dc * res[sl, :hidden],
                     dc * res[sl, hidden : 2 * hidden],
                     dc * res[sl, 2 * hidden : 3 * hidden],
                     dh * res[sl, 5 * hidden :]],
                    axis=-1,
                )
            else:
                do = dh * tc_[sl]
                dc = dh * go[sl] * (1.0 - tc_[sl] * tc_[sl]) + dc_sc[d][sl, :]
                di = dc * gg[sl]
                df = dc * c_prev[sl]
                dg = dc * gi[sl]
                dc_sc[d][sl, :] = dc * gf[sl]
                dz = jnp.concatenate(
                    [di * gi[sl] * (1.0 - gi[sl]), df * gf[sl] * (1.0 - gf[sl]),
                     dg * (1.0 - gg[sl] * gg[sl]), do * go[sl] * (1.0 - go[sl])],
                    axis=-1,
                )
            dh_sc[d][sl, :] = jnp.dot(dz.astype(jnp.bfloat16), w_refs[d][0][:],
                                      preferred_element_type=jnp.float32)
            return dz

        if chains > 1:
            rows = dh_sc[d].shape[0] // chains
            dz = jnp.concatenate(
                [one_chain(slice(k * rows, (k + 1) * rows))
                 for k in range(chains)], axis=0)
        else:
            dz = one_chain()
        return i_t, h_prev, dz, dz.astype(jnp.bfloat16)

    def off_chain(d, i_t, h_prev, dz, dz16):
        """Direction ``d``'s off-chain work for step ``i_t``: dx, dW_ih,
        dW_hh, db (full-tile matmuls, independent of the serial chains)."""
        for p in range(n_parts):
            dxv = jnp.dot(dz16, w_refs[d][1 + p][:],
                          preferred_element_type=jnp.float32)
            xv = x_refs[d][p][:, i_t, :]
            if mask_from_x:
                dxv = jnp.where(xv == 0.0, 0.0, dxv * inv_keep)
            dx_refs[d][p][:, i_t, :] = dxv
            dwih_refs[d][p][:] += jax.lax.dot_general(
                xv.astype(jnp.bfloat16), dz16,
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dwhh_ref[d][:] += jax.lax.dot_general(
            h_prev.astype(jnp.bfloat16), dz16,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        db_ref[d][:] += jnp.sum(dz, axis=0, keepdims=True)

    for s in range(t_chunk):  # unrolled: static sublane offsets
        # both directions' chain steps first (independent — the scheduler
        # interleaves them), then both off-chain matmul groups
        step_f = chain_step(0, s)
        step_r = chain_step(1, s)
        off_chain(0, *step_f)
        off_chain(1, *step_r)


@functools.partial(
    jax.jit, static_argnames=("batch_tile", "t_chunk", "interpret", "keep",
                              "mask_from_x")
)
def lstm_bwd_dualdir(
    res_f,
    res_r,
    xs,
    g_f: jnp.ndarray,
    g_r: jnp.ndarray,
    w_ih_f: jnp.ndarray,
    w_hh_f: jnp.ndarray,
    w_ih_r: jnp.ndarray,
    w_hh_r: jnp.ndarray,
    keep: float = 1.0,
    mask_from_x: bool = False,
    batch_tile: int = 64,
    t_chunk: int = 8,
    interpret: bool = False,
):
    """Both directions' backwards in one kernel. ``res_d`` is the per-
    direction residual tuple ``(z_seq, c_seq, h_seq, h_bound, c_bound)``
    from the forward (c entries None under EEGFLOW_ADJOINT_RES); ``xs`` the
    shared padded input parts. Returns per-direction
    ``(dxs_f, dxs_r, (dw_ih, dw_hh, db)_f, (..)_r)`` — the caller adds
    ``dxs_f + dxs_r`` (one XLA add, replacing the two-launch dx_add
    stream)."""
    if isinstance(xs, jnp.ndarray):
        xs = (xs,)
    z_f, c_f, h_f, hb_f, cb_f = res_f
    z_r, c_r, h_r, hb_r, cb_r = res_r
    bsz, t, res_w = z_f.shape
    hidden = res_w // (6 if _ADJ_RES else 4)
    g4 = 4 * hidden
    widths = [p.shape[-1] for p in xs]
    wp_f = _split_rows(w_ih_f, widths)
    wp_r = _split_rows(w_ih_r, widths)
    assert bsz % batch_tile == 0 and t % t_chunk == 0
    n_chunks = t // t_chunk

    def cast_z(z):
        # bf16 gate residuals (EEGFLOW_RES_BF16) stream as-is, upcast per
        # block in VMEM (see lstm_bwd_fused)
        return z if z.dtype == jnp.bfloat16 else z.astype(jnp.float32)

    # direction F's adjoint walks chunks newest-first, R's oldest-first
    idx_f = lambda i, j: (i, n_chunks - 1 - j, 0)
    bidx_f = lambda i, j: (i, n_chunks - 1 - j)
    idx_r = lambda i, j: (i, j, 0)
    bidx_r = lambda i, j: (i, j)
    blk = lambda width, idx: pl.BlockSpec((batch_tile, t_chunk, width), idx,
                                          memory_space=pltpu.VMEM)
    bound = lambda bidx: pl.BlockSpec((batch_tile, hidden), bidx,
                                      memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)

    def dir_in_specs(idx, bidx):
        if _ADJ_RES:
            return [blk(res_w, idx), blk(hidden, idx), blk(hidden, idx),
                    bound(bidx)]
        return [blk(res_w, idx), blk(hidden, idx), bound(bidx),
                blk(hidden, idx), blk(hidden, idx), bound(bidx)]

    def dir_in_vals(z, c, cb, g, h, hb):
        if _ADJ_RES:
            return [cast_z(z), g.astype(jnp.float32), h.astype(jnp.float32),
                    hb]
        return [cast_z(z), c.astype(jnp.float32), cb,
                g.astype(jnp.float32), h.astype(jnp.float32), hb]

    kernel = functools.partial(
        _bwd_dualdir_kernel, t_chunk=t_chunk, hidden=hidden,
        n_parts=len(xs), keep=keep, n_chunks=n_chunks,
        mask_from_x=mask_from_x, adjoint_res=bool(_ADJ_RES),
        # chain slices must stay (8, 128)-tile aligned
        chains=(_BWD_CHAINS if batch_tile % (8 * _BWD_CHAINS) == 0 else 1))
    n_p = len(xs)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz // batch_tile, n_chunks),
        in_specs=dir_in_specs(idx_f, bidx_f) + dir_in_specs(idx_r, bidx_r)
        + [blk(w, idx_f) for w in widths]    # x parts, F traversal
        + [blk(w, idx_r) for w in widths]    # x parts, R traversal
        + [const(g4, hidden)] + [const(g4, w) for w in widths]   # W_f^T
        + [const(g4, hidden)] + [const(g4, w) for w in widths],  # W_r^T
        out_specs=tuple([blk(w, idx_f) for w in widths]
                        + [blk(w, idx_r) for w in widths]
                        + [const(w, g4) for w in widths] * 2
                        + [const(hidden, g4)] * 2 + [const(1, g4)] * 2),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((bsz, t, w), jnp.float32)
             for w in widths] * 2
            + [jax.ShapeDtypeStruct((w, g4), jnp.float32) for w in widths] * 2
            + [jax.ShapeDtypeStruct((hidden, g4), jnp.float32)] * 2
            + [jax.ShapeDtypeStruct((1, g4), jnp.float32)] * 2),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dh carry F
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dh carry R
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dc carry F
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dc carry R
        ],
        # doubled streams: allow the full 128 MB physical VMEM of the v5e
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(
        *dir_in_vals(z_f, c_f, cb_f, g_f, h_f, hb_f),
        *dir_in_vals(z_r, c_r, cb_r, g_r, h_r, hb_r),
        *([p.astype(jnp.float32) for p in xs] * 2),
        w_hh_f.astype(jnp.bfloat16).T,
        *[w.astype(jnp.bfloat16).T for w in wp_f],
        w_hh_r.astype(jnp.bfloat16).T,
        *[w.astype(jnp.bfloat16).T for w in wp_r],
    )
    dxs_f, dxs_r = tuple(outs[:n_p]), tuple(outs[n_p : 2 * n_p])
    cat = lambda ws: (ws[0] if n_p == 1 else jnp.concatenate(ws, axis=0))
    dwih_f = cat(outs[2 * n_p : 3 * n_p])
    dwih_r = cat(outs[3 * n_p : 4 * n_p])
    dwhh_f, dwhh_r = outs[4 * n_p], outs[4 * n_p + 1]
    db_f, db_r = outs[4 * n_p + 2][0], outs[4 * n_p + 3][0]
    return dxs_f, dxs_r, (dwih_f, dwhh_f, db_f), (dwih_r, dwhh_r, db_r)


# ---------------------------------------------------------------------------
# Backward kernel: reverse-time adjoint recurrence, dW_hh left to XLA
# ---------------------------------------------------------------------------


def _lstm_bwd_chunk_kernel(
    gates_ref, h_ref, c_ref, hb_ref, cb_ref, g_ref, w_hh_ref,
    dgates_ref, dh_ref, dc_ref, *, t_chunk: int, hidden: int, reverse: bool,
    bf16: bool = False,
):
    """One (batch_tile, time_chunk) grid step of LSTM backprop.

    Standard LSTM adjoint, gate order i,f,g,o:
        do = dh . tanh(c);  dc += dh . o . (1 - tanh^2 c)
        di = dc.g  df = dc.c_prev  dg = dc.i;  dc_carry = dc.f
        dz = [di i(1-i), df f(1-f), dg (1-g^2), do o(1-o)]
        dh_carry = dz @ W_hh^T
    The (dh, dc) carries live in VMEM scratch across time chunks. "Previous"
    state (h_prev/c_prev) is read from within the streamed (h, c) blocks at
    static offsets; the one element per chunk that falls outside the block
    comes from the small strided boundary tensors (hb, cb). ``reverse`` runs
    the adjoint of the reverse-direction forward: traversal order flips and
    "previous" means t+1 instead of t-1. dW_hh is NOT accumulated here — the
    caller computes it as one large XLA einsum over (h_prev, dgates).
    """

    @pl.when(pl.program_id(1) == 0)
    def _reset():
        dh_ref[:] = jnp.zeros_like(dh_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)

    for s in range(t_chunk):  # unrolled: static sublane offsets
        # adjoint traversal is opposite to the forward direction's
        i_t = s if reverse else t_chunk - 1 - s
        if reverse:
            boundary = i_t == t_chunk - 1
            prev = i_t + 1
        else:
            boundary = i_t == 0
            prev = i_t - 1
        if boundary:
            h_prev = hb_ref[:].astype(jnp.float32)
            c_prev = cb_ref[:].astype(jnp.float32)
        else:
            h_prev = h_ref[:, prev, :].astype(jnp.float32)
            c_prev = c_ref[:, prev, :].astype(jnp.float32)
        c_t = c_ref[:, i_t, :].astype(jnp.float32)
        h_mm = h_prev.astype(jnp.bfloat16) if bf16 else h_prev
        z = gates_ref[:, i_t, :].astype(jnp.float32) + jnp.dot(
            h_mm, w_hh_ref[:], preferred_element_type=jnp.float32
        )
        gi = _sigmoid(z[:, :hidden])
        gf = _sigmoid(z[:, hidden : 2 * hidden])
        gg = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
        go = _sigmoid(z[:, 3 * hidden :])
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


@functools.partial(
    jax.jit,
    static_argnames=("batch_tile", "t_chunk", "interpret", "bf16", "reverse"),
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
    reverse: bool = False,
):
    """Backward through the recurrence: returns (dgates (B,T,4H), dw_hh (H,4H)).

    Gate pre-activations are recomputed from ``gates_all`` + the saved hidden
    sequence (cheaper than storing z). The adjoint visits time opposite to the
    forward direction; chunk-boundary previous states come from strided
    boundary tensors (no full shifted copies). dW_hh = Σ_t h_prev_tᵀ dz_t is
    one XLA einsum over the saved hidden sequence and the kernel's dgates
    output. ``bf16`` runs the per-step matmuls in bfloat16 with f32
    accumulation (W_hh bf16-resident; sequence blocks stay f32).
    """
    b, t, g4 = gates_all.shape
    hidden = g4 // 4
    assert b % batch_tile == 0 and t % t_chunk == 0
    n_btiles = b // batch_tile
    n_chunks = t // t_chunk

    h_seq = h_seq.astype(jnp.float32)
    c_seq = c_seq.astype(jnp.float32)
    zeros_bound = jnp.zeros((b, 1, hidden), jnp.float32)
    if reverse:
        # forward consumed time newest-first: "previous" of chunk j's last
        # element (index (j+1)*tc - 1) is h[(j+1)*tc]; last chunk -> zeros
        h_bound = jnp.concatenate([h_seq[:, t_chunk::t_chunk], zeros_bound], 1)
        c_bound = jnp.concatenate([c_seq[:, t_chunk::t_chunk], zeros_bound], 1)
    else:
        # "previous" of chunk j's first element (index j*tc) is h[j*tc - 1];
        # chunk 0 -> zeros
        h_bound = jnp.concatenate(
            [zeros_bound, h_seq[:, t_chunk - 1 : -1 : t_chunk]], 1)
        c_bound = jnp.concatenate(
            [zeros_bound, c_seq[:, t_chunk - 1 : -1 : t_chunk]], 1)
    # Mosaic requires block sublane dims divisible by 8 (or full) — flatten
    # the (B, n_chunks, H) boundaries to (B, n_chunks*H) and block the lane
    # dim instead, one (batch_tile, H) slab per chunk.
    h_bound = h_bound.reshape(b, n_chunks * hidden)
    c_bound = c_bound.reshape(b, n_chunks * hidden)

    if reverse:
        seq_idx = lambda i, j: (i, j, 0)           # oldest-first traversal
        bound_idx = lambda i, j: (i, j)
    else:
        seq_idx = lambda i, j: (i, n_chunks - 1 - j, 0)  # newest-first
        bound_idx = lambda i, j: (i, n_chunks - 1 - j)

    seq_spec = lambda width: pl.BlockSpec(
        (batch_tile, t_chunk, width), seq_idx, memory_space=pltpu.VMEM
    )
    bound_spec = pl.BlockSpec((batch_tile, hidden), bound_idx,
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_lstm_bwd_chunk_kernel, t_chunk=t_chunk,
                               hidden=hidden, reverse=reverse, bf16=bf16)
    dgates = pl.pallas_call(
        kernel,
        grid=(n_btiles, n_chunks),
        in_specs=[
            seq_spec(4 * hidden),                       # gates
            seq_spec(hidden),                           # h
            seq_spec(hidden),                           # c
            bound_spec,                                 # h boundary
            bound_spec,                                 # c boundary
            seq_spec(hidden),                           # g_out
            pl.BlockSpec((hidden, 4 * hidden), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),      # w_hh
        ],
        out_specs=seq_spec(4 * hidden),
        out_shape=jax.ShapeDtypeStruct((b, t, 4 * hidden), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dh carry
            pltpu.VMEM((batch_tile, hidden), jnp.float32),  # dc carry
        ],
        interpret=interpret,
    )(
        gates_all.astype(jnp.float32), h_seq, c_seq, h_bound, c_bound,
        g_out.astype(jnp.float32),
        w_hh.astype(jnp.bfloat16 if bf16 else jnp.float32),
    )

    # dW_hh = sum_t h_prev_t^T dz_t as ONE large MXU matmul (h_prev[0] == 0
    # for the forward direction / h_prev[T-1] == 0 for the reverse)
    if bf16:
        h16 = h_seq.astype(jnp.bfloat16)
        dz16 = dgates.astype(jnp.bfloat16)
        if reverse:
            dw_hh = jnp.einsum("bth,btg->hg", h16[:, 1:], dz16[:, :-1],
                               preferred_element_type=jnp.float32)
        else:
            dw_hh = jnp.einsum("bth,btg->hg", h16[:, :-1], dz16[:, 1:],
                               preferred_element_type=jnp.float32)
    else:
        if reverse:
            dw_hh = jnp.einsum("bth,btg->hg", h_seq[:, 1:], dgates[:, :-1])
        else:
            dw_hh = jnp.einsum("bth,btg->hg", h_seq[:, :-1], dgates[:, 1:])
    return dgates, dw_hh


# ---------------------------------------------------------------------------
# Training-safe fused layer: Pallas forward, Pallas backward
# ---------------------------------------------------------------------------


#: env-overridable for tile experiments (tools/profile_train.py A/Bs);
#: _FUSED_BATCH_TILE / _FUSED_T_CHUNK — read in refresh_flags() at the top
#: of this module (native f32 tile is (8, 128) sublanes x lanes)


def _apply_masks_xla(xs, masks, keep):
    """Reference (non-kernel) application of the uint8 inverted-dropout
    masks — used by the f32 fallback path and by tests as the oracle."""
    if not masks:
        return xs
    inv = 1.0 / keep
    return tuple(jnp.where(m != 0, p * inv, 0.0) for p, m in zip(xs, masks))


def _fused_pipeline_fwd(w_ih, w_hh, b, xs, reverse, bf16=False, masks=(),
                        keep=1.0, seed=None, need_residuals=True,
                        out_keep=1.0, out_seed=None, out_mask=None):
    """Shared forward for the custom-VJP layer (``xs`` is a tuple of input
    parts along the feature axis — a bidirectional predecessor's halves).

    Returns ``(primal_pad, residuals, b_sz)`` where ``primal_pad`` is the
    hidden sequence — or its in-kernel inverted-dropout copy when
    ``out_keep < 1`` (see lstm_fwd_fused_proj; the consumer recovers the
    mask from the dropped zeros, so the VJP residuals stay the UNDROPPED
    streams and the incoming cotangent arrives already recovered). Under
    bf16 (the AMP hot path) the in-kernel-projection forward runs (with
    in-kernel dropout when ``masks`` are given) and residuals are the f32
    (h, c, gates) sequences plus the padded input parts and masks; in f32
    the gates einsum + recurrence kernel run and residuals are
    (gates, h, c).
    """
    if isinstance(xs, jnp.ndarray):
        xs = (xs,)
    masks = tuple(masks) if masks else ()
    b_sz, t, _ = xs[0].shape
    bt = _pick_tile(b_sz, _FUSED_BATCH_TILE) if b_sz < _FUSED_BATCH_TILE \
        else _FUSED_BATCH_TILE
    pad_b = (-b_sz) % bt
    tc = _pick_tile(t, _FUSED_T_CHUNK)
    if bf16:
        xs_pad = tuple(
            jnp.pad(p, ((0, pad_b), (0, 0), (0, 0))) if pad_b else p
            for p in xs)
        masks_pad = tuple(
            jnp.pad(m, ((0, pad_b), (0, 0), (0, 0))) if pad_b else m
            for m in masks)
        om_pad = (jnp.pad(out_mask, ((0, pad_b), (0, 0), (0, 0)))
                  if (out_mask is not None and pad_b) else out_mask)
        h_pad, c_pad, z_pad, tc_pad, h_bound, c_bound, hd_pad = \
            lstm_fwd_fused_proj(
                xs_pad, w_ih, b, w_hh, masks_pad, keep, seed,
                out_keep=out_keep, out_seed=out_seed, out_mask=om_pad,
                batch_tile=bt, t_chunk=tc,
                interpret=_auto_interpret(None), reverse=reverse,
                need_residuals=need_residuals,
            )
        primal = hd_pad if hd_pad is not None else h_pad
        return primal, (h_pad, c_pad, z_pad, tc_pad, h_bound, c_bound,
                        xs_pad, masks_pad), b_sz

    xs_eff = _apply_masks_xla(xs, masks, keep)
    x = xs_eff[0] if len(xs_eff) == 1 else jnp.concatenate(xs_eff, axis=-1)
    gates = jnp.einsum("btd,dg->btg", x, w_ih) + b
    if pad_b:
        gates = jnp.pad(gates, ((0, pad_b), (0, 0), (0, 0)))
    out = lstm_recurrence_pallas(
        gates, w_hh, batch_tile=bt, t_chunk=tc,
        interpret=_auto_interpret(None), collect_cell=need_residuals,
        bf16=False, reverse=reverse,
    )
    h_pad, c_pad = out if need_residuals else (out, None)
    primal = h_pad
    if out_keep < 1.0:
        # f32 fallback supports the mask-oracle path only (no kernel PRNG)
        assert out_mask is not None, \
            "f32 output dropout needs an explicit out_mask"
        om_pad = (jnp.pad(out_mask, ((0, pad_b), (0, 0), (0, 0)))
                  if pad_b else out_mask)
        primal = jnp.where(om_pad != 0, h_pad / out_keep, 0.0)
    return primal, (gates, h_pad, c_pad), b_sz


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 7, 9, 10))
def _lstm_layer_fused_core(w_ih, w_hh, b, xs, reverse, bf16, masks, keep,
                           seed, mask_from_x, out_keep, out_seed, out_mask):
    # primal = inference/eval: the VJP never runs, so skip every residual
    # stream (~800 MB of HBM writes per layer-direction at B=512)
    h_pad, _, b_sz = _fused_pipeline_fwd(w_ih, w_hh, b, xs, reverse, bf16,
                                         masks, keep, seed,
                                         need_residuals=False,
                                         out_keep=out_keep,
                                         out_seed=out_seed,
                                         out_mask=out_mask)
    return h_pad[:b_sz]


def _fused_fwd(w_ih, w_hh, b, xs, reverse, bf16, masks, keep, seed,
               mask_from_x, out_keep, out_seed, out_mask):
    h_pad, res, b_sz = _fused_pipeline_fwd(w_ih, w_hh, b, xs, reverse, bf16,
                                           masks, keep, seed,
                                           out_keep=out_keep,
                                           out_seed=out_seed,
                                           out_mask=out_mask)
    return h_pad[:b_sz], (w_ih, w_hh, xs, masks, seed, out_seed,
                          out_mask) + res


def _mask_cotangents(masks):
    """uint8/int32 primals take float0 cotangents (discarded by the grad
    graph)."""
    return tuple(np.zeros(m.shape, jax.dtypes.float0) for m in masks)


def _seed_cotangent(seed):
    return (None if seed is None
            else np.zeros(jnp.shape(seed), jax.dtypes.float0))


def _opt_mask_cotangent(mask):
    """float0 cotangent for one optional uint8 mask primal."""
    return (None if mask is None
            else np.zeros(jnp.shape(mask), jax.dtypes.float0))


def _fused_bwd(reverse, bf16, keep, mask_from_x, out_keep, residuals, g):
    # NOTE on out_keep: the incoming ``g`` is ALREADY the cotangent of the
    # undropped output — the consumer's mask_from_x recovery applied the
    # mask/keep factor (identical contract to the XLA dropout_fwd_only +
    # mask_from_x default) — so the adjoint below never sees the output
    # dropout at all. out_seed/out_mask only need float0 cotangents.
    if bf16:
        (w_ih, w_hh, xs, masks, seed, out_seed, out_mask, h_pad, c_pad,
         z_pad, tc_pad, h_bound, c_bound, xs_pad, masks_pad) = residuals
        b_sz = xs[0].shape[0]
        pad_b = z_pad.shape[0] - b_sz
        bt = _pick_tile(z_pad.shape[0], _FUSED_BATCH_TILE)
        tc = _pick_tile(z_pad.shape[1], _FUSED_T_CHUNK)
        g_in = jnp.pad(g, ((0, pad_b), (0, 0), (0, 0))) if pad_b else g
        dxs, dw_ih, dw_hh, db = lstm_bwd_fused(
            z_pad, c_pad, h_pad, h_bound, c_bound, xs_pad, g_in, w_ih, w_hh,
            masks_pad, keep, seed, mask_from_x=mask_from_x,
            tc_seq=tc_pad, batch_tile=bt, t_chunk=tc,
            interpret=_auto_interpret(None), reverse=reverse,
        )
        return (dw_ih, dw_hh, db,
                tuple(dx[:b_sz].astype(p.dtype) for dx, p in zip(dxs, xs)),
                _mask_cotangents(masks), _seed_cotangent(seed),
                _seed_cotangent(out_seed), _opt_mask_cotangent(out_mask))

    (w_ih, w_hh, xs, masks, seed, out_seed, out_mask, gates, h_pad,
     c_pad) = residuals
    b_sz = xs[0].shape[0]
    pad_b = gates.shape[0] - b_sz
    # TPU tiling: the block's sublane dim (t_chunk) must divide by 8; the f32
    # backward kernel streams 5 sequence tensors so its batch tile is
    # VMEM-capped at 64 (always a divisor of the padded batch — the forward
    # pads to its OWN tile, e.g. B=96 stays 96, which 64 does not divide).
    bt = _pick_tile(gates.shape[0], 64)
    tc = _pick_tile(gates.shape[1], _FUSED_T_CHUNK)

    g_in = g
    if pad_b:
        g_in = jnp.pad(g_in, ((0, pad_b), (0, 0), (0, 0)))

    dgates_pad, dw_hh = lstm_recurrence_backward(
        gates, h_pad, c_pad, w_hh, g_in, batch_tile=bt, t_chunk=tc,
        interpret=_auto_interpret(None), bf16=False, reverse=reverse,
    )
    dgates = dgates_pad[:b_sz]
    xs_eff = _apply_masks_xla(xs, masks, keep)
    x = xs_eff[0] if len(xs_eff) == 1 else jnp.concatenate(xs_eff, axis=-1)
    dw_ih = jnp.einsum("btd,btg->dg", x, dgates)
    dx = jnp.einsum("btg,dg->btd", dgates, w_ih)
    db = jnp.sum(dgates, axis=(0, 1))
    if len(xs) == 1:
        dxs = (dx,)
    else:
        off, dxs = 0, []
        for p in xs:
            dxs.append(dx[:, :, off : off + p.shape[-1]])
            off += p.shape[-1]
        dxs = tuple(dxs)
    dxs = _apply_masks_xla(dxs, masks, keep)
    if mask_from_x:
        inv = 1.0 / keep
        dxs = tuple(jnp.where(p == 0.0, 0.0, d * inv)
                    for p, d in zip(xs, dxs))
    return (dw_ih, dw_hh, db, dxs, _mask_cotangents(masks),
            _seed_cotangent(seed), _seed_cotangent(out_seed),
            _opt_mask_cotangent(out_mask))


_lstm_layer_fused_core.defvjp(_fused_fwd, _fused_bwd)


def lstm_layer_fused_parts(w_ih, w_hh, b, xs, reverse: bool = False,
                           bf16: bool = False, masks=None, keep: float = 1.0,
                           dropout_seed=None, mask_from_x: bool = False,
                           out_keep: float = 1.0, out_seed=None,
                           out_mask=None):
    """LSTM layer with Pallas forward AND Pallas backward kernels, consuming
    the input as a tuple of feature-axis parts (so a bidirectional
    predecessor's fwd/rev halves never get concatenated in HBM; ``dx`` comes
    back as matching parts).

    ``masks`` (optional, uint8 per part, 0=drop) applies inverted dropout
    with rate ``1-keep`` to the input — in-kernel under bf16, so the masked
    tensor and both its forward and backward XLA select fusions never exist
    in HBM; via the XLA oracle path in f32.

    In f32, gradients match the pure ``lax.scan`` layer (the adjoint
    recursion is exact, tested to 1e-4). Under ``bf16`` the AMP policy
    applies: all matmuls (projection, recurrence, adjoint, weight-gradient)
    run on the MXU in bf16 with f32 accumulation while every stream and
    residual stays f32 (measured faster than bf16 storage — see the fused-
    kernel section header), via the fully-fused kernels: in-kernel input
    projection forward, in-kernel dx/dW_ih/dW_hh/db backward.
    """
    masks = tuple(masks) if masks else ()
    assert dropout_seed is None or (bf16 and not masks), \
        "dropout_seed needs the bf16 fused-kernel path"
    assert not (mask_from_x and (masks or dropout_seed is not None))
    assert out_seed is None or bf16, \
        "out_seed (PRNG output dropout) needs the bf16 fused-kernel path"
    return _lstm_layer_fused_core(w_ih, w_hh, b, xs, reverse, bf16, masks,
                                  float(keep), dropout_seed, mask_from_x,
                                  float(out_keep), out_seed, out_mask)


def lstm_layer_fused(w_ih, w_hh, b, x, reverse: bool = False,
                     bf16: bool = False):
    """Single-input convenience wrapper over ``lstm_layer_fused_parts``."""
    return lstm_layer_fused_parts(w_ih, w_hh, b, (x,), reverse, bf16)


# ---------------------------------------------------------------------------
# Bidirectional pair: both directions of a layer under ONE custom VJP, so
# the two directions' input cotangents are summed INSIDE the second backward
# kernel (dx_add) instead of by an XLA add over the full (B, T, D) parts
# (measured 4 x 0.6 ms add_any ops per train step at B=512).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 6, 7, 8))
def _bilstm_layer_fused_core(pf, pb, xs, bf16, masks, seed, keep,
                             mask_from_x, out_keep, out_seed, out_masks):
    # primal = inference/eval: skip every residual stream (see
    # _lstm_layer_fused_core)
    om_f, om_r = (out_masks if out_masks else (None, None))
    h_f, _, b_sz = _fused_pipeline_fwd(pf["w_ih"], pf["w_hh"], pf["b"], xs,
                                       False, bf16, masks, keep, seed,
                                       need_residuals=False,
                                       out_keep=out_keep, out_seed=out_seed,
                                       out_mask=om_f)
    h_r, _, _ = _fused_pipeline_fwd(pb["w_ih"], pb["w_hh"], pb["b"], xs,
                                    True, bf16, masks, keep, seed,
                                    need_residuals=False,
                                    out_keep=out_keep, out_seed=out_seed,
                                    out_mask=om_r)
    return h_f[:b_sz], h_r[:b_sz]


def _bilstm_fwd(pf, pb, xs, bf16, masks, seed, keep, mask_from_x, out_keep,
                out_seed, out_masks):
    om_f, om_r = (out_masks if out_masks else (None, None))
    h_f, res_f, b_sz = _fused_pipeline_fwd(pf["w_ih"], pf["w_hh"], pf["b"],
                                           xs, False, bf16, masks, keep, seed,
                                           out_keep=out_keep,
                                           out_seed=out_seed, out_mask=om_f)
    h_r, res_r, _ = _fused_pipeline_fwd(pb["w_ih"], pb["w_hh"], pb["b"], xs,
                                        True, bf16, masks, keep, seed,
                                        out_keep=out_keep,
                                        out_seed=out_seed, out_mask=om_r)
    return (h_f[:b_sz], h_r[:b_sz]), (pf, pb, xs, masks, seed, out_seed,
                                      out_masks, res_f, res_r)


def _bilstm_bwd(bf16, keep, mask_from_x, out_keep, residuals, g):
    # the incoming g is already mask/keep-recovered by the consumer's
    # mask_from_x when out_keep < 1 (see _fused_bwd's NOTE) — the adjoint
    # below is identical with or without output dropout
    pf, pb, xs, masks, seed, out_seed, out_masks, res_f, res_r = residuals
    g_f, g_r = g
    b_sz = xs[0].shape[0]

    if bf16:
        (h_pad, c_pad, z_pad, tc_pad, h_bound, c_bound, xs_pad,
         masks_pad) = res_f
        pad_b = z_pad.shape[0] - b_sz
        bt = _pick_tile(z_pad.shape[0], _FUSED_BATCH_TILE)
        tc = _pick_tile(z_pad.shape[1], _FUSED_T_CHUNK)
        pad = lambda gg: (jnp.pad(gg, ((0, pad_b), (0, 0), (0, 0)))
                          if pad_b else gg)
        if (_BWD_DUALDIR and not _BWD_V2 and not masks_pad
                and seed is None and tc_pad is None):
            (h_r, c_r, z_r, _, hb_r, cb_r, _, _) = res_r
            bt_dd = _pick_tile(z_pad.shape[0], _DUALDIR_BT or 64)
            dxs_f, dxs_r, (dwih_f, dwhh_f, db_f), (dwih_b, dwhh_b, db_b) = \
                lstm_bwd_dualdir(
                    (z_pad, c_pad, h_pad, h_bound, c_bound),
                    (z_r, c_r, h_r, hb_r, cb_r),
                    xs_pad, pad(g_f), pad(g_r),
                    pf["w_ih"], pf["w_hh"], pb["w_ih"], pb["w_hh"],
                    keep=keep, mask_from_x=mask_from_x,
                    batch_tile=bt_dd, t_chunk=tc,
                    interpret=_auto_interpret(None))
            dxs = tuple((a + b)[:b_sz].astype(p.dtype)
                        for a, b, p in zip(dxs_f, dxs_r, xs))
            return ({"w_ih": dwih_f, "w_hh": dwhh_f, "b": db_f},
                    {"w_ih": dwih_b, "w_hh": dwhh_b, "b": db_b},
                    dxs, _mask_cotangents(masks), _seed_cotangent(seed),
                    _seed_cotangent(out_seed),
                    (tuple(_opt_mask_cotangent(m) for m in out_masks)
                     if out_masks else None))
        dxs_f, dwih_f, dwhh_f, db_f = lstm_bwd_fused(
            z_pad, c_pad, h_pad, h_bound, c_bound, xs_pad, pad(g_f),
            pf["w_ih"], pf["w_hh"], masks_pad, keep, seed,
            mask_from_x=mask_from_x, tc_seq=tc_pad,
            batch_tile=bt, t_chunk=tc, interpret=_auto_interpret(None),
            reverse=False)
        (h_pad, c_pad, z_pad, tc_pad, h_bound, c_bound, xs_pad,
         masks_pad) = res_r
        dxs, dwih_b, dwhh_b, db_b = lstm_bwd_fused(
            z_pad, c_pad, h_pad, h_bound, c_bound, xs_pad, pad(g_r),
            pb["w_ih"], pb["w_hh"], masks_pad, keep, seed, dxs_f,
            mask_from_x=mask_from_x, tc_seq=tc_pad,
            batch_tile=bt, t_chunk=tc, interpret=_auto_interpret(None),
            reverse=True)
        dxs = tuple(d[:b_sz].astype(p.dtype) for d, p in zip(dxs, xs))
    else:
        # f32 fallback: two single-direction VJPs + XLA add (cold path)
        om_f, om_r = (out_masks if out_masks else (None, None))
        dwih_f, dwhh_f, db_f, dxs_f, _, _, _, _ = _fused_bwd(
            False, bf16, keep, mask_from_x, out_keep,
            (pf["w_ih"], pf["w_hh"], xs, masks, seed, out_seed, om_f)
            + res_f, g_f)
        dwih_b, dwhh_b, db_b, dxs_b, _, _, _, _ = _fused_bwd(
            True, bf16, keep, mask_from_x, out_keep,
            (pb["w_ih"], pb["w_hh"], xs, masks, seed, out_seed, om_r)
            + res_r, g_r)
        dxs = tuple(a + b for a, b in zip(dxs_f, dxs_b))

    return ({"w_ih": dwih_f, "w_hh": dwhh_f, "b": db_f},
            {"w_ih": dwih_b, "w_hh": dwhh_b, "b": db_b},
            dxs, _mask_cotangents(masks), _seed_cotangent(seed),
            _seed_cotangent(out_seed),
            (tuple(_opt_mask_cotangent(m) for m in out_masks)
             if out_masks else None))


_bilstm_layer_fused_core.defvjp(_bilstm_fwd, _bilstm_bwd)


def bilstm_layer_fused_parts(params_fwd, params_bwd, xs, bf16: bool = False,
                             masks=None, keep: float = 1.0,
                             dropout_seed=None, mask_from_x: bool = False,
                             out_keep: float = 1.0, out_seed=None,
                             out_masks=None):
    """Both directions of a bidirectional layer under one custom VJP.

    Returns ``(h_fwd, h_rev)`` parts; the input cotangent sum happens inside
    the reverse direction's backward kernel (see section header).
    ``out_keep < 1`` makes each direction's forward kernel write the
    inverted-dropout copy of its output instead (mask from ``out_seed``,
    direction-salted hardware PRNG, or from per-direction uint8
    ``out_masks``); the consumer must then run with ``mask_from_x``.
    """
    if isinstance(xs, jnp.ndarray):
        xs = (xs,)
    masks = tuple(masks) if masks else ()
    out_masks = tuple(out_masks) if out_masks else None
    assert dropout_seed is None or (bf16 and not masks)
    assert not (mask_from_x and (masks or dropout_seed is not None))
    assert out_masks is None or len(out_masks) == 2
    assert out_seed is None or bf16
    return _bilstm_layer_fused_core(params_fwd, params_bwd, tuple(xs), bf16,
                                    masks, dropout_seed, float(keep),
                                    mask_from_x, float(out_keep), out_seed,
                                    out_masks)
