"""Fused Pallas kernel pair for the input projection block.

The classifier front-end (ref 04_lstm_model.py:173-178) is
``Linear(C -> H) -> LayerNorm -> GELU`` applied per timestep. As XLA ops at
B=512/T=256/H=256 this is ~1 ms/step of the non-kernel residue: the LN
stats are two full (B, T, H) reduce passes, GELU is an erf pass, and the
backward repeats all of it plus the dense VJP — six (B, T, H)-sized HBM
sweeps for a block whose only real input is the (B, T, 61) window.

Fused: ONE forward kernel streams x once and writes y = gelu(LN(xW + b))
once (LN is per-row, entirely inside the block — no cross-chunk state);
ONE backward kernel streams (x, dy), RECOMPUTES the forward in VMEM (x is
61-wide: re-projecting costs a K=61 matmul, far cheaper than streaming any
(B, T, H) residual), and produces dx plus all parameter gradients in
VMEM-resident accumulators. Total HBM traffic drops from ~6 to ~2.5
(B, T, H)-equivalents. A/B flag: EEGFLOW_FUSED_INPUT=1 (docs/DESIGN.md §5).

Numerics: the backward re-runs the same bf16-matmul + f32-accumulation the
forward used, so the recomputed LN statistics are bit-identical to the
forward's. GELU is the exact erf form (torch nn.GELU default — layers.gelu).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf(x):
    """erf via the Abramowitz & Stegun 7.1.26 rational approximation,
    |abs err| <= 1.5e-7 — below f32 eps, so f32-exact in practice.

    Needed because ``jax.lax.erf`` has no Mosaic TPU lowering
    (NotImplementedError: Unimplemented primitive ... erf, measured on a
    real v5e) — ``exp`` does lower, so the A&S form compiles in-kernel."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    r = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0.0, -r, r)


def _gelu_exact(z):
    """Exact (erf) GELU, matching eegflow.nn.layers.gelu to ~1.5e-7."""
    return 0.5 * z * (1.0 + _erf(z * _INV_SQRT2))


def _gelu_grad(z):
    """d/dz of exact GELU: Phi(z) + z * phi(z)."""
    phi = jnp.exp(-0.5 * z * z) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + _erf(z * _INV_SQRT2))
    return cdf + z * phi


def _proj_ln(x2, w_ref, b_ref, gamma_ref, beta_ref, eps, bf16):
    """(N, C) rows -> (z_ln, xhat, rsig): the Linear + LN core, shared by
    the forward and the recomputing backward (identical matmul dtype ->
    bit-identical stats)."""
    mm = x2.astype(jnp.bfloat16) if bf16 else x2
    z = jnp.dot(mm, w_ref[:], preferred_element_type=jnp.float32) + b_ref[0, :]
    mu = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.mean(z * z, axis=-1, keepdims=True) - mu * mu
    rsig = jax.lax.rsqrt(var + eps)
    xhat = (z - mu) * rsig
    return xhat * gamma_ref[0, :] + beta_ref[0, :], xhat, rsig


def _input_block_fwd_kernel(*refs, eps: float, bf16: bool,
                            out_keep: float = 1.0, out_mask: bool = False,
                            out_prng: bool = False):
    """y = gelu(LN(xW + b)); with ``out_keep < 1`` the kernel writes the
    inverted-dropout copy INSTEAD — the undropped y is needed by nobody
    (this block's backward recomputes from x; the consumer recovers the
    mask from the zeros via mask_from_x), so folding the input dropout here
    is pure savings: the XLA dropout fusion on (B, T, H) never exists and
    no extra byte is written."""
    o = 0
    x_ref = refs[o]
    o += 1
    if out_mask:
        out_mask_ref = refs[o]
        o += 1
    if out_prng:
        seed_ref = refs[o]
        o += 1
    w_ref, b_ref, gamma_ref, beta_ref, y_ref = refs[o : o + 5]

    bt, tc, c = x_ref.shape
    h = y_ref.shape[-1]
    x2 = x_ref[:].reshape(bt * tc, c)
    z_ln, _, _ = _proj_ln(x2, w_ref, b_ref, gamma_ref, beta_ref, eps, bf16)
    y = _gelu_exact(z_ln).reshape(bt, tc, h)
    if out_prng:
        from eegflow.nn.pallas_lstm import _prng_block_masks

        # salt0=32: distinct from the LSTM kernels' input (0) and
        # output (16/17) mask streams
        omask = _prng_block_masks(seed_ref, pl.program_id(0),
                                  pl.program_id(1), 1, [(bt, tc, h)],
                                  out_keep, salt0=32)[0]
        y = y * omask
    elif out_mask:
        y = jnp.where(out_mask_ref[:] != 0, y * (1.0 / out_keep), 0.0)
    y_ref[:] = y


def _input_block_bwd_kernel(x_ref, dy_ref, w_ref, wt_ref, b_ref, gamma_ref,
                            beta_ref, dx_ref, dw_ref, db_ref, dgam_ref,
                            dbet_ref, *, eps: float, bf16: bool):
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _zero():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dgam_ref[:] = jnp.zeros_like(dgam_ref)
        dbet_ref[:] = jnp.zeros_like(dbet_ref)

    bt, tc, c = x_ref.shape
    h = dy_ref.shape[-1]
    x2 = x_ref[:].reshape(bt * tc, c)
    dy = dy_ref[:].reshape(bt * tc, h)
    z_ln, xhat, rsig = _proj_ln(x2, w_ref, b_ref, gamma_ref, beta_ref, eps,
                                bf16)
    dln = dy * _gelu_grad(z_ln)
    dgam_ref[:] += jnp.sum(dln * xhat, axis=0, keepdims=True)
    dbet_ref[:] += jnp.sum(dln, axis=0, keepdims=True)
    dxhat = dln * gamma_ref[0, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dz = rsig * (dxhat - m1 - xhat * m2)
    db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
    dz16 = dz.astype(jnp.bfloat16) if bf16 else dz
    x16 = x2.astype(jnp.bfloat16) if bf16 else x2
    dw_ref[:] += jax.lax.dot_general(
        x16, dz16, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[:] = jnp.dot(dz16, wt_ref[:],
                        preferred_element_type=jnp.float32).reshape(bt, tc, c)


def _shapes(x, batch_tile, t_chunk):
    from eegflow.nn.pallas_lstm import _auto_interpret, _pick_tile

    b_sz, t, _ = x.shape
    bt = _pick_tile(b_sz, batch_tile) if b_sz < batch_tile else batch_tile
    pad_b = (-b_sz) % bt
    tc = _pick_tile(t, t_chunk)
    return bt, pad_b, tc, _auto_interpret(None)


@functools.partial(jax.jit,
                   static_argnames=("bf16", "batch_tile", "t_chunk",
                                    "interpret", "out_keep"))
def _fwd_call(x, w, b, gamma, beta, bf16, batch_tile, t_chunk, interpret,
              out_keep=1.0, out_seed=None, out_mask=None):
    b_sz, t, c = x.shape
    h = w.shape[1]
    drop_out = out_keep < 1.0
    out_prng = drop_out and out_mask is None
    if drop_out:
        assert (out_seed is None) != (out_mask is None)
    else:
        assert out_seed is None and out_mask is None
    kernel = functools.partial(_input_block_fwd_kernel, eps=1e-5, bf16=bf16,
                               out_keep=float(out_keep),
                               out_mask=out_mask is not None,
                               out_prng=out_prng)
    blk = lambda width: pl.BlockSpec((batch_tile, t_chunk, width),
                                     lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b_sz // batch_tile, t // t_chunk),
        in_specs=[blk(c)]
        + ([blk(h)] if out_mask is not None else [])
        + ([pl.BlockSpec(memory_space=pltpu.SMEM)] if out_prng else [])
        + [const(c, h), const(1, h), const(1, h), const(1, h)],
        out_specs=blk(h),
        out_shape=jax.ShapeDtypeStruct((b_sz, t, h), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32),
      *([out_mask.astype(jnp.uint8)] if out_mask is not None else []),
      *([jnp.asarray(out_seed, jnp.int32)] if out_prng else []),
      w.astype(jnp.bfloat16 if bf16 else jnp.float32),
      b.reshape(1, -1).astype(jnp.float32),
      gamma.reshape(1, -1).astype(jnp.float32),
      beta.reshape(1, -1).astype(jnp.float32))


@functools.partial(jax.jit,
                   static_argnames=("bf16", "batch_tile", "t_chunk",
                                    "interpret"))
def _bwd_call(x, dy, w, b, gamma, beta, bf16, batch_tile, t_chunk, interpret):
    b_sz, t, c = x.shape
    h = w.shape[1]
    kernel = functools.partial(_input_block_bwd_kernel, eps=1e-5, bf16=bf16)
    blk = lambda width: pl.BlockSpec((batch_tile, t_chunk, width),
                                     lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    mm = jnp.bfloat16 if bf16 else jnp.float32
    return pl.pallas_call(
        kernel,
        grid=(b_sz // batch_tile, t // t_chunk),
        in_specs=[blk(c), blk(h), const(c, h), const(h, c), const(1, h),
                  const(1, h), const(1, h)],
        out_specs=(blk(c), const(c, h), const(1, h), const(1, h),
                   const(1, h)),
        out_shape=(jax.ShapeDtypeStruct((b_sz, t, c), jnp.float32),
                   jax.ShapeDtypeStruct((c, h), jnp.float32),
                   jax.ShapeDtypeStruct((1, h), jnp.float32),
                   jax.ShapeDtypeStruct((1, h), jnp.float32),
                   jax.ShapeDtypeStruct((1, h), jnp.float32)),
        interpret=interpret,
    )(x.astype(jnp.float32), dy.astype(jnp.float32),
      w.astype(mm), w.astype(mm).T,
      b.reshape(1, -1).astype(jnp.float32),
      gamma.reshape(1, -1).astype(jnp.float32),
      beta.reshape(1, -1).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _input_block_core(proj, norm, bf16, out_keep, x, out_seed, out_mask):
    y, _ = _input_block_fwd(proj, norm, bf16, out_keep, x, out_seed,
                            out_mask)
    return y


def _input_block_fwd(proj, norm, bf16, out_keep, x, out_seed, out_mask):
    bt, pad_b, tc, interp = _shapes(x, 128, 8)
    b_sz = x.shape[0]
    pad = lambda a: (jnp.pad(a, ((0, pad_b), (0, 0), (0, 0))) if pad_b else a)
    y = _fwd_call(pad(x), proj["w"], proj["b"], norm["scale"], norm["bias"],
                  bf16, bt, tc, interp, out_keep=out_keep,
                  out_seed=out_seed,
                  out_mask=pad(out_mask) if out_mask is not None else None)
    return y[:b_sz], (proj, norm, x, out_seed, out_mask)


def _input_block_bwd(bf16, out_keep, res, g):
    # with out_keep < 1 the incoming g is ALREADY the cotangent of the
    # undropped y — the consumer's mask_from_x recovery applied mask/keep
    # (same contract as the LSTM kernels' FWD_DROPW mode) — so the adjoint
    # is identical with or without the folded dropout
    proj, norm, x, out_seed, out_mask = res
    bt, pad_b, tc, interp = _shapes(x, 128, 8)
    b_sz = x.shape[0]
    pad = lambda a: (jnp.pad(a, ((0, pad_b), (0, 0), (0, 0))) if pad_b else a)
    dx, dw, db, dgam, dbet = _bwd_call(
        pad(x), pad(g), proj["w"], proj["b"], norm["scale"], norm["bias"],
        bf16, bt, tc, interp)
    from eegflow.nn.pallas_lstm import _opt_mask_cotangent, _seed_cotangent

    return ({"w": dw, "b": db[0]},
            {"scale": dgam[0], "bias": dbet[0]},
            dx[:b_sz].astype(x.dtype),
            _seed_cotangent(out_seed), _opt_mask_cotangent(out_mask))


_input_block_core.defvjp(_input_block_fwd, _input_block_bwd)


def input_block_fused(proj: Dict[str, jnp.ndarray],
                      norm: Dict[str, jnp.ndarray], x: jnp.ndarray,
                      bf16: bool = False, out_keep: float = 1.0,
                      out_seed=None, out_mask=None) -> jnp.ndarray:
    """Fused ``gelu(LayerNorm(x @ W + b))`` over (B, T, C) windows.

    Drop-in for the XLA input-projection block (model.classifier_apply;
    ref 04_lstm_model.py:173-178), training-safe via a recomputing custom
    VJP (no (B, T, H) residual streams). ``bf16`` runs both matmuls on the
    MXU in bfloat16 with f32 accumulation (the AMP policy).

    ``out_keep < 1`` writes the inverted-dropout copy INSTEAD of y (mask
    from ``out_seed`` — hardware PRNG, compiled TPU — or uint8 ``out_mask``,
    the CPU-testable path); the consumer must recover the mask from the
    zeros (mask_from_x), after which gradients flow exactly as undropped.
    """
    return _input_block_core(proj, norm, bool(bf16), float(out_keep), x,
                             out_seed, out_mask)
