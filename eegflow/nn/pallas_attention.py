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
import numpy as np
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


# ---------------------------------------------------------------------------
# Fused training pool head: LayerNorm + additive attention in ONE kernel pair
#
# Consumes the BiLSTM output as feature-axis parts (the fwd/rev halves —
# see pallas_lstm's parts design): LN statistics combine partial sums across
# parts, W1 is split row-wise, and the context comes back as parts. The
# (B, T, 2H) concat, the XLA LayerNorm fusions, and the attention fusions
# all disappear: each direction of the pass streams h exactly once.
# Replaces ref 04_lstm_model.py:112-128 (Attention) + :190-193 (LayerNorm)
# for the AMP training path.
# ---------------------------------------------------------------------------


def _ln_rows(h_parts, gamma_slices, beta_slices, d_total, eps, use_ln):
    """Row-wise LayerNorm over the concatenated feature axis, per part.

    Returns (y_parts, xhat_parts, rsig) without materializing the concat.
    """
    if not use_ln:
        return h_parts, None, None
    s1 = sum(jnp.sum(p, axis=-1, keepdims=True) for p in h_parts)
    s2 = sum(jnp.sum(p * p, axis=-1, keepdims=True) for p in h_parts)
    mu = s1 / d_total
    var = s2 / d_total - mu * mu
    rsig = jax.lax.rsqrt(var + eps)
    xhat = [(p - mu) * rsig for p in h_parts]
    y = [xh * g + b for xh, g, b in zip(xhat, gamma_slices, beta_slices)]
    return y, xhat, rsig


def _pool_head_fwd_kernel(*refs, t_chunk: int, n_parts: int, use_ln: bool,
                          eps: float, d_total: int, bf16: bool):
    h_refs = refs[:n_parts]
    o = n_parts
    if use_ln:
        gamma_ref, beta_ref = refs[o : o + 2]
        o += 2
    w1_refs = refs[o : o + n_parts]
    b1_ref, w2_ref = refs[o + n_parts : o + n_parts + 2]
    outs = refs[o + n_parts + 2 :]
    scores_out = outs[0]
    ctx_outs = outs[1 : 1 + n_parts]
    m_ref, l_ref = outs[1 + n_parts : 3 + n_parts]
    acc_refs = outs[3 + n_parts : 3 + 2 * n_parts]
    scores_scratch = outs[3 + 2 * n_parts]

    j = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j == 0)
    def _reset():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        for a in acc_refs:
            a[:] = jnp.zeros_like(a)

    hs = [r[:] for r in h_refs]  # (Bt, Tc, Dp)
    bt, tc, _ = hs[0].shape
    widths = [h.shape[-1] for h in hs]
    offs = np.cumsum([0] + widths)
    if use_ln:
        gam = [gamma_ref[0:1, offs[p] : offs[p + 1]][None] for p in range(n_parts)]
        bet = [beta_ref[0:1, offs[p] : offs[p + 1]][None] for p in range(n_parts)]
    else:
        gam = bet = None
    ys, _, _ = _ln_rows(hs, gam, bet, d_total, eps, use_ln)

    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    zp = b1_ref[0, :]
    acc = None
    for p in range(n_parts):
        t_ = jnp.dot(ys[p].reshape(bt * tc, widths[p]).astype(mm_dtype),
                     w1_refs[p][:], preferred_element_type=jnp.float32)
        acc = t_ if acc is None else acc + t_
    proj = jnp.tanh(acc + zp)                       # (Bt*Tc, K)
    s = jnp.sum(proj * w2_ref[0, :], axis=-1).reshape(bt, tc)
    scores_scratch[j] = s

    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    scale = jnp.exp(m_old - m_new)
    pexp = jnp.exp(s - m_new)                       # (Bt, Tc)
    l_ref[:] = l_ref[:] * scale + jnp.sum(pexp, axis=-1, keepdims=True)
    for p in range(n_parts):
        acc_refs[p][:] = acc_refs[p][:] * scale + jnp.sum(
            pexp[:, :, None] * ys[p], axis=1)
    m_ref[:] = m_new

    @pl.when(j == n_chunks - 1)
    def _finalize():
        for p in range(n_parts):
            ctx_outs[p][:] = acc_refs[p][:] / l_ref[:]
        for c in range(scores_scratch.shape[0]):
            scores_out[:, c * t_chunk : (c + 1) * t_chunk] = scores_scratch[c]


def _pool_head_bwd_kernel(*refs, t_chunk: int, n_parts: int, use_ln: bool,
                          eps: float, d_total: int, bf16: bool):
    """One streaming pass producing dh parts and accumulating the LN and
    attention parameter gradients in VMEM-resident blocks."""
    h_refs = refs[:n_parts]
    o = n_parts
    w_ref, gs_ref = refs[o], refs[o + 1]            # softmax w, upstream dscores
    g_refs = refs[o + 2 : o + 2 + n_parts]          # dL/dctx parts (Bt, Dp)
    gctx_ref = refs[o + 2 + n_parts]                # (Bt, 1) = g . ctx
    o = o + 3 + n_parts
    if use_ln:
        gamma_ref, beta_ref = refs[o : o + 2]
        o += 2
    w1_refs = refs[o : o + n_parts]                 # (Dp, K)
    w1t_refs = refs[o + n_parts : o + 2 * n_parts]  # (K, Dp)
    b1_ref, w2_ref = refs[o + 2 * n_parts : o + 2 * n_parts + 2]
    outs = refs[o + 2 * n_parts + 2 :]
    dh_outs = outs[:n_parts]
    dw1_accs = outs[n_parts : 2 * n_parts]
    db1_acc, dw2_acc = outs[2 * n_parts : 2 * n_parts + 2]
    o2 = 2 * n_parts + 2
    if use_ln:
        dgam_acc, dbet_acc = outs[o2 : o2 + 2]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _zero():
        for a in dw1_accs:
            a[:] = jnp.zeros_like(a)
        db1_acc[:] = jnp.zeros_like(db1_acc)
        dw2_acc[:] = jnp.zeros_like(dw2_acc)
        if use_ln:
            dgam_acc[:] = jnp.zeros_like(dgam_acc)
            dbet_acc[:] = jnp.zeros_like(dbet_acc)

    hs = [r[:] for r in h_refs]
    bt, tc, _ = hs[0].shape
    widths = [h.shape[-1] for h in hs]
    offs = np.cumsum([0] + widths)
    if use_ln:
        gam = [gamma_ref[0:1, offs[p] : offs[p + 1]][None] for p in range(n_parts)]
        bet = [beta_ref[0:1, offs[p] : offs[p + 1]][None] for p in range(n_parts)]
    else:
        gam = bet = None
    ys, xhat, rsig = _ln_rows(hs, gam, bet, d_total, eps, use_ln)

    mm_dtype = jnp.bfloat16 if bf16 else jnp.float32
    acc = None
    for p in range(n_parts):
        t_ = jnp.dot(ys[p].reshape(bt * tc, widths[p]).astype(mm_dtype),
                     w1_refs[p][:], preferred_element_type=jnp.float32)
        acc = t_ if acc is None else acc + t_
    proj = jnp.tanh(acc + b1_ref[0, :])             # (Bt*Tc, K)

    # (B, T) tensors arrive chunk-major (n_chunks, B, Tc): a (Bt, Tc)-lane
    # block of the flat layout would violate Mosaic's 128-lane rule
    w = w_ref[0]                                    # (Bt, Tc) softmax weights
    gs = [g[:] for g in g_refs]                     # (Bt, Dp)
    # gy_t = g . y_t (concat row dot), via per-part partial sums
    gy = sum(jnp.sum(gs[p][:, None, :] * ys[p], axis=-1)
             for p in range(n_parts))               # (Bt, Tc)
    ds = w * (gy - gctx_ref[:]) + gs_ref[0]         # (Bt, Tc)

    # keep the lane (K) dim fixed through reshapes — Mosaic supports
    # sublane splits/merges but not lane->sublane casts like (Bt,Tc)->(N,1)
    proj3 = proj.reshape(bt, tc, proj.shape[-1])
    u3 = ds[:, :, None] * (1.0 - proj3 * proj3) * w2_ref[0, :]
    u16 = u3.reshape(bt * tc, u3.shape[-1]).astype(mm_dtype)  # (Bt*Tc, K)
    db1_acc[:] += jnp.sum(u3, axis=(0, 1))[None]
    dw2_acc[:] += jnp.sum(ds[:, :, None] * proj3, axis=(0, 1))[None]

    dys = []
    for p in range(n_parts):
        dy = (w[:, :, None] * gs[p][:, None, :]
              + jnp.dot(u16, w1t_refs[p][:],
                        preferred_element_type=jnp.float32).reshape(
                            bt, tc, widths[p]))
        dw1_accs[p][:] += jax.lax.dot_general(
            ys[p].reshape(bt * tc, widths[p]).astype(mm_dtype), u16,
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dys.append(dy)

    if use_ln:
        dxh = [dys[p] * gam[p] for p in range(n_parts)]
        m1 = sum(jnp.sum(d, axis=-1, keepdims=True) for d in dxh) / d_total
        m2 = sum(jnp.sum(d * xh, axis=-1, keepdims=True)
                 for d, xh in zip(dxh, xhat)) / d_total
        for p in range(n_parts):
            dh_outs[p][:] = rsig * (dxh[p] - m1 - xhat[p] * m2)
            dgam_acc[0:1, offs[p] : offs[p + 1]] += jnp.sum(
                dys[p] * xhat[p], axis=(0, 1))[None]
            dbet_acc[0:1, offs[p] : offs[p + 1]] += jnp.sum(
                dys[p], axis=(0, 1))[None]
    else:
        for p in range(n_parts):
            dh_outs[p][:] = dys[p]


def _pool_head_fwd_call(xs, gamma, beta, w1, b1, w2, use_ln, bf16,
                        batch_tile, t_chunk, interpret):
    bsz, t, _ = xs[0].shape
    widths = [p.shape[-1] for p in xs]
    d_total = sum(widths)
    k = w1.shape[1]
    w1_parts, off = [], 0
    for wd in widths:
        w1_parts.append(w1[off : off + wd])
        off += wd
    n_p = len(xs)
    mm = jnp.bfloat16 if bf16 else jnp.float32

    blk = lambda w: pl.BlockSpec((batch_tile, t_chunk, w),
                                 lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    row = lambda w: pl.BlockSpec((batch_tile, w), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)

    kernel = functools.partial(_pool_head_fwd_kernel, t_chunk=t_chunk,
                               n_parts=n_p, use_ln=use_ln, eps=1e-5,
                               d_total=d_total, bf16=bf16)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz // batch_tile, t // t_chunk),
        in_specs=[blk(w) for w in widths]
        + ([const(1, d_total)] * 2 if use_ln else [])
        + [const(w, k) for w in widths]
        + [const(1, k), const(1, k)],
        out_specs=tuple([row(t)] + [row(w) for w in widths]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((bsz, t), jnp.float32)]
            + [jax.ShapeDtypeStruct((bsz, w), jnp.float32) for w in widths]),
        scratch_shapes=[
            pltpu.VMEM((batch_tile, 1), jnp.float32),   # running max
            pltpu.VMEM((batch_tile, 1), jnp.float32),   # running denom
        ] + [pltpu.VMEM((batch_tile, w), jnp.float32) for w in widths]
        + [pltpu.VMEM((t // t_chunk, batch_tile, t_chunk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[p.astype(jnp.float32) for p in xs],
      *([gamma.reshape(1, -1).astype(jnp.float32),
         beta.reshape(1, -1).astype(jnp.float32)] if use_ln else []),
      *[wp.astype(mm) for wp in w1_parts],
      b1.reshape(1, -1).astype(jnp.float32),
      w2.reshape(1, -1).astype(jnp.float32))
    scores, ctx_parts = outs[0], tuple(outs[1:])
    return scores, ctx_parts


def _pool_head_bwd_call(xs, weights, g_scores, g_parts, gctx, gamma, beta,
                        w1, b1, w2, use_ln, bf16, batch_tile, t_chunk,
                        interpret):
    bsz, t, _ = xs[0].shape
    widths = [p.shape[-1] for p in xs]
    d_total = sum(widths)
    k = w1.shape[1]
    w1_parts, off = [], 0
    for wd in widths:
        w1_parts.append(w1[off : off + wd])
        off += wd
    n_p = len(xs)
    mm = jnp.bfloat16 if bf16 else jnp.float32

    blk = lambda w: pl.BlockSpec((batch_tile, t_chunk, w),
                                 lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM)
    # (B, T) inputs go chunk-major (n_chunks, B, Tc): block (1, Bt, Tc) has
    # its last dim equal to the array's (Mosaic lane rule); the reshape/
    # transpose outside is over a tiny (B, T) tensor
    tblk = pl.BlockSpec((1, batch_tile, t_chunk), lambda i, j: (j, i, 0),
                        memory_space=pltpu.VMEM)
    const = lambda a, b_: pl.BlockSpec((a, b_), lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM)
    row = lambda w: pl.BlockSpec((batch_tile, w), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)

    def chunk_major(a):
        return a.reshape(bsz, t // t_chunk, t_chunk).transpose(1, 0, 2)

    kernel = functools.partial(_pool_head_bwd_kernel, t_chunk=t_chunk,
                               n_parts=n_p, use_ln=use_ln, eps=1e-5,
                               d_total=d_total, bf16=bf16)
    outs = pl.pallas_call(
        kernel,
        grid=(bsz // batch_tile, t // t_chunk),
        in_specs=[blk(w) for w in widths]
        + [tblk, tblk]
        + [row(w) for w in widths]
        + [row(1)]
        + ([const(1, d_total)] * 2 if use_ln else [])
        + [const(w, k) for w in widths]
        + [const(k, w) for w in widths]
        + [const(1, k), const(1, k)],
        out_specs=tuple([blk(w) for w in widths]
                        + [const(w, k) for w in widths]
                        + [const(1, k), const(1, k)]
                        + ([const(1, d_total)] * 2 if use_ln else [])),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((bsz, t, w), jnp.float32) for w in widths]
            + [jax.ShapeDtypeStruct((w, k), jnp.float32) for w in widths]
            + [jax.ShapeDtypeStruct((1, k), jnp.float32)] * 2
            + ([jax.ShapeDtypeStruct((1, d_total), jnp.float32)] * 2
               if use_ln else [])),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*[p.astype(jnp.float32) for p in xs],
      chunk_major(weights.astype(jnp.float32)),
      chunk_major(g_scores.astype(jnp.float32)),
      *[g.astype(jnp.float32) for g in g_parts],
      gctx.astype(jnp.float32),
      *([gamma.reshape(1, -1).astype(jnp.float32),
         beta.reshape(1, -1).astype(jnp.float32)] if use_ln else []),
      *[wp.astype(mm) for wp in w1_parts],
      *[wp.astype(mm).T for wp in w1_parts],
      b1.reshape(1, -1).astype(jnp.float32),
      w2.reshape(1, -1).astype(jnp.float32))
    dh = tuple(outs[:n_p])
    dw1 = jnp.concatenate(outs[n_p : 2 * n_p], axis=0)
    db1, dw2 = outs[2 * n_p][0], outs[2 * n_p + 1][0]
    if use_ln:
        dgam, dbet = outs[2 * n_p + 2][0], outs[2 * n_p + 3][0]
    else:
        dgam = dbet = None
    return dh, dw1, db1, dw2, dgam, dbet


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pool_head_core(ln_params, attn_params, xs, use_ln, bf16):
    out, _ = _pool_head_fwd(ln_params, attn_params, xs, use_ln, bf16)
    return out


def _pool_head_shapes(xs):
    from eegflow.nn.pallas_lstm import _auto_interpret, _pick_tile

    b_sz, t, _ = xs[0].shape
    bt = _pick_tile(b_sz, 128) if b_sz < 128 else 128
    pad_b = (-b_sz) % bt
    tc = _pick_tile(t, 8)
    return bt, pad_b, tc, _auto_interpret(None)


def _pool_head_fwd(ln_params, attn_params, xs, use_ln, bf16):
    bt, pad_b, tc, interp = _pool_head_shapes(xs)
    b_sz = xs[0].shape[0]
    xs_pad = tuple(jnp.pad(p, ((0, pad_b), (0, 0), (0, 0))) if pad_b else p
                   for p in xs)
    gamma = ln_params["scale"] if use_ln else None
    beta = ln_params["bias"] if use_ln else None
    scores, ctx_parts = _pool_head_fwd_call(
        xs_pad, gamma, beta, attn_params["proj"]["w"],
        attn_params["proj"]["b"], attn_params["score"]["w"][:, 0],
        use_ln, bf16, bt, tc, interp)
    out = (tuple(c[:b_sz] for c in ctx_parts), scores[:b_sz])
    return out, (ln_params, attn_params, xs, xs_pad, scores, ctx_parts)


def _pool_head_vjp_fwd(ln_params, attn_params, xs, use_ln, bf16):
    return _pool_head_fwd(ln_params, attn_params, xs, use_ln, bf16)


def _pool_head_vjp_bwd(use_ln, bf16, res, g):
    ln_params, attn_params, xs, xs_pad, scores_pad, ctx_parts = res
    g_ctx_parts, g_scores = g
    bt, pad_b, tc, interp = _pool_head_shapes(xs)
    b_sz = xs[0].shape[0]

    weights = jax.nn.softmax(scores_pad, axis=-1)
    g_parts_pad = tuple(jnp.pad(p, ((0, pad_b), (0, 0))) if pad_b else p
                        for p in g_ctx_parts)
    gs_pad = (jnp.pad(g_scores, ((0, pad_b), (0, 0))) if pad_b
              else g_scores)
    gctx = sum(jnp.sum(gp * cp, axis=-1, keepdims=True)
               for gp, cp in zip(g_parts_pad, ctx_parts))
    gamma = ln_params["scale"] if use_ln else None
    beta = ln_params["bias"] if use_ln else None
    dh, dw1, db1, dw2, dgam, dbet = _pool_head_bwd_call(
        xs_pad, weights, gs_pad, g_parts_pad, gctx, gamma, beta,
        attn_params["proj"]["w"], attn_params["proj"]["b"],
        attn_params["score"]["w"][:, 0], use_ln, bf16, bt, tc, interp)
    d_ln = ({"scale": dgam, "bias": dbet} if use_ln
            else jax.tree.map(jnp.zeros_like, ln_params))
    d_attn = {
        "proj": {"w": dw1, "b": db1},
        # score bias shifts all logits uniformly: zero grad through softmax
        "score": {"w": dw2[:, None],
                  "b": jnp.zeros_like(attn_params["score"]["b"])},
    }
    dxs = tuple(d[:b_sz] for d in dh)
    return d_ln, d_attn, dxs


_pool_head_core.defvjp(_pool_head_vjp_fwd, _pool_head_vjp_bwd)


def pool_head_fused(ln_params, attn_params, xs, use_ln: bool = True,
                    bf16: bool = False):
    """Fused LayerNorm + additive-attention pooling over feature parts.

    ``xs``: tuple of (B, T, D_p) parts (concat = the BiLSTM output).
    Returns ``(ctx_parts, raw_scores)`` — concat the parts for the (B, D)
    context; softmax(raw_scores + score_bias) gives the attention weights.
    Training-safe (custom VJP: one streaming backward kernel produces dh
    parts and all LN/attention parameter grads).
    Replaces ref 04_lstm_model.py:112-128 + 190-193 on the AMP train path.
    """
    if isinstance(xs, jnp.ndarray):
        xs = (xs,)
    return _pool_head_core(ln_params, attn_params, tuple(xs), use_ln, bf16)


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
