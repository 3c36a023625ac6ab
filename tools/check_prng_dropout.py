"""Validate the in-kernel hardware-PRNG dropout path on a real TPU.

The PRNG path (lstm_layer_fused_parts with dropout_seed) cannot run in
interpret mode (pltpu.prng_* has no CPU lowering), so the CPU test suite
exercises the structurally-identical uint8-mask path instead. This script
closes the gap on hardware:

1. drop-rate sanity — the realized drop fraction of the input-gate
   pre-activations matches 1-keep;
2. forward/backward mask consistency — the custom-VJP gradients match
   central finite differences through the full kernel pair (this fails
   loudly if the backward regenerates different bits than the forward);
3. visit-order invariance — the reverse-direction layer (whose grid walks
   chunks newest-first) sees the same masks as the forward direction.

Usage: python tools/check_prng_dropout.py   (requires a TPU backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eegflow.nn.lstm import lstm_layer_init
    from eegflow.nn.pallas_lstm import lstm_layer_fused_parts

    assert jax.default_backend() == "tpu", "needs a real TPU"

    d_in, hid, keep = 8, 128, 0.7
    params = lstm_layer_init(jax.random.key(5), d_in, hid)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 16, d_in)), jnp.float32)
    seed = jnp.asarray([1234, 5678], jnp.int32)

    def run(xv, w, rev):
        p = dict(params, w_ih=w)
        return lstm_layer_fused_parts(
            p["w_ih"], p["w_hh"], p["b"], (xv,), rev, True, None, keep, seed)

    # 1. drop-rate sanity: with W_hh=0, b=0 and W_ih=identity-ish columns the
    # kernel's input-gate path is linear in the masked x, so count zeros of
    # d(out)/dx columns instead — simpler: measure via the x-gradient's zeros
    # (dx is masked by the same bits).
    g = jax.grad(lambda xv: jnp.sum(run(xv, params["w_ih"], False)))(x)
    frac = float((np.asarray(g) == 0.0).mean())
    print(f"x-grad zero fraction {frac:.3f} (expect ~{1-keep:.3f})")
    assert abs(frac - (1 - keep)) < 0.05, frac

    # 2. mask consistency + correctness vs the CPU-tested oracle path:
    # recover the hardware mask from the x-gradient's zero pattern (dx is
    # masked in the BACKWARD kernel), then replay it through the explicit
    # uint8-mask path (the interpret-mode oracle, which also compiles on
    # TPU). If the forward had used different bits than the backward, the
    # replayed forward would disagree.
    mask = jnp.asarray(np.asarray(g) != 0.0, jnp.uint8)

    def run_mask(xv, w, rev):
        p = dict(params, w_ih=w)
        return lstm_layer_fused_parts(
            p["w_ih"], p["w_hh"], p["b"], (xv,), rev, True, (mask,), keep)

    h_prng = np.asarray(run(x, params["w_ih"], False))
    h_mask = np.asarray(run_mask(x, params["w_ih"], False))
    diff = np.max(np.abs(h_prng - h_mask))
    print(f"prng-vs-replayed-mask forward max diff {diff:.2e}")
    assert diff < 1e-5, diff

    gw_p, gx_p = jax.grad(
        lambda w, xv: jnp.sum(jnp.tanh(run(xv, w, False))),
        argnums=(0, 1))(params["w_ih"], x)
    gw_m, gx_m = jax.grad(
        lambda w, xv: jnp.sum(jnp.tanh(run_mask(xv, w, False))),
        argnums=(0, 1))(params["w_ih"], x)
    for name, a, b in (("w_ih", gw_p, gw_m), ("x", gx_p, gx_m)):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-8)
        print(f"  grad {name}: prng vs mask-replay rel {rel:.2e}")
        assert rel < 1e-4, (name, rel)

    # 3. visit-order invariance: same seed, fwd vs rev direction layers see
    # identical masks — compare x-grad zero PATTERNS (mask footprint).
    g_rev = jax.grad(lambda xv: jnp.sum(run(xv, params["w_ih"], True)))(x)
    same = ((np.asarray(g) == 0) == (np.asarray(g_rev) == 0)).mean()
    print(f"fwd/rev mask footprint agreement {same:.4f}")
    assert same > 0.999, same

    print("PRNG dropout path OK")


if __name__ == "__main__":
    main()
