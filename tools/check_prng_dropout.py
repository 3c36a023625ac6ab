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

    d_in, hid, keep = 8, 8, 0.7
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

    # 2. finite-difference check through fwd+bwd (mask consistency)
    def loss(w, xv):
        return jnp.sum(jnp.tanh(run(xv, w, False)))

    gw, gx = jax.grad(loss, argnums=(0, 1))(params["w_ih"], x)
    eps = 1e-3
    rng2 = np.random.default_rng(7)
    for name, val, grad in (("w_ih", params["w_ih"], gw), ("x", x, gx)):
        for _ in range(3):
            d = jnp.asarray(rng2.standard_normal(val.shape), jnp.float32)
            d = d / jnp.linalg.norm(d)
            if name == "w_ih":
                f = lambda t: loss(val + t * d, x)
            else:
                f = lambda t: loss(params["w_ih"], val + t * d)
            num = (float(f(eps)) - float(f(-eps))) / (2 * eps)
            ana = float(jnp.vdot(grad, d))
            rel = abs(num - ana) / (abs(num) + 1e-6)
            print(f"  {name}: fd {num:+.5f} vs vjp {ana:+.5f} rel {rel:.2e}")
            assert rel < 2e-2, (name, num, ana)

    # 3. visit-order invariance: same seed, fwd vs rev direction layers see
    # identical masks — compare x-grad zero PATTERNS (mask footprint).
    g_rev = jax.grad(lambda xv: jnp.sum(run(xv, params["w_ih"], True)))(x)
    same = ((np.asarray(g) == 0) == (np.asarray(g_rev) == 0)).mean()
    print(f"fwd/rev mask footprint agreement {same:.4f}")
    assert same > 0.999, same

    print("PRNG dropout path OK")


if __name__ == "__main__":
    main()
