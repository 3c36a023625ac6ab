"""Validate the fused input-projection block on a real TPU.

The CPU suite pins eegflow.nn.pallas_input against the XLA oracle in
interpret mode (tests/test_pallas_input.py); this script repeats the value
and gradient comparison COMPILED on hardware — in particular it proves
jax.lax.erf lowers in Mosaic and that the recomputing backward's LN
statistics stay consistent under the real bf16 MXU path.

Usage: python tools/check_fused_input.py   (requires a TPU backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eegflow.nn.layers import (dense_apply, dense_init, gelu,
                                   layer_norm_apply, layer_norm_init)
    from eegflow.nn.pallas_input import input_block_fused

    assert jax.default_backend() == "tpu", "needs a real TPU"

    c, h = 61, 256
    proj = dense_init(jax.random.key(1), c, h)
    norm = layer_norm_init(h)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((256, 32, c)), jnp.float32)

    def oracle(proj, norm, xv):
        return gelu(layer_norm_apply(norm, dense_apply(
            proj, xv, jnp.bfloat16)))

    y_f = np.asarray(input_block_fused(proj, norm, x, bf16=True))
    y_r = np.asarray(oracle(proj, norm, x))
    diff = np.max(np.abs(y_f - y_r)) / (np.max(np.abs(y_r)) + 1e-8)
    print(f"forward rel diff {diff:.2e}")
    assert diff < 2e-2, diff

    def loss_f(proj, norm, xv):
        return jnp.sum(jnp.tanh(input_block_fused(proj, norm, xv,
                                                  bf16=True)))

    def loss_r(proj, norm, xv):
        return jnp.sum(jnp.tanh(oracle(proj, norm, xv)))

    g_f = jax.grad(loss_f, argnums=(0, 1, 2))(proj, norm, x)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(proj, norm, x)
    worst = 0.0
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        worst = max(worst, float(np.max(np.abs(a - b))
                                 / (np.max(np.abs(b)) + 1e-8)))
    print(f"grad worst rel diff {worst:.2e}")
    assert worst < 3e-2, worst

    # folded dropout, PRNG mode: the block writes the inverted-dropout copy
    keep = 0.8
    seed = jnp.asarray([97, 53], jnp.int32)
    yd = np.asarray(input_block_fused(proj, norm, x, bf16=True,
                                      out_keep=keep, out_seed=seed))
    kept = yd != 0.0
    frac = 1.0 - kept.mean()
    rel = np.max(np.abs(yd[kept] - y_f[kept] / keep)) / (
        np.max(np.abs(y_f)) + 1e-8)
    print(f"folded-PRNG dropout: drop frac {frac:.3f} "
          f"(expect ~{1 - keep:.3f}), kept-value rel err {rel:.2e}")
    assert abs(frac - (1 - keep)) < 0.05, frac
    assert rel < 1e-5, rel
    print("fused input block OK on TPU")


if __name__ == "__main__":
    main()
