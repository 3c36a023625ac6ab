"""Validate the forward-kernel-writes-the-dropped-copy path on a real TPU.

EEGFLOW_FWD_DROPW mode 1 draws the inter-layer dropout mask from the
hardware PRNG inside the PRODUCING layer's forward kernel (pltpu.prng_* has
no CPU lowering, so the CPU suite exercises mode 2 — XLA-generated uint8
out-masks, pinned BIT-IDENTICAL to the select default by
tests/test_pallas_lstm.py::test_fwd_dropw_mode2_bit_identical_to_select).
This script closes the hardware gap for mode 1:

1. dropped-copy semantics — each direction's h_drop is elementwise either 0
   or h/keep against the undropped reference run, at the right drop rate;
2. direction independence — the two directions' output masks differ (the
   per-direction salt works);
3. gradient consistency through a consumer — a two-layer composite
   (producer writes the PRNG-dropped copy, consumer recovers the mask from
   the zeros via mask_from_x) matches the same composite replayed through
   the CPU-tested out_masks oracle path with the RECOVERED mask.

Usage: python tools/check_dropw.py   (requires a TPU backend)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eegflow.nn.lstm import lstm_layer_init
    from eegflow.nn.pallas_lstm import (bilstm_layer_fused_parts,
                                        lstm_layer_fused_parts)

    assert jax.default_backend() == "tpu", "needs a real TPU"

    d_in, hid, keep = 8, 128, 0.6
    pf = lstm_layer_init(jax.random.key(5), d_in, hid)
    pb = lstm_layer_init(jax.random.key(6), d_in, hid)
    p2 = lstm_layer_init(jax.random.key(7), 2 * hid, hid)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 16, d_in)), jnp.float32)
    seed = jnp.asarray([4321, 8765], jnp.int32)

    # 1. dropped-copy semantics per direction
    h_f, h_r = bilstm_layer_fused_parts(pf, pb, (x,), True)
    hd_f, hd_r = bilstm_layer_fused_parts(pf, pb, (x,), True,
                                          out_keep=keep, out_seed=seed)
    for name, h, hd in (("fwd", h_f, hd_f), ("rev", h_r, hd_r)):
        h, hd = np.asarray(h), np.asarray(hd)
        kept = hd != 0.0
        frac = 1.0 - kept.mean()
        rel = np.max(np.abs(hd[kept] - h[kept] / keep)) / (
            np.max(np.abs(h)) + 1e-8)
        print(f"[{name}] drop frac {frac:.3f} (expect ~{1 - keep:.3f}), "
              f"kept-value rel err {rel:.2e}")
        assert abs(frac - (1 - keep)) < 0.05, frac
        assert rel < 1e-5, rel

    # 2. direction independence of the output masks
    agree = ((np.asarray(hd_f) == 0) == (np.asarray(hd_r) == 0)).mean()
    print(f"fwd/rev output-mask agreement {agree:.3f} (independent ~= "
          f"{keep**2 + (1-keep)**2:.3f})")
    assert agree < 0.9, agree

    # 3. two-layer composite: PRNG dropped-copy producer -> mask_from_x
    # consumer, vs the same composite through the recovered-mask oracle
    masks = tuple(jnp.asarray(np.asarray(hd) != 0.0, jnp.uint8)
                  for hd in (hd_f, hd_r))

    def composite(pf_, pb_, p2_, xv, out_seed=None, out_masks=None):
        parts = bilstm_layer_fused_parts(pf_, pb_, (xv,), True,
                                         out_keep=keep, out_seed=out_seed,
                                         out_masks=out_masks)
        h2 = lstm_layer_fused_parts(p2_["w_ih"], p2_["w_hh"], p2_["b"],
                                    parts, False, True, None, keep, None,
                                    True)
        return jnp.sum(jnp.tanh(h2))

    v_p, g_p = jax.value_and_grad(composite, argnums=(0, 1, 2, 3))(
        pf, pb, p2, x, out_seed=seed)
    v_m, g_m = jax.value_and_grad(composite, argnums=(0, 1, 2, 3))(
        pf, pb, p2, x, out_masks=masks)
    print(f"composite value prng {float(v_p):.6f} vs mask-replay "
          f"{float(v_m):.6f}")
    assert abs(float(v_p) - float(v_m)) < 1e-4
    worst = 0.0
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_m)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        worst = max(worst, float(np.max(np.abs(a - b))
                                 / (np.max(np.abs(b)) + 1e-8)))
    print(f"composite grad worst rel diff {worst:.2e}")
    assert worst < 1e-4, worst

    # 4. shared-seed composition (EEGFLOW_INPUT_PRNG + FWD_DROPW on the
    # same layer): one SMEM seed drives BOTH the input masks and the
    # output-copy masks, salt-separated. Check that the realized input and
    # output masks are independent (their zero patterns don't correlate)
    # and both rates are right.
    h2_f, h2_r = bilstm_layer_fused_parts(pf, pb, (x,), True, None, keep,
                                          seed, False, out_keep=keep)
    gx = jax.grad(lambda xv: jnp.sum(bilstm_layer_fused_parts(
        pf, pb, (xv,), True, None, keep, seed, False, out_keep=keep)[0]))(x)
    in_frac = float((np.asarray(gx) == 0.0).mean())
    out_frac = float((np.asarray(h2_f) == 0.0).mean())
    print(f"shared-seed: input drop frac {in_frac:.3f}, output drop frac "
          f"{out_frac:.3f} (both expect ~{1 - keep:.3f})")
    assert abs(in_frac - (1 - keep)) < 0.05, in_frac
    assert abs(out_frac - (1 - keep)) < 0.05, out_frac
    # determinism: the output-mask stream is a pure function of
    # (seed, salt, block position) — arming the INPUT mask stream on the
    # same seed must not perturb it. hd_f came from a run with out_seed =
    # the SAME seed and no input dropout; its zero pattern must MATCH
    # exactly (this is what lets mask_from_x replay across flag modes).
    h2_kept = np.asarray(h2_f) != 0
    hd_kept = np.asarray(hd_f) != 0
    agree2 = (h2_kept == hd_kept).mean()
    print(f"shared-seed vs out-seed output-mask agreement {agree2:.3f} "
          f"(same seed + same salt -> expect 1.0)")
    assert agree2 == 1.0, agree2
    # and the seed actually drives the stream: a different seed must give
    # an (independent-looking) different pattern
    seed_b = jnp.asarray([1111, 2222], jnp.int32)
    hd_f2, _ = bilstm_layer_fused_parts(pf, pb, (x,), True,
                                        out_keep=keep, out_seed=seed_b)
    agree3 = ((np.asarray(hd_f2) != 0) == hd_kept).mean()
    print(f"different-seed output-mask agreement {agree3:.3f} "
          f"(independent ~= {keep**2 + (1-keep)**2:.3f})")
    assert agree3 < 0.9, agree3

    print("FWD_DROPW mode-1 (hardware PRNG dropped-copy) path OK")


if __name__ == "__main__":
    main()
