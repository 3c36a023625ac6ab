"""Subprocess worker: validate kernel experiment-flag modes vs the scan oracle.

The EEGFLOW_* kernel flags (docs/DESIGN.md §5) are module globals initialized
from the environment, and the fused kernels are wrapped in module-level
``jax.jit``s — so a flag flip in-process needs ``refresh_flags()`` PLUS
``jax.clear_caches()`` (a stale jit cache would silently reuse traces from
the previous flag set). This worker flips flags exactly the way
tools/profile_multi.py does on the TPU — same refresh + cache-clear sequence
— and checks the bidirectional fused layer's gradients (params + input
parts) against the ``lax.scan`` reference on CPU interpret mode, so any
stale-cache bug in the in-process A/B mechanism fails HERE as a gradient
mismatch before it can corrupt a device measurement.

Run by tests/test_kernel_flags.py in ONE subprocess (jax imported once).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("EEGFLOW_FUSED_BT", "32")
os.environ.setdefault("EEGFLOW_DUALDIR_BT", "32")
# t_chunk 2 quarters the unrolled-kernel trace cost (the dominant cost here)
# while giving MORE chunk-boundary transitions (T=8 -> 4 chunks)
os.environ.setdefault("EEGFLOW_FUSED_TC", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from eegflow.nn.lstm import lstm_layer_apply, lstm_layer_init  # noqa: E402

# NOTE: EEGFLOW_ADJOINT_RES defaults to 1 since round 5 (measured winner).
# Sets validating the raw-gate-residual schedule set it to 0 EXPLICITLY;
# an empty set validates the shipped defaults.
FLAG_SETS = [
    # the shipped defaults (adjoint residuals since round 5)
    {},
    # the pre-round-5 default: raw gate residuals
    {"EEGFLOW_ADJOINT_RES": "0"},
    # the fused dual-DIRECTION backward (round 4), raw-gate composition
    {"EEGFLOW_BWD_DUALDIR": "1", "EEGFLOW_ADJOINT_RES": "0"},
    # ... composed with adjoint residuals, bf16 residuals, 2-chain ILP
    {"EEGFLOW_BWD_DUALDIR": "1", "EEGFLOW_ADJOINT_RES": "1",
     "EEGFLOW_RES_BF16": "1", "EEGFLOW_BWD_CHAINS": "2"},
    # ... and without the chain split (a distinct residual-read schedule)
    {"EEGFLOW_BWD_DUALDIR": "1", "EEGFLOW_ADJOINT_RES": "1",
     "EEGFLOW_RES_BF16": "1"},
    # the round-3 modes together (two-launch path)
    {"EEGFLOW_ADJOINT_RES": "1", "EEGFLOW_RES_BF16": "1",
     "EEGFLOW_FWD_DUAL": "1", "EEGFLOW_BWD_DUAL": "1"},
    # 4-way chain ILP (engages only when batch_tile % 32 == 0), raw gates
    {"EEGFLOW_FWD_CHAINS": "4", "EEGFLOW_BWD_CHAINS": "4",
     "EEGFLOW_ADJOINT_RES": "0"},
    # every A/B-queued mode alone — singles are their own codegen paths,
    # not subsets of the combos above (raw-gate composition pinned)
    {"EEGFLOW_RES_BF16": "1", "EEGFLOW_ADJOINT_RES": "0"},
    {"EEGFLOW_ADJOINT_RES": "1", "EEGFLOW_RES_BF16": "1"},
    {"EEGFLOW_FWD_DUAL": "1", "EEGFLOW_ADJOINT_RES": "0"},
    {"EEGFLOW_BWD_DUAL": "1", "EEGFLOW_ADJOINT_RES": "0"},
    {"EEGFLOW_ADJOINT_RES": "1", "EEGFLOW_BWD_DUAL": "1"},
    # asymmetric chain splits: fwd default with 4-chain bwd and vice versa
    # (residual layout must be chain-count independent)
    {"EEGFLOW_BWD_CHAINS": "4", "EEGFLOW_ADJOINT_RES": "0"},
    {"EEGFLOW_FWD_CHAINS": "4", "EEGFLOW_ADJOINT_RES": "0"},
]

ALL_FLAGS = sorted({k for fs in FLAG_SETS for k in fs})

B, T, H = 32, 8, 16
rng = np.random.default_rng(0)
xa = jnp.asarray(rng.standard_normal((B, T, 8)), jnp.float32)
xb = jnp.asarray(rng.standard_normal((B, T, 8)), jnp.float32)
pf = lstm_layer_init(jax.random.key(2), 16, H)
pb = lstm_layer_init(jax.random.key(3), 16, H)


def loss_scan(pf_, pb_, parts_):
    xx = jnp.concatenate(parts_, -1)
    hf = lstm_layer_apply(pf_, xx)
    hr = lstm_layer_apply(pb_, xx, reverse=True)
    return jnp.sum(hf**2) + jnp.sum(hr * hf) + jnp.sum(hr**2)


g_ref = jax.grad(loss_scan, argnums=(0, 1, 2))(pf, pb, (xa, xb))


def assert_close(tag, got, want):
    for a, b, name in [(got[0], want[0], "pf"), (got[1], want[1], "pb")]:
        for k in a:
            x, y = np.asarray(a[k]), np.asarray(b[k])
            err = np.abs(x - y).max() / max(1.0, np.abs(y).max())
            assert err < 2e-2, (tag, name, k, float(err))
    for i, (x, y) in enumerate(zip(got[2], want[2])):
        x, y = np.asarray(x), np.asarray(y)
        err = np.abs(x - y).max() / max(1.0, np.abs(y).max())
        assert err < 2e-2, (tag, "dx", i, float(err))


import eegflow.nn.pallas_lstm as pk  # noqa: E402

for flag_set in FLAG_SETS:
    for k in ALL_FLAGS:
        os.environ.pop(k, None)
    os.environ.update(flag_set)
    pk.refresh_flags()
    jax.clear_caches()
    tag = ("+".join(f"{k.removeprefix('EEGFLOW_')}={v}"
                    for k, v in sorted(flag_set.items())) or "defaults")

    def loss_fused(pf_, pb_, parts_, _pk=pk):
        hf, hr = _pk.bilstm_layer_fused_parts(pf_, pb_, parts_, bf16=True)
        return jnp.sum(hf**2) + jnp.sum(hr * hf) + jnp.sum(hr**2)

    g = jax.grad(loss_fused, argnums=(0, 1, 2))(pf, pb, (xa, xb))
    assert_close(tag, g, g_ref)
    print(tag, "OK", flush=True)

print("ALL_FLAG_SETS_OK")
