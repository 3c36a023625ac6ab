"""Bound the data-parallel scaling overhead and predict 8-chip throughput.

VERDICT r4 #7: the DP-scaling claim needs a quantitative footing — the
per-chip curve is measured (BENCH extras.scaling: B=512 latency-bound,
512→1024 only +1.5%), but nothing bounded the cost of going multi-chip.
This tool produces the two missing inputs and writes the combined model to
docs/dp_model.json, which bench.py folds into the official record's extras.

1. SOFTWARE overhead (measured, CPU mesh): the same GLOBAL batch is trained
   once as a single-device jit and once sharded over an 8-virtual-device CPU
   mesh (implicit NamedSharding AND explicit shard_map+pmean). Total compute
   is identical on this 1-core host, so the wall-time ratio isolates what
   partitioning adds: per-shard executables, sharding machinery, and the
   gradient all-reduce itself (shared-memory "ICI"). Real ICI transfer cost
   is NOT in this number — it is bounded analytically below.

2. ICI cost (analytic bound): one gradient all-reduce per step of
   P params x 4 bytes. On a v5e ring, bidirectional ring all-reduce moves
   2·(N-1)/N · bytes per chip at ~45 GB/s per direction per link
   (v5e ICI: 1,600 Gbps aggregate over 4 links; the public scaling-book
   recipe), and XLA overlaps it with the backward pass — so the bound is
   conservative twice over.

Prediction: windows/s(N chips, global N·512) =
    N x per-chip(B=512, device-trace) / (1 + ovh_software + ovh_ici).

Usage: python tools/dp_overhead.py [--batch-global 64] [--steps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# must precede the jax import: virtual devices are fixed at backend init
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np


def _median_step_s(fn, steps: int) -> float:
    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-global", type=int, default=64)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "dp_model.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from eegflow.core.config import ModelConfig, TrainConfig
    from eegflow.nn.model import classifier_init
    from eegflow.train.mesh import (make_data_mesh, make_spmd_train_step,
                                    replicate_to_mesh, shard_batch)
    from eegflow.train.steps import TrainState, make_optimizer, make_train_step

    assert len(jax.devices()) >= 8, jax.devices()
    bsz = args.batch_global
    model_cfg = ModelConfig(input_size=61)
    # scan impl: the CPU mesh path (lstm_impl=auto resolves to scan under
    # implicit sharding); identical compute in both arms is what matters
    train_cfg = TrainConfig(batch_size=bsz, bf16=True, lstm_impl="scan")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((bsz, 256, 61)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, bsz))
    params = classifier_init(jax.random.key(0), model_cfg)
    n_params = int(sum(np.asarray(v).size
                       for v in jax.tree_util.tree_leaves(params)))
    tx = make_optimizer(train_cfg, updates_per_epoch=100)

    results = {}

    # arm 1: single device, full global batch. Deep-copy the params into the
    # donated state: device_put to the array's current device is a no-op, so
    # donating the state would otherwise delete the shared `params` leaves
    # arm 2 still needs.
    dev0 = jax.devices()[0]
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    state = [TrainState(jax.device_put(copy(params), dev0),
                        tx.init(params), jnp.asarray(0))]
    step = make_train_step(model_cfg, train_cfg, tx, donate=True)
    x1, y1 = jax.device_put(x, dev0), jax.device_put(y, dev0)
    i = [0]

    def run_single():
        i[0] += 1
        s, m = step(state[0], x1, y1, jax.random.key(i[0]))
        state[0] = s
        jax.block_until_ready(m["loss"])

    run_single()
    results["single_ms"] = round(_median_step_s(run_single, args.steps) * 1e3, 1)
    print(f"single-device (B={bsz}): {results['single_ms']} ms/step",
          flush=True)

    # arm 2: 8-device mesh, SAME global batch (8 shards of bsz/8)
    mesh = make_data_mesh(8)
    for label, make in (("implicit", None), ("explicit", make_spmd_train_step)):
        p_r = replicate_to_mesh(copy(params), mesh)
        st = [TrainState(p_r, replicate_to_mesh(tx.init(params), mesh),
                         jnp.asarray(0))]
        xs, ys = shard_batch((x, y), mesh)
        if make is None:
            stp = make_train_step(model_cfg, train_cfg, tx, donate=True,
                                  mesh=mesh)
        else:
            stp = make(model_cfg, train_cfg, tx, mesh)
        j = [0]

        def run_mesh(stp=stp, st=st, xs=xs, ys=ys, j=j):
            j[0] += 1
            s, m = stp(st[0], xs, ys, jax.random.key(j[0]))
            st[0] = s
            jax.block_until_ready(m["loss"])

        run_mesh()
        ms = round(_median_step_s(run_mesh, args.steps) * 1e3, 1)
        results[f"mesh8_{label}_ms"] = ms
        results[f"ovh_{label}_pct"] = round(
            (ms / results["single_ms"] - 1.0) * 100.0, 1)
        print(f"8-device mesh [{label}] (global B={bsz}): {ms} ms/step "
              f"(software overhead {results[f'ovh_{label}_pct']}%)",
              flush=True)

    # analytic ICI bound (v5e, bidirectional ring all-reduce, ~45 GB/s/dir)
    grad_bytes = n_params * 4
    ici_bw = 45e9
    n = 8
    allreduce_s = 2 * (n - 1) / n * grad_bytes / ici_bw
    # per-chip step time from the committed device-trace record
    per_chip = None
    try:
        rec = json.loads((Path(REPO) / "BENCH_LOCAL.json").read_text())
        per_chip = float(rec["value"])
        step_ms = 512.0 / per_chip * 1e3
    except Exception:
        step_ms = 40.0
    ovh_ici_pct = allreduce_s / (step_ms / 1e3) * 100.0

    ovh_soft = min(results["ovh_implicit_pct"], results["ovh_explicit_pct"])
    ovh_soft = max(ovh_soft, 0.0)  # timing noise can go negative on 1 core
    eff = 1.0 / (1.0 + (ovh_soft + ovh_ici_pct) / 100.0)
    results.update({
        "n_params": n_params,
        "grad_allreduce_mb": round(grad_bytes / 1e6, 1),
        "ici_allreduce_ms_bound": round(allreduce_s * 1e3, 3),
        "ovh_ici_pct_bound": round(ovh_ici_pct, 2),
        "per_chip_windows_s_b512": per_chip,
        "predicted_8chip_windows_s_global4096": (
            round(8 * per_chip * eff, 1) if per_chip else None),
        "predicted_scaling_efficiency_pct": round(eff * 100.0, 1),
        "method": "equal-global-batch CPU-mesh ratio (software) + "
                  "ring-all-reduce bytes/bandwidth (ICI, unoverlapped bound)",
        "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "commit": subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True).stdout.strip() or None,
    })
    Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps(results, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
