"""One-process kernel A/B sweep: measure MANY flag configs per device init.

Round 4 showed one-job-per-flag queues cannot drain through the axon tunnel:
each job paid ~60-120 s of import + device init + data setup and a full
compile, totalling ~9 min for THREE traced steps (498-594 s wall in
/tmp/tpuq_r4/summary.json), so 17 of 20 A/Bs never ran before the tunnel
wedged. This tool runs the whole config list in ONE process: jax imports
once, the device initializes once, the input batch uploads once, and each
config costs only its own compile + trace. Flag flips use
``eegflow.nn.pallas_lstm.refresh_flags()`` + ``jax.clear_caches()`` — the
exact mechanism gradient-verified against the scan oracle by
tests/flagcheck_worker.py, so a stale-trace bug would fail CI before it
could corrupt a measurement here.

Results append to --out after EVERY config (a killed process keeps all
finished measurements) and configs already present in --out are skipped, so
a tpu_queue retry resumes instead of re-measuring.

Usage: python tools/profile_multi.py --configs tools/ab_configs_r5.json \
           [--out /tmp/ab_r5.json] [--steps 3] [--batch 512] [--deadline-s N]

configs json: [{"name": ..., "env": {...}, "impl": "pallas"|"scan"|"transformer",
                "batch": N?}, ...]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: every env flag any config may set — popped between configs so a config's
#: env is exactly (defaults + its own entries), not leakage from the previous
KNOWN_FLAGS = [
    "EEGFLOW_ADJOINT_RES", "EEGFLOW_RES_BF16", "EEGFLOW_BWD_TC",
    "EEGFLOW_BWD_V2", "EEGFLOW_BWD_PROBE_DUP", "EEGFLOW_FWD_DUAL",
    "EEGFLOW_BWD_DUAL", "EEGFLOW_FWD_CHAINS", "EEGFLOW_BWD_CHAINS",
    "EEGFLOW_BWD_DUALDIR", "EEGFLOW_DUALDIR_BT", "EEGFLOW_FUSED_BT",
    "EEGFLOW_FUSED_TC", "EEGFLOW_MASK_DROPOUT", "EEGFLOW_KERNEL_DROPOUT",
    "EEGFLOW_RBG_DROPOUT", "EEGFLOW_PRNG", "EEGFLOW_DROP8",
    "EEGFLOW_FWD_DROPW", "EEGFLOW_INPUT_PRNG", "EEGFLOW_FUSED_INPUT",
]


def measure_config(cfg_entry, x, y, steps):
    """Build + compile + device-trace the train step for one config.

    Returns a result dict (ms_step/windows_s/mfu/top_ops) or an error dict.
    Assumes the caller already applied the config's env + refresh + cache
    clear.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from eegflow.core.config import ModelConfig, TrainConfig, TransformerConfig
    from eegflow.core.profiling import TPU_V5E_BF16_PEAK_FLOPS, device_time
    from eegflow.nn.model import classifier_init, model_flops_per_window
    from eegflow.train.steps import TrainState, make_optimizer, make_train_step

    impl = cfg_entry.get("impl", "pallas")
    batch = int(cfg_entry.get("batch", x.shape[0]))
    if batch != x.shape[0]:
        # per-config batch override (scaling-curve points): tile/slice the
        # shared input so the sweep still uploads data once
        reps = -(-batch // x.shape[0])
        x = jnp.tile(x, (reps, 1, 1))[:batch]
        y = jnp.tile(y, reps)[:batch]
    model_cfg = (TransformerConfig(input_size=x.shape[2])
                 if impl == "transformer" else ModelConfig(input_size=x.shape[2]))
    train_cfg = TrainConfig(
        batch_size=batch, accumulation_steps=int(cfg_entry.get("accum", 4)),
        bf16=True, lstm_impl="scan" if impl == "transformer" else impl)
    train_cfg = dataclasses.replace(train_cfg)
    flops_step = 3 * model_flops_per_window(model_cfg) * batch

    params = classifier_init(jax.random.key(0), model_cfg)
    tx = make_optimizer(train_cfg, updates_per_epoch=100)
    state = [TrainState(params, tx.init(params), jnp.asarray(0))]
    step = make_train_step(model_cfg, train_cfg, tx, donate=True)
    i = [0]

    def run():
        i[0] += 1
        s, m = step(state[0], x, y, jax.random.key(i[0]))
        state[0] = s
        jax.block_until_ready(m["loss"])

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    print(f"  compiled+first step in {compile_s:.1f}s", flush=True)

    dt = device_time(run, iters=steps, warmup=2)
    if dt is None or dt.total_self_time_s <= 0 or not dt.iters_done:
        return {"error": "no device time in trace", "compile_s": round(compile_s, 1)}
    n = dt.iters_done
    step_s = dt.total_self_time_s / n
    on_tpu = jax.default_backend() == "tpu"
    mfu = (flops_step / step_s / TPU_V5E_BF16_PEAK_FLOPS) if on_tpu else None
    rec = {
        "impl": impl,
        "batch": batch,
        "ms_step": round(step_s * 1e3, 2),
        "windows_s": round(batch / step_s, 1),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "compile_s": round(compile_s, 1),
        "iters": n,
        "top_ops": [[op[:64], round(t / n * 1e3, 3)]
                    for op, t in dt.top_ops(int(cfg_entry.get("top_n", 10)))],
    }
    # same line format as tools/profile_train.py so ab_table.py parses it
    print(f"[{impl}] device {rec['ms_step']:.2f} ms/step | "
          f"{rec['windows_s']:,.0f} windows/s | "
          f"MFU {mfu * 100:.1f}%" if mfu is not None else
          f"[{impl}] device {rec['ms_step']:.2f} ms/step | "
          f"{rec['windows_s']:,.0f} windows/s", flush=True)
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", required=True)
    ap.add_argument("--out", default="/tmp/ab_multi.json")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--deadline-s", type=float, default=None,
                    help="stop STARTING configs past this wall budget")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (CPU smoke runs: the "
                         "JAX_PLATFORMS env var is not honored once the "
                         "axon plugin registers — CLAUDE.md)")
    args = ap.parse_args()

    configs = json.loads(Path(args.configs).read_text())
    out_path = Path(args.out)
    results = (json.loads(out_path.read_text()) if out_path.exists() else {})
    t_end = (time.time() + args.deadline_s) if args.deadline_s else None

    # persistent compile cache: a retried/killed sweep recompiles nothing
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_tpu_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import numpy as np

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import eegflow.nn.layers as nn_layers
    import eegflow.nn.pallas_lstm as pk

    default_prng = jax.config.jax_default_prng_impl
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 256, 61)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, args.batch))
    jax.block_until_ready(x)
    print(f"device ready: {jax.devices()[0].platform} x{len(jax.devices())}",
          flush=True)

    for entry in configs:
        name = entry["name"]
        if name in results and "error" not in results[name]:
            print(f"[{name}] cached: {results[name].get('ms_step')} ms/step",
                  flush=True)
            continue
        if t_end and time.time() > t_end:
            print(f"[{name}] skipped: deadline reached", flush=True)
            break
        for k in KNOWN_FLAGS:
            os.environ.pop(k, None)
        os.environ.update({k: str(v) for k, v in entry.get("env", {}).items()})
        jax.config.update("jax_default_prng_impl",
                          os.environ.get("EEGFLOW_PRNG", default_prng))
        pk.refresh_flags()
        nn_layers.refresh_flags()
        jax.clear_caches()
        flags = " ".join(f"{k.replace('EEGFLOW_', '')}={v}"
                         for k, v in sorted(entry.get("env", {}).items())) \
            or "(defaults)"
        print(f"\n[{name}] {flags}", flush=True)
        t0 = time.time()
        try:
            rec = measure_config(entry, x, y, args.steps)
        except Exception as e:  # a bad flag combo must not kill the sweep
            rec = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"[{name}] FAILED: {rec['error']}", flush=True)
        rec["flags"] = flags
        rec["wall_s"] = round(time.time() - t0, 1)
        results[name] = rec
        tmp = out_path.with_suffix(".tmp")
        tmp.write_text(json.dumps(results, indent=1))
        os.replace(tmp, out_path)

    print(f"\n=== {sum(1 for r in results.values() if 'ms_step' in r)}"
          f"/{len(configs)} measured -> {out_path} ===", flush=True)
    for name, rec in sorted(results.items(),
                            key=lambda kv: kv[1].get("ms_step", 1e9)):
        if "ms_step" in rec:
            mfu = rec.get("mfu")
            print(f"{name:24s} {rec['ms_step']:8.2f} ms/step  "
                  f"{rec['windows_s']:10,.0f} w/s  "
                  + (f"MFU {mfu * 100:.1f}%" if mfu else ""), flush=True)
        else:
            print(f"{name:24s} ERROR: {rec.get('error')}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
