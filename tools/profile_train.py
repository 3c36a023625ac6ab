"""Profile the flagship train step per-impl on the current backend.

Usage: python tools/profile_train.py [scan|pallas ...] [--batch N] [--steps N]
Prints per-impl device ms/step, windows/s, MFU, and top ops.
"""
import argparse, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("impls", nargs="*", default=None)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()
    impls = args.impls or ["scan", "pallas"]

    import dataclasses
    import os as _os
    import jax, jax.numpy as jnp
    if _os.environ.get("EEGFLOW_PRNG"):
        jax.config.update("jax_default_prng_impl", _os.environ["EEGFLOW_PRNG"])
    from eegflow.core.config import ModelConfig, TrainConfig, TransformerConfig
    from eegflow.core.profiling import device_time, TPU_V5E_BF16_PEAK_FLOPS
    from eegflow.nn.model import classifier_init, model_flops_per_window
    from eegflow.train.steps import TrainState, make_optimizer, make_train_step

    base_cfg = TrainConfig(batch_size=args.batch, accumulation_steps=4, bf16=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.batch, 256, 61)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, args.batch))

    for impl in impls:
        # "transformer" profiles the EEGFormer family at flagship scale
        # (d=256, 4 layers); other impls select the BiLSTM's lstm_impl
        model_cfg = (TransformerConfig(input_size=61)
                     if impl == "transformer" else ModelConfig(input_size=61))
        flops_step = 3 * model_flops_per_window(model_cfg) * args.batch
        cfg = dataclasses.replace(
            base_cfg, lstm_impl="scan" if impl == "transformer" else impl)
        params = classifier_init(jax.random.key(0), model_cfg)
        tx = make_optimizer(cfg, updates_per_epoch=100)
        state = [TrainState(params, tx.init(params), jnp.asarray(0))]
        step = make_train_step(model_cfg, cfg, tx, donate=True)
        i = [0]
        def run():
            i[0] += 1
            s, m = step(state[0], x, y, jax.random.key(i[0]))
            state[0] = s
            jax.block_until_ready(m["loss"])
        t0 = time.time()
        run()
        print(f"[{impl}] compiled+first step in {time.time()-t0:.1f}s", flush=True)
        dt = device_time(run, iters=args.steps, warmup=2)
        if dt is None:
            print(f"[{impl}] NO TRACE PARSED", flush=True); continue
        n_done = dt.iters_done or args.steps
        step_s = dt.total_self_time_s / n_done
        if step_s <= 0.0:  # CPU smoke runs: trace has no device ops
            print(f"[{impl}] NO DEVICE TIME IN TRACE", flush=True); continue
        mfu = flops_step / step_s / TPU_V5E_BF16_PEAK_FLOPS
        print(f"[{impl}] device {step_s*1e3:.2f} ms/step | "
              f"{args.batch/step_s:,.0f} windows/s | MFU {mfu*100:.1f}%", flush=True)
        for cat, t in sorted(dt.by_category.items(), key=lambda kv: -kv[1])[:8]:
            print(f"    cat {cat:<28} {t/n_done*1e3:8.3f} ms/step", flush=True)
        for op, t in dt.top_ops(int(__import__('os').environ.get('TOPOPS', '12'))):
            print(f"    op  {op[:60]:<60} {t/n_done*1e3:8.3f} ms/step", flush=True)

if __name__ == "__main__":
    main()
