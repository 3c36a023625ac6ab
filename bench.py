"""Headline benchmark: LSTM-ODE training throughput, windows/sec/chip.

Measures the full fused training step of the flagship classifier (61-channel
256-sample windows, hidden 256, 3 bidirectional LSTM layers + attention, bf16
matmuls, weighted CE, grad clip, AdamW) at the reference's train batch size
512 (ref 04_lstm_model.py:866), plus the coupled LSTM->ODE inference path.

Prints ONE JSON line:
  {"metric": "windows_per_sec_per_chip", "value": N, "unit": "windows/s",
   "vs_baseline": R, "mfu": M, "impl": ..., "timing": ...}

TIMING IS DEVICE-SIDE, NOT WALL-CLOCK. The axon TPU tunnel in this
environment reports wall times far above hardware peak for pure-XLA programs
(dispatch returns before execution), so this benchmark captures a
jax.profiler trace around the timed steps and sums the per-op device
self-times from the xplane (eegflow.core.profiling — validated at 97% of a
v5e's published bf16 peak on a dependency-chained 8x2048^3 matmul). "mfu" is
model FLOPs (fwd+bwd ~= 3x forward matmul FLOPs) divided by peak*time; any
measurement implying >100% of peak is refused and replaced by the
FLOPs-bounded estimate with "timing": "implausible_clamped".

vs_baseline: the reference publishes no throughput number (BASELINE.md —
"printed at runtime, no published figure"). R is computed against a
documented estimate of the reference's RTX 3090 training throughput of
~2000 windows/s — see BASELINE.md "Throughput baseline derivation" for the
arithmetic. The MFU field makes the claim falsifiable against chip physics:
at 6.7 GFLOP/window fwd+bwd, one v5e (197 bf16 TFLOP/s peak) tops out at
~29,400 windows/s, i.e. vs_baseline ~14.7 at MFU 1.0.
"""

import json
import os
import sys
import threading
import time

import numpy as np

REFERENCE_WINDOWS_PER_SEC_ESTIMATE = 2000.0

#: watchdog state: best throughput measured so far (the TPU tunnel in this
#: environment intermittently stalls on data fetches; the watchdog guarantees
#: the driver always receives the one JSON line with partial results)
_PARTIAL = {"windows_per_sec": None, "mfu": None, "impl": None,
            "timing": "watchdog_partial"}
WATCHDOG_SECONDS = float(os.environ.get("EEGFLOW_BENCH_WATCHDOG", "480"))


def _emit(windows_per_sec, mfu=None, impl=None, timing="device_trace"):
    payload = {
        "metric": "windows_per_sec_per_chip",
        "value": round(float(windows_per_sec), 1),
        "unit": "windows/s",
        "vs_baseline": round(
            float(windows_per_sec / REFERENCE_WINDOWS_PER_SEC_ESTIMATE), 2
        ),
        "timing": timing,
    }
    if mfu is not None:
        payload["mfu"] = round(float(mfu), 4)
    if impl is not None:
        payload["impl"] = impl
    print(json.dumps(payload), flush=True)


def _watchdog():
    if _PARTIAL["windows_per_sec"] is not None:
        sys.stderr.write("# watchdog fired — emitting partial result\n")
        _emit(_PARTIAL["windows_per_sec"], _PARTIAL["mfu"], _PARTIAL["impl"],
              _PARTIAL["timing"])
    else:
        sys.stderr.write("# watchdog fired before any measurement completed\n")
        _emit(0.0, timing="watchdog_no_measurement")
    sys.stderr.flush()
    os._exit(0)


def _time_train_steps(model_cfg, train_cfg, x, y, n_steps=10):
    """Device-trace timing of the train step; returns (seconds/step, timing_kind).

    Falls back to value-fetch-bounded wall clock when no trace can be parsed
    (e.g. CPU-only environments without the xprof converter) — fetching the
    loss value cannot complete before the computation has, so wall time until
    the fetch is an upper bound that amortizes tunnel overhead over n_steps.
    """
    import jax
    import jax.numpy as jnp

    from eegflow.core.profiling import device_time
    from eegflow.nn.model import classifier_init
    from eegflow.train.steps import TrainState, make_optimizer, make_train_step

    params = classifier_init(jax.random.key(0), model_cfg)
    tx = make_optimizer(train_cfg, updates_per_epoch=100)
    state_box = [TrainState(params, tx.init(params), jnp.asarray(0))]
    step = make_train_step(model_cfg, train_cfg, tx, donate=True)
    i_box = [0]

    def run_one():
        i_box[0] += 1
        s, metrics = step(state_box[0], x, y, jax.random.key(i_box[0]))
        state_box[0] = s
        jax.block_until_ready(metrics["loss"])
        return metrics

    t_c = time.perf_counter()
    metrics = run_one()
    sys.stderr.write(f"#   compiled+first step in {time.perf_counter() - t_c:.1f}s\n")
    sys.stderr.flush()

    dt = device_time(run_one, iters=n_steps, warmup=2)
    if dt is not None and dt.total_self_time_s > 0:
        return dt.total_self_time_s / n_steps, "device_trace"

    # fallback: wall clock bounded by a value fetch
    t0 = time.perf_counter()
    for _ in range(n_steps):
        metrics = run_one()
    _ = float(metrics["loss"])  # forces real completion through the tunnel
    return (time.perf_counter() - t0) / n_steps, "wall_clock_fetch_bounded"


def main():
    timer = threading.Timer(WATCHDOG_SECONDS, _watchdog)
    timer.daemon = True
    timer.start()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from eegflow.core.config import ModelConfig, TrainConfig
    from eegflow.core.profiling import TPU_V5E_BF16_PEAK_FLOPS, device_time
    from eegflow.couple.rollout import coupled_rollout
    from eegflow.nn.model import classifier_init, model_flops_per_window
    from eegflow.ode import rates_to_array
    from eegflow.ode.field import DEFAULT_RATES

    model_cfg = ModelConfig(input_size=61)   # hidden auto-resolves to 256
    base_cfg = TrainConfig(batch_size=512, accumulation_steps=4, bf16=True)

    n_chips = max(1, len(jax.devices()))
    on_tpu = jax.default_backend() == "tpu"
    peak = TPU_V5E_BF16_PEAK_FLOPS if on_tpu else None
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (base_cfg.batch_size, 256, model_cfg.input_size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, base_cfg.batch_size))
    flops_step = 3 * model_flops_per_window(model_cfg) * base_cfg.batch_size

    # train-step throughput for both LSTM implementations; headline = best
    results, timings, mfus = {}, {}, {}
    for impl in ("pallas", "scan"):
        cfg = dataclasses.replace(base_cfg, lstm_impl=impl)
        sys.stderr.write(f"# timing train[{impl}]...\n")
        sys.stderr.flush()
        try:
            dt_step, kind = _time_train_steps(model_cfg, cfg, x, y)
            mfu = flops_step / dt_step / peak if peak else None
            if mfu is not None and mfu > 1.0:
                # physically impossible measurement: refuse, clamp to the
                # FLOPs-bounded estimate and flag it
                sys.stderr.write(
                    f"# train[{impl}]: implied MFU {mfu:.2f} > 1 — timing "
                    f"implausible, clamping to FLOPs bound\n")
                dt_step = flops_step / peak
                mfu = 1.0
                kind = "implausible_clamped"
            results[impl], timings[impl], mfus[impl] = dt_step, kind, mfu
            wps = base_cfg.batch_size / dt_step / n_chips
            if _PARTIAL["windows_per_sec"] is None or wps > _PARTIAL["windows_per_sec"]:
                _PARTIAL.update(windows_per_sec=wps, mfu=mfu, impl=impl,
                                timing=kind)
            sys.stderr.write(
                f"# train[{impl}]: {dt_step * 1e3:.2f} ms/step device "
                f"({wps:.0f} windows/s"
                + (f", MFU {mfu * 100:.1f}%" if mfu is not None else "")
                + f", {kind})\n"
            )
        except Exception as e:  # pallas may be unavailable off-TPU
            sys.stderr.write(f"# train[{impl}] failed: {type(e).__name__}: {e}\n")
        sys.stderr.flush()

    best_impl = min(results, key=results.get)
    dt_step = results[best_impl]
    windows_per_sec = base_cfg.batch_size / dt_step / n_chips

    # coupled LSTM->ODE inference throughput (the stage-06 hot path)
    params = classifier_init(jax.random.key(0), model_cfg)
    k = rates_to_array(DEFAULT_RATES)
    for impl in results:
        try:
            def roll():
                out = coupled_rollout(params, x, k, model_cfg,
                                      forecast_steps=20, lstm_impl=impl)
                jax.block_until_ready(out["probs"])
                return out

            roll()
            dt = device_time(roll, iters=10, warmup=1)
            if dt is not None and dt.total_self_time_s > 0:
                dt_inf = dt.total_self_time_s / 10
                sys.stderr.write(
                    f"# coupled inference[{impl}]: "
                    f"{base_cfg.batch_size / dt_inf:.0f} samples/s/chip "
                    f"({dt_inf * 1e3:.2f} ms/batch device)\n")
            sys.stderr.flush()
        except Exception as e:
            sys.stderr.write(f"# coupled inference[{impl}] failed: {e}\n")

    timer.cancel()
    _emit(windows_per_sec, mfus.get(best_impl), best_impl, timings[best_impl])


if __name__ == "__main__":
    main()
