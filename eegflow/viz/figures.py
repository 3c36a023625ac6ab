"""Publication figure battery (parity with the reference's fig01-fig25 set).

Every stage of the reference saves 300-dpi PNG+PDF figures (SURVEY.md §2.10);
this module provides one function per figure family, all writing through
:func:`save_figure`. Matplotlib runs with the Agg backend (headless).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

DPI = 300
STATE_COLORS = {"Active": "#2ca02c", "Passive": "#ff7f0e", "Fatigued": "#d62728"}
STATE_NAMES = ("Active", "Passive", "Fatigued")


def save_figure(fig, path_base: str | Path, formats=("png", "pdf")) -> List[str]:
    """Save PNG+PDF at 300 dpi (the reference's convention) and close."""
    path_base = Path(path_base)
    path_base.parent.mkdir(parents=True, exist_ok=True)
    written = []
    for ext in formats:
        p = path_base.with_suffix(f".{ext}")
        fig.savefig(p, dpi=DPI, bbox_inches="tight")
        written.append(str(p))
    plt.close(fig)
    return written


def plot_class_distribution(y_by_split: Dict[str, np.ndarray], path_base) -> List[str]:
    """Per-split class balance bars (ref 01:307-335)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    splits = list(y_by_split)
    width = 0.35
    xs = np.arange(len(splits))
    open_counts = [int((np.asarray(y) == 0).sum()) for y in y_by_split.values()]
    closed_counts = [int((np.asarray(y) == 1).sum()) for y in y_by_split.values()]
    ax.bar(xs - width / 2, open_counts, width, label="Eyes open", color="#1f77b4")
    ax.bar(xs + width / 2, closed_counts, width, label="Eyes closed", color="#d62728")
    ax.set_xticks(xs, splits)
    ax.set_ylabel("Windows")
    ax.set_title("Class distribution per split")
    ax.legend()
    return save_figure(fig, path_base)


def plot_sample_timeseries(
    data: np.ndarray, fs: float, channel_names: Sequence[str], path_base,
    n_channels: int = 6, duration_s: float = 5.0,
) -> List[str]:
    """Stacked multichannel traces (ref 01:338-381)."""
    n_t = min(int(duration_s * fs), data.shape[1])
    t = np.arange(n_t) / fs
    fig, axes = plt.subplots(n_channels, 1, figsize=(10, 1.2 * n_channels),
                             sharex=True)
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.plot(t, data[i, :n_t] * 1e6, lw=0.5, color="#1f77b4")
        ax.set_ylabel(channel_names[i], rotation=0, ha="right", fontsize=8)
        ax.tick_params(labelsize=7)
    np.atleast_1d(axes)[-1].set_xlabel("Time (s)")
    fig.suptitle("Sample EEG time series (uV)")
    return save_figure(fig, path_base)


def plot_spectral_analysis(spectral: Dict, path_base) -> List[str]:
    """PSD open-vs-closed + band-power ratios (ref 01:384-507)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    freqs = np.asarray(spectral["psd"]["freqs"])
    ax1.semilogy(freqs, spectral["psd"]["open"], label="Eyes open", color="#1f77b4")
    ax1.semilogy(freqs, spectral["psd"]["closed"], label="Eyes closed", color="#d62728")
    ax1.axvspan(8, 13, alpha=0.15, color="green", label="Alpha band")
    ax1.set_xlim(0, 50)
    ax1.set_xlabel("Frequency (Hz)")
    ax1.set_ylabel("PSD (V^2/Hz)")
    ax1.set_title("Welch PSD")
    ax1.legend()
    bands = spectral["bands"]
    names = list(bands)
    ratios = [bands[b]["ratio"] for b in names]
    ax2.bar(names, ratios, color=["#999" if b != "alpha" else "#2ca02c" for b in names])
    ax2.axhline(1.0, color="k", lw=0.5)
    ax2.set_ylabel("Closed/Open power ratio")
    ax2.set_title("Band-power ratios (alpha biomarker)")
    return save_figure(fig, path_base)


def plot_preprocessing_overview(
    raw: np.ndarray, filtered: np.ndarray, normalized: np.ndarray,
    fs: float, path_base, channel: int = 0, duration_s: float = 4.0,
) -> List[str]:
    """Raw -> filtered -> normalized pipeline stages (ref 02:417-523)."""
    n_t = min(int(duration_s * fs), raw.shape[1])
    t = np.arange(n_t) / fs
    fig, axes = plt.subplots(3, 1, figsize=(10, 7), sharex=True)
    axes[0].plot(t, raw[channel, :n_t] * 1e6, lw=0.6)
    axes[0].set_title("Raw (uV)")
    axes[1].plot(t, filtered[channel, :n_t] * 1e6, lw=0.6, color="#ff7f0e")
    axes[1].set_title("Bandpass 1-45 Hz (uV)")
    axes[2].plot(t, normalized[channel, :n_t], lw=0.6, color="#2ca02c")
    axes[2].set_title("Z-scored")
    axes[2].set_xlabel("Time (s)")
    return save_figure(fig, path_base)


def plot_baseline_comparison(results: Dict[str, Dict], path_base) -> List[str]:
    """Accuracy/F1/AUC bars with bootstrap CIs (ref 03:666-757)."""
    models = list(results)
    metrics = ["accuracy", "f1", "auc"]
    fig, ax = plt.subplots(figsize=(8, 4.5))
    width = 0.25
    xs = np.arange(len(models))
    for i, m in enumerate(metrics):
        vals = [results[name].get(m, np.nan) for name in models]
        bars = ax.bar(xs + (i - 1) * width, vals, width, label=m.upper())
        if m == "accuracy":
            for j, name in enumerate(models):
                ci = results[name].get("accuracy_ci_95")
                if ci:
                    ax.errorbar(xs[j] + (i - 1) * width, vals[j],
                                yerr=[[vals[j] - ci[0]], [ci[1] - vals[j]]],
                                fmt="none", ecolor="k", capsize=3, lw=1)
    ax.set_xticks(xs, models, rotation=15)
    ax.set_ylim(0, 1)
    ax.set_title("Model comparison")
    ax.legend()
    return save_figure(fig, path_base)


def plot_training_history(history: Dict[str, list], path_base) -> List[str]:
    """Loss/accuracy/F1/LR curves (ref 04:678-716)."""
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    epochs = np.arange(1, len(history["train_loss"]) + 1)
    axes[0, 0].plot(epochs, history["train_loss"], label="train")
    axes[0, 0].plot(epochs, history["val_loss"], label="val")
    axes[0, 0].set_title("Loss")
    axes[0, 0].legend()
    axes[0, 1].plot(epochs, history["train_acc"], label="train")
    axes[0, 1].plot(epochs, history["val_acc"], label="val")
    axes[0, 1].set_title("Accuracy")
    axes[0, 1].legend()
    axes[1, 0].plot(epochs, history["val_f1"], color="#2ca02c")
    axes[1, 0].set_title("Validation F1")
    axes[1, 1].plot(epochs, history["learning_rates"], color="#9467bd")
    axes[1, 1].set_title("Learning rate")
    axes[1, 1].set_yscale("log")
    for ax in axes.flat:
        ax.set_xlabel("Epoch")
    return save_figure(fig, path_base)


def plot_attention_weights(
    attention: np.ndarray, y: np.ndarray, path_base, fs: float = 500.0,
) -> List[str]:
    """Per-class mean attention + sample heatmap (ref 04:719-776, 07:892-987)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    t = np.arange(attention.shape[1]) / fs * 1000  # ms
    for cls, name, color in ((0, "Open", "#1f77b4"), (1, "Closed", "#d62728")):
        mask = np.asarray(y) == cls
        if mask.sum():
            mean = attention[mask].mean(0)
            std = attention[mask].std(0)
            ax1.plot(t, mean, label=f"Eyes {name}", color=color)
            ax1.fill_between(t, mean - std, mean + std, alpha=0.2, color=color)
    ax1.set_xlabel("Time (ms)")
    ax1.set_ylabel("Attention weight")
    ax1.set_title("Mean temporal attention by class")
    ax1.legend()
    n_show = min(50, len(attention))
    im = ax2.imshow(attention[:n_show], aspect="auto", cmap="viridis")
    ax2.set_xlabel("Time step")
    ax2.set_ylabel("Sample")
    ax2.set_title("Attention heatmap")
    fig.colorbar(im, ax=ax2)
    return save_figure(fig, path_base)


def plot_ode_analysis(
    k: np.ndarray, path_base, sensitivity: Optional[Dict] = None,
) -> List[str]:
    """Trajectories from canonical inits + steady state + sensitivity heatmap
    (ref 05:497-684)."""
    from eegflow.ode import solve, steady_state
    from eegflow.ode.field import RATE_NAMES

    fig, axes = plt.subplots(1, 3 if sensitivity else 2, figsize=(14, 4))
    inits = {"mixed": [0.33, 0.34, 0.33], "active": [0.8, 0.1, 0.1],
             "fatigued": [0.1, 0.1, 0.8]}
    for name, y0 in inits.items():
        t, traj = solve(y0, (0, 60), 120, k=k)
        for j, state in enumerate(STATE_NAMES):
            axes[0].plot(np.asarray(t), np.asarray(traj)[:, j],
                         color=STATE_COLORS[state], alpha=0.8,
                         label=state if name == "mixed" else None)
    axes[0].set_xlabel("Time")
    axes[0].set_ylabel("Proportion")
    axes[0].set_title("APF trajectories")
    axes[0].legend()

    ss = np.asarray(steady_state(np.asarray(k)))
    axes[1].bar(STATE_NAMES, ss, color=[STATE_COLORS[s] for s in STATE_NAMES])
    axes[1].set_ylim(0, 1)
    axes[1].set_title("Steady state")

    if sensitivity:
        sens = sensitivity["sensitivities"]
        mat = np.asarray([[sens[r][s] for s in STATE_NAMES] for r in RATE_NAMES])
        im = axes[2].imshow(mat, cmap="RdBu_r",
                            vmin=-np.abs(mat).max(), vmax=np.abs(mat).max())
        axes[2].set_xticks(range(3), STATE_NAMES)
        axes[2].set_yticks(range(6), RATE_NAMES)
        axes[2].set_title("d(steady)/d(rate)")
        fig.colorbar(im, ax=axes[2])
    return save_figure(fig, path_base)


def plot_state_diagram(rates: Dict[str, float], path_base) -> List[str]:
    """Three-node transition diagram with rate labels (ref 05:594-684)."""
    fig, ax = plt.subplots(figsize=(6, 6))
    pos = {"A": (0, 1), "P": (-0.9, -0.5), "F": (0.9, -0.5)}
    full = {"A": "Active", "P": "Passive", "F": "Fatigued"}
    for s, (x, y) in pos.items():
        ax.add_patch(plt.Circle((x, y), 0.28, color=STATE_COLORS[full[s]],
                                alpha=0.85, zorder=2))
        ax.text(x, y, full[s], ha="center", va="center", fontsize=10,
                color="white", weight="bold", zorder=3)
    edges = [("A", "P", "k_ap"), ("P", "A", "k_pa"), ("A", "F", "k_af"),
             ("F", "A", "k_fa"), ("P", "F", "k_pf"), ("F", "P", "k_fp")]
    for src, dst, name in edges:
        x1, y1 = pos[src]
        x2, y2 = pos[dst]
        dx, dy = x2 - x1, y2 - y1
        norm = np.hypot(dx, dy)
        off = 0.08 * np.array([-dy, dx]) / norm
        ax.annotate(
            "", xy=(x2 - 0.3 * dx / norm + off[0], y2 - 0.3 * dy / norm + off[1]),
            xytext=(x1 + 0.3 * dx / norm + off[0], y1 + 0.3 * dy / norm + off[1]),
            arrowprops=dict(arrowstyle="-|>", color="#444", lw=1.4),
        )
        ax.text((x1 + x2) / 2 + 2.5 * off[0], (y1 + y2) / 2 + 2.5 * off[1],
                f"{name}={rates[name]:.3f}", fontsize=8, ha="center")
    ax.set_xlim(-1.5, 1.5)
    ax.set_ylim(-1.2, 1.6)
    ax.axis("off")
    ax.set_title("Cognitive state transition diagram")
    return save_figure(fig, path_base)


def plot_coupling_analysis(sweep: Dict[str, Dict[str, float]], path_base) -> List[str]:
    """Metrics vs coupling strength alpha (ref 06:553-573)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    alphas = [float(a) for a in sweep]
    for metric in ("accuracy", "f1", "mcc"):
        ax.plot(alphas, [sweep[a][metric] for a in sweep], marker="o", label=metric)
    ax.set_xlabel("Coupling strength alpha")
    ax.set_ylabel("Metric")
    ax.set_title("Coupling-strength sensitivity")
    ax.legend()
    return save_figure(fig, path_base)


def plot_trajectory_examples(
    trajectories: np.ndarray, probs: np.ndarray, path_base, n_show: int = 6,
) -> List[str]:
    """Example APF trajectories with their LSTM probabilities (ref 06:578-633)."""
    n_show = min(n_show, len(trajectories))
    fig, axes = plt.subplots(2, (n_show + 1) // 2, figsize=(4 * ((n_show + 1) // 2), 6),
                             squeeze=False)
    for i in range(n_show):
        ax = axes[i % 2][i // 2]
        for j, state in enumerate(STATE_NAMES):
            ax.plot(trajectories[i, :, j], color=STATE_COLORS[state], label=state)
        ax.set_title(f"P(closed)={probs[i, 1]:.2f}", fontsize=9)
        ax.set_ylim(0, 1)
        if i == 0:
            ax.legend(fontsize=7)
    fig.suptitle("Coupled LSTM-ODE trajectories")
    return save_figure(fig, path_base)


def plot_channel_importance(
    importance: Dict, path_base, top_k: int = 20,
) -> List[str]:
    """Top-k channel importance bars (ref 07:786-889)."""
    imp = np.asarray(importance["importance"])
    names = importance["channels"]
    order = np.argsort(-imp)[:top_k]
    fig, ax = plt.subplots(figsize=(9, 4.5))
    ax.bar([names[i] for i in order], imp[order], color="#1f77b4")
    ax.set_ylabel("Importance")
    ax.set_title(f"Channel importance — {importance.get('method', '')}")
    plt.setp(ax.get_xticklabels(), rotation=60, ha="right", fontsize=7)
    return save_figure(fig, path_base)


def plot_importance_comparison(comparison: Dict, path_base) -> List[str]:
    """Method correlation heatmap + scatter (ref 07:1102-1204)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.5))
    corr = np.asarray(comparison["correlation_matrix"])
    im = ax1.imshow(corr, cmap="RdBu_r", vmin=-1, vmax=1)
    methods = comparison["methods"]
    ax1.set_xticks(range(len(methods)), methods, rotation=30)
    ax1.set_yticks(range(len(methods)), methods)
    for i in range(len(methods)):
        for j in range(len(methods)):
            ax1.text(j, i, f"{corr[i, j]:.2f}", ha="center", va="center", fontsize=8)
    ax1.set_title("Importance-method correlation")
    fig.colorbar(im, ax=ax1)
    mat = np.asarray(comparison["normalized"])
    if len(mat) >= 2:
        ax2.scatter(mat[0], mat[1], s=14)
        ax2.set_xlabel(methods[0])
        ax2.set_ylabel(methods[1])
        r = corr[0, 1]
        ax2.set_title(f"Per-channel scores (r={r:.2f})")
    return save_figure(fig, path_base)


def plot_forecasting_results(
    forecast_results: Dict, metrics: Dict, horizons: Sequence[int], path_base,
) -> List[str]:
    """Pred-vs-actual per horizon + metric bars (ref 08:395-515)."""
    fig, axes = plt.subplots(1, len(horizons) + 1,
                             figsize=(4 * (len(horizons) + 1), 3.6))
    for i, h in enumerate(horizons):
        ax = axes[i]
        preds = np.asarray(forecast_results[h]["predictions"])[:200]
        actuals = np.asarray(forecast_results[h]["actuals"])[:200]
        ax.plot(actuals, lw=0.8, label="actual")
        ax.plot(preds, lw=0.8, label="forecast")
        m = metrics.get(h, {})
        ax.set_title(f"h={h} (acc={m.get('accuracy', 0):.2f})", fontsize=9)
        if i == 0:
            ax.legend(fontsize=7)
    ax = axes[-1]
    hs = [str(h) for h in horizons]
    ax.bar(hs, [metrics[h]["mae"] for h in horizons], color="#ff7f0e")
    ax.set_title("MAE by horizon")
    ax.set_xlabel("Horizon")
    return save_figure(fig, path_base)


def plot_comprehensive_comparison(all_results: Dict, path_base) -> List[str]:
    """Model-zoo comparison: metric bars + accuracy CIs + radar
    (ref 06:636-777)."""
    models = list(all_results)
    metrics = ["accuracy", "f1", "auc", "mcc"]
    fig = plt.figure(figsize=(13, 4.5))
    ax1 = fig.add_subplot(1, 3, 1)
    xs = np.arange(len(models))
    width = 0.8 / len(metrics)
    for i, m in enumerate(metrics):
        vals = [all_results[n].get(m) or np.nan for n in models]
        ax1.bar(xs + (i - 1.5) * width, vals, width, label=m.upper())
    ax1.set_xticks(xs, models, rotation=25, ha="right", fontsize=7)
    ax1.legend(fontsize=7)
    ax1.set_title("Metrics")

    ax2 = fig.add_subplot(1, 3, 2)
    accs = [all_results[n].get("accuracy") or 0 for n in models]
    cis = [all_results[n].get("accuracy_ci_95") or [a, a]
           for n, a in zip(models, accs)]
    err = [[a - c[0] for a, c in zip(accs, cis)],
           [c[1] - a for a, c in zip(accs, cis)]]
    ax2.errorbar(xs, accs, yerr=err, fmt="o", capsize=4)
    ax2.set_xticks(xs, models, rotation=25, ha="right", fontsize=7)
    ax2.set_title("Accuracy (95% bootstrap CI)")

    ax3 = fig.add_subplot(1, 3, 3, projection="polar")
    angles = np.linspace(0, 2 * np.pi, len(metrics), endpoint=False).tolist()
    for name in models:
        vals = [all_results[name].get(m) or 0 for m in metrics]
        vals = [max(v, 0) if v == v else 0 for v in vals]
        ax3.plot(angles + angles[:1], vals + vals[:1], lw=1, label=name)
        ax3.fill(angles + angles[:1], vals + vals[:1], alpha=0.08)
    ax3.set_xticks(angles, [m.upper() for m in metrics], fontsize=7)
    ax3.legend(fontsize=5, loc="lower right", bbox_to_anchor=(1.3, -0.15))
    return save_figure(fig, path_base)


def plot_ablation_results(
    results: Dict, cis: Optional[Dict] = None, path_base="ablation",
) -> List[str]:
    """Per-config accuracy bars with CIs (ref 09:522-668)."""
    names = list(results)
    accs = [results[n]["metrics"]["accuracy"] for n in names]
    fig, ax = plt.subplots(figsize=(8, 4.5))
    bars = ax.bar(names, accs, color="#1f77b4")
    if cis:
        err_low = [accs[i] - cis[n]["lower"] for i, n in enumerate(names)]
        err_hi = [cis[n]["upper"] - accs[i] for i, n in enumerate(names)]
        ax.errorbar(names, accs, yerr=[err_low, err_hi], fmt="none",
                    ecolor="k", capsize=3)
    ax.set_ylabel("Test accuracy")
    ax.set_title("Architecture ablation")
    plt.setp(ax.get_xticklabels(), rotation=20, ha="right")
    return save_figure(fig, path_base)
