"""Real-data parity runner: one command from raw ds004148 to the ±0.5 pp
verdict against the reference's published results table.

The reference publishes its model scores in README.md:220-224; BASELINE.json
sets the rebuild's accuracy-parity target at ±0.5 percentage points. This
module turns the check into one command (`eegflow parity`): download (when
the network allows) → preprocess with ``filter_method='filtfilt'`` for
bit-faithful scipy-parity filtering → baselines → train at the reference
hyperparameters → fit-ode → integrate → diff every published number.

In environments without egress the runner documents the single blocked step
(the download) and can fall back to the synthetic dataset (``--synthetic``)
to exercise the full chain; synthetic results are marked not-comparable.
"""

from __future__ import annotations

from typing import Dict, Optional

#: Published reference results (ref README.md:220-224).
REFERENCE_RESULTS: Dict[str, Dict[str, float]] = {
    "svm": {"accuracy": 0.380, "f1": 0.000, "auc": 0.467},
    "random_forest": {"accuracy": 0.603, "f1": 0.563, "auc": 0.657},
    "xgboost": {"accuracy": 0.620, "f1": 0.632, "auc": 0.689},
    "lstm_attention": {"accuracy": 0.549, "f1": 0.603, "auc": 0.596},
    "lstm_ode_integration": {"accuracy": 0.549, "f1": 0.599, "auc": 0.596},
}

#: Our result-file model keys -> reference table rows. The no-xgboost
#: fallback (sklearn GradientBoosting — the reference's own fallback,
#: ref 03:46-51) is compared against the xgboost row.
MODEL_KEYS = {
    "svm": "svm",
    "random_forest": "random_forest",
    "xgboost": "xgboost",
    "gradient_boosting": "xgboost",
    "lstm_attention": "lstm_attention",
    "lstm_ode_integration": "lstm_ode_integration",
}

PARITY_TOLERANCE_PP = 0.5  # percentage points (BASELINE.json)


def compare_to_reference(
    measured: Dict[str, Dict[str, float]],
    tolerance_pp: float = PARITY_TOLERANCE_PP,
    comparable: bool = True,
) -> Dict[str, object]:
    """Diff measured {model: {accuracy, f1, auc}} against the published table.

    Returns per-model deltas plus the accuracy-parity verdict. ``comparable``
    False (synthetic data) keeps the numbers but marks the verdict
    informational.
    """
    rows = {}
    all_within = True
    for key, res in measured.items():
        ref_key = MODEL_KEYS.get(key)
        if ref_key is None or ref_key not in REFERENCE_RESULTS:
            continue
        ref = REFERENCE_RESULTS[ref_key]
        entry = {"reference_row": ref_key}
        for metric in ("accuracy", "f1", "auc"):
            ours = res.get(metric)
            if ours is None:
                continue
            entry[metric] = {
                "ours": round(float(ours), 4),
                "reference": ref[metric],
                "delta": round(float(ours) - ref[metric], 4),
            }
        acc_delta_pp = abs(entry["accuracy"]["delta"]) * 100 \
            if "accuracy" in entry else float("inf")
        entry["accuracy_within_tolerance"] = bool(acc_delta_pp <= tolerance_pp)
        all_within = all_within and entry["accuracy_within_tolerance"]
        rows[key] = entry
    return {
        "tolerance_pp": tolerance_pp,
        "comparable": comparable,
        "models": rows,
        "verdict": (
            ("PASS" if all_within else "FAIL") if comparable and rows
            else "NOT COMPARABLE (synthetic data — the real-ds004148 check "
                 "needs network egress for the download step)"
        ),
    }


def reference_dataset_audit(
    data_dir,
    n_subjects: Optional[int] = 30,
    sessions=None,
    tasks=("eyesopen", "eyesclosed"),
) -> Dict[str, object]:
    """Audit ``data_dir`` for the real-ds004148 artifacts the ±0.5 pp parity
    check needs, and list EXACTLY which are absent.

    The expectation manifest is the downloader's own enumeration
    (:func:`eegflow.data.download.enumerate_files` — 60 subjects x 3 sessions
    x 2 tasks x {.vhdr,.vmrk,.eeg}, ref download_dataset.py:41-68) restricted
    to the ``n_subjects`` the parity run consumes (ref 02:56
    MAX_SUBJECTS=30). A file counts as present only if it exists, exceeds the
    git-annex placeholder size, and (for .vhdr) passes the BrainVision header
    sniff — the same realness tests the ingestion layer applies
    (ref 01:136-144).

    Returns {"ok", "missing": [str, ...], "present": N, "expected": N,
    "data_dir"} — the one-command gate that makes the parity check runnable
    the moment network egress exists (`eegflow parity --expect-reference`).
    """
    from pathlib import Path

    from eegflow.data.bids import is_real_data
    from eegflow.data.download import (MIN_REAL_SIZE, N_SUBJECTS, SESSIONS,
                                       enumerate_files)

    n = N_SUBJECTS if n_subjects is None else min(n_subjects, N_SUBJECTS)
    expected = enumerate_files(Path(data_dir), n_subjects=n,
                               sessions=sessions or SESSIONS, tasks=tasks)
    def _vmrk_real(path) -> bool:
        try:
            head = path.read_text(errors="replace")[:200]
        except OSError:
            return False
        return "Brain Vision" in head or "Marker Infos" in head

    missing: list = []
    for f in expected:
        path = Path(f["path"])
        rel = f"{f['subject']}/ses-{f['session']}/{path.name}"
        if not path.exists():
            missing.append(f"{rel}: absent")
        elif path.suffix == ".eeg" and path.stat().st_size <= MIN_REAL_SIZE:
            # the binary payload: annex placeholders are tiny text files
            missing.append(f"{rel}: git-annex placeholder "
                           f"({path.stat().st_size} B)")
        elif path.suffix == ".vhdr" and not is_real_data(path):
            missing.append(f"{rel}: not BrainVision (bad header)")
        elif path.suffix == ".vmrk" and not _vmrk_real(path):
            # real marker files can be <200 B, so sniff the header instead
            missing.append(f"{rel}: not a BrainVision marker file")
    return {
        "ok": not missing,
        "missing": missing,
        "present": len(expected) - len(missing),
        "expected": len(expected),
        "data_dir": str(data_dir),
    }


def format_parity_table(report: Dict[str, object]) -> str:
    lines = [
        "Parity vs reference README.md:220-224 "
        f"(accuracy tolerance ±{report['tolerance_pp']} pp)",
        f"{'model':<22} {'metric':<9} {'ours':>8} {'ref':>8} {'delta':>8}  ok",
        "-" * 62,
    ]
    for model, entry in report["models"].items():
        for metric in ("accuracy", "f1", "auc"):
            if metric not in entry:
                continue
            e = entry[metric]
            flag = ""
            if metric == "accuracy":
                flag = "yes" if entry["accuracy_within_tolerance"] else "NO"
            lines.append(
                f"{model:<22} {metric:<9} {e['ours']:>8.4f} "
                f"{e['reference']:>8.4f} {e['delta']:>+8.4f}  {flag}"
            )
    lines.append(f"verdict: {report['verdict']}")
    return "\n".join(lines)
