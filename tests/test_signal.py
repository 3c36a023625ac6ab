"""Signal-layer oracle tests: filters vs scipy, features vs a torch-semantics
numpy oracle, windowing vs the reference loop, Welch vs scipy."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import signal as sps
from scipy import stats as spstats

from eegflow.core.config import PreprocessConfig
from eegflow.signal import (
    bandpass_filter,
    butter_bandpass,
    create_sequences,
    extract_features,
    feature_names,
    fft_zero_phase,
    filtfilt_iir,
    normalize,
    split_subjects,
    welch_psd,
)
from eegflow.signal.preprocess import preprocess_recording, process_recordings


@pytest.fixture(scope="module")
def eeg_like(rng):
    """Realistic-shaped multichannel signal: pink-ish noise + alpha burst."""
    fs, t_sec, c = 500.0, 4.0, 8
    t = np.arange(int(fs * t_sec)) / fs
    base = rng.standard_normal((c, len(t))).astype(np.float64)
    # smooth to make it band-limited-ish
    base = np.cumsum(base, axis=1)
    base -= base.mean(axis=1, keepdims=True)
    alpha = 5.0 * np.sin(2 * np.pi * 10.0 * t)[None, :]
    return base + alpha


def test_filtfilt_matches_scipy(eeg_like):
    b, a = butter_bandpass(1.0, 45.0, 500.0, 4)
    ours = np.asarray(filtfilt_iir(jnp.asarray(eeg_like, jnp.float32), b, a))
    ref = sps.filtfilt(b, a, eeg_like, axis=1)
    scale = np.max(np.abs(ref))
    # float32 recursion floor: the 1 Hz poles sit at |p|~0.996, so f32 biquads
    # land ~1e-4 relative of f64 filtfilt (scipy's own sosfiltfilt differs from
    # filtfilt by ~1e-6 relative). Plenty below EEG noise floor post-z-score.
    assert np.max(np.abs(ours - ref)) / scale < 3e-4


def test_fft_filter_matches_filtfilt_interior(rng):
    """FFT zero-phase filter agrees with filtfilt away from the edge transient
    (documented deviation: the difference decays at the slowest-pole rate,
    |p|~0.9954 at the 1 Hz edge -> ~2 s; recordings are minutes long)."""
    fs, t_sec = 500.0, 20.0
    t = np.arange(int(fs * t_sec)) / fs
    base = rng.standard_normal((4, len(t)))
    base = np.cumsum(base, axis=1)
    base -= base.mean(axis=1, keepdims=True)
    sig = base + 5.0 * np.sin(2 * np.pi * 10.0 * t)[None, :]

    b, a = butter_bandpass(1.0, 45.0, fs, 4)
    ours = np.asarray(fft_zero_phase(jnp.asarray(sig, jnp.float32), b, a))
    ref = sps.filtfilt(b, a, sig, axis=1)
    margin = 1500  # ~3 s, beyond the slow-pole transient
    interior_err = np.max(np.abs(ours[:, margin:-margin] - ref[:, margin:-margin]))
    assert interior_err / np.std(ref) < 0.02


def test_bandpass_kills_out_of_band(eeg_like):
    fs = 500.0
    t = np.arange(2048) / fs
    x = (np.sin(2 * np.pi * 10 * t) + np.sin(2 * np.pi * 0.2 * t)
         + np.sin(2 * np.pi * 100 * t))[None, :]
    for method in ("fft", "filtfilt"):
        y = np.asarray(bandpass_filter(jnp.asarray(x, jnp.float32), 1.0, 45.0, fs,
                                       method=method))
        spec = np.abs(np.fft.rfft(y[0]))
        freqs = np.fft.rfftfreq(2048, 1 / fs)
        in_band = spec[np.argmin(np.abs(freqs - 10))]
        low = spec[np.argmin(np.abs(freqs - 0.2))]
        high = spec[np.argmin(np.abs(freqs - 100))]
        assert in_band > 20 * low and in_band > 20 * high


def test_normalize_matches_reference(eeg_like):
    norm, mean, std = normalize(eeg_like)
    np.testing.assert_allclose(norm.mean(axis=1), 0.0, atol=1e-10)
    np.testing.assert_allclose(norm.std(axis=1), 1.0, atol=1e-10)
    # reuse of training stats
    norm2, m2, s2 = normalize(eeg_like * 2 + 1, mean, std)
    np.testing.assert_allclose(m2, mean)
    expected = (eeg_like * 2 + 1 - mean[:, None]) / std[:, None]
    np.testing.assert_allclose(norm2, expected)


def test_normalize_std_floor():
    flat = np.zeros((3, 100))
    norm, mean, std = normalize(flat)
    assert np.all(std == 1e-10)
    assert np.all(np.isfinite(norm))


def test_create_sequences_matches_reference_loop(rng):
    data = rng.standard_normal((5, 1000))
    x, y = create_sequences(data, 1, 256, 0.5)
    # reference loop oracle (ref 02:166-178)
    step = int(256 * 0.5)
    exp = [data[:, s : s + 256].T for s in range(0, 1000 - 256 + 1, step)]
    assert x.shape == (len(exp), 256, 5)
    np.testing.assert_allclose(x, np.stack(exp))
    assert np.all(y == 1)


def test_create_sequences_short_signal():
    x, y = create_sequences(np.zeros((3, 100)), 0, 256, 0.5)
    assert x.shape == (0, 256, 3) and y.shape == (0,)


def test_split_subjects_subjectwise():
    recs = [
        {"subject": f"sub-{i:02d}", "session": "ses-1", "label": i % 2}
        for i in range(20)
    ]
    splits = split_subjects(recs)
    subj = lambda rs: {r["subject"] for r in rs}
    assert subj(splits["train"]) & subj(splits["val"]) == set()
    assert subj(splits["train"]) & subj(splits["test"]) == set()
    assert subj(splits["val"]) & subj(splits["test"]) == set()
    assert len(splits["train"]) > len(splits["test"]) > 0
    # deterministic under seed
    splits2 = split_subjects(recs)
    assert subj(splits2["train"]) == subj(splits["train"])


def test_split_subjects_session_fallback():
    recs = [
        {"subject": "sub-01", "session": f"ses-{i}", "label": 0} for i in range(6)
    ]
    splits = split_subjects(recs)
    assert len(splits["train"]) >= 1 and "time_split" not in splits


def test_split_subjects_time_fallback():
    recs = [{"subject": "sub-01", "session": "ses-1", "label": 0}]
    splits = split_subjects(recs)
    assert splits.get("time_split") is True


def _torch_semantics_features(x, fs=500.0):
    """Oracle mirroring the reference torch implementation (ref 03:151-258)."""
    n, t, c = x.shape
    feats = np.zeros((n, c, 20))
    freqs = np.fft.rfftfreq(t, 1 / fs)
    masks = {
        "delta": (freqs >= 0.5) & (freqs < 4),
        "theta": (freqs >= 4) & (freqs < 8),
        "alpha": (freqs >= 8) & (freqs < 13),
        "beta": (freqs >= 13) & (freqs < 30),
        "gamma": (freqs >= 30) & (freqs < 45),
    }
    for ch in range(c):
        s = x[:, :, ch]
        mean = s.mean(1)
        std = s.std(1, ddof=1)
        var = s.var(1, ddof=1)
        mn, mx = s.min(1), s.max(1)
        cen = s - mean[:, None]
        m2, m3, m4 = (cen**2).mean(1), (cen**3).mean(1), (cen**4).mean(1)
        skew = m3 / (m2**1.5 + 1e-10)
        kurt = m4 / (m2**2 + 1e-10) - 3
        zcr = np.abs(np.diff(np.sign(cen), axis=1)).sum(1) / 2 / t
        energy = (s**2).mean(1)
        d1, d2 = np.diff(s, axis=1), np.diff(np.diff(s, axis=1), axis=1)
        mob = d1.std(1, ddof=1) / (std + 1e-10)
        comp = (d2.std(1, ddof=1) / (d1.std(1, ddof=1) + 1e-10)) / (mob + 1e-10)
        p = np.abs(np.fft.rfft(s, axis=1)) ** 2
        bp = {k: p[:, m].sum(1) for k, m in masks.items()}
        tot = sum(bp.values()) + 1e-10
        feats[:, ch] = np.stack(
            [mean, std, var, mn, mx, mx - mn, skew, kurt, zcr, energy, var,
             mob, comp, bp["delta"] / tot, bp["theta"] / tot, bp["alpha"] / tot,
             bp["beta"] / tot, bp["gamma"] / tot,
             bp["alpha"] / (bp["theta"] + 1e-10), bp["alpha"] / (bp["beta"] + 1e-10)],
            axis=1,
        )
    return feats.reshape(n, -1)


def test_features_match_torch_semantics(rng):
    x = rng.standard_normal((16, 256, 4)).astype(np.float32)
    ours = extract_features(x, fs=500.0)
    oracle = _torch_semantics_features(x.astype(np.float64))
    assert ours.shape == (16, 80)
    np.testing.assert_allclose(ours, oracle, rtol=2e-3, atol=2e-3)


def test_feature_names_order():
    names = feature_names(["O1", "O2"])
    assert len(names) == 40
    assert names[0] == "O1_mean" and names[19] == "O1_alpha_beta"
    assert names[20] == "O2_mean"


def test_features_scrub_nonfinite():
    x = np.zeros((4, 256, 2), np.float32)  # zero signal → potential 0/0
    feats = extract_features(x)
    assert np.all(np.isfinite(feats))


def test_welch_matches_scipy(rng):
    fs = 500.0
    x = rng.standard_normal((3, 4096))
    freqs, psd = welch_psd(x, fs, nperseg=1024)
    f_ref, p_ref = sps.welch(x, fs=fs, nperseg=1024)
    np.testing.assert_allclose(freqs, f_ref)
    np.testing.assert_allclose(psd, p_ref, rtol=1e-3, atol=1e-8)


def test_welch_alpha_biomarker():
    """Eyes-closed-style alpha boost must show in the 8-13 Hz band power."""
    from eegflow.signal.spectral import band_power_summary

    fs = 500.0
    t = np.arange(8192) / fs
    open_sig = np.random.default_rng(0).standard_normal(len(t))
    closed_sig = open_sig + 3.0 * np.sin(2 * np.pi * 10 * t)
    bp_open = band_power_summary(open_sig, fs)
    bp_closed = band_power_summary(closed_sig, fs)
    assert bp_closed["alpha"] / bp_open["alpha"] > 3.0


def test_preprocess_recording_end_to_end(rng):
    cfg = PreprocessConfig(filter_method="fft")
    raw = rng.standard_normal((8, 2000)) * 1e-5
    x, y, mean, std = preprocess_recording(raw, 1, cfg)
    assert x.shape[1:] == (256, 8)
    assert np.all(y == 1)
    assert np.isfinite(x).all()


def test_process_recordings_first_train_stats_fix_global(rng):
    cfg = PreprocessConfig(filter_method="fft")
    mk = lambda: rng.standard_normal((4, 1500)) * 1e-5
    loaded = {
        "train": [({"subject": "s1", "label": 0}, mk()),
                  ({"subject": "s2", "label": 1}, mk())],
        "val": [({"subject": "s3", "label": 0}, mk())],
        "test": [({"subject": "s4", "label": 1}, mk())],
    }
    arrays, meta = process_recordings(loaded, cfg)
    assert arrays["X_train"].shape[0] > 0
    assert "normalization" in meta
    assert meta["splits"]["test"]["n_sequences"] == arrays["y_test"].shape[0]
    assert len(meta["normalization"]["mean"]) == 4
