"""Data-layer tests: BrainVision write/read round-trip, BIDS discovery,
synthetic biomarker, downloader enumeration/skip logic."""

import numpy as np
import pytest

from eegflow.data import (
    EEG_CHANNELS_61,
    discover_recordings,
    generate_recording,
    generate_synthetic_dataset,
    is_real_data,
    read_brainvision,
    read_vhdr,
    synthetic_windows,
)
from eegflow.data.brainvision import write_brainvision
from eegflow.data.download import MIN_REAL_SIZE, download_file, enumerate_files


def test_brainvision_roundtrip(tmp_path, rng):
    data = (rng.standard_normal((8, 1000)) * 20e-6).astype(np.float32)
    names = EEG_CHANNELS_61[:8]
    vhdr = write_brainvision(tmp_path / "rec", data, names, 500.0)

    header = read_vhdr(vhdr)
    assert header["n_channels"] == 8
    assert header["sampling_rate"] == pytest.approx(500.0)
    assert [c["name"] for c in header["channels"]] == names

    loaded, _ = read_brainvision(vhdr)
    assert loaded.shape == data.shape
    # INT_16 @ 0.1 uV resolution -> quantization error <= 0.05 uV
    assert np.max(np.abs(loaded - data)) < 0.06e-6


def test_brainvision_crop(tmp_path, rng):
    data = (rng.standard_normal((4, 2000)) * 1e-5).astype(np.float32)
    vhdr = write_brainvision(tmp_path / "rec", data, EEG_CHANNELS_61[:4], 500.0)
    loaded, _ = read_brainvision(vhdr, crop_seconds=1.0)
    assert loaded.shape == (4, 500)


def test_brainvision_native_matches_numpy(tmp_path, rng):
    data = (rng.standard_normal((8, 1500)) * 20e-6).astype(np.float32)
    vhdr = write_brainvision(tmp_path / "rec", data, EEG_CHANNELS_61[:8], 500.0)
    a, _ = read_brainvision(vhdr, use_native=False)
    b, _ = read_brainvision(vhdr, use_native=True)  # falls back if lib missing
    np.testing.assert_array_equal(a, b)


def test_synthetic_dataset_discovery(tmp_path):
    root = generate_synthetic_dataset(tmp_path / "ds", n_subjects=3,
                                      duration_s=3.0, n_channels=8)
    recs = discover_recordings(root)
    assert len(recs) == 6  # 3 subjects x 1 session x 2 tasks
    labels = {(r["subject"], r["task"]): r["label"] for r in recs}
    assert labels[("sub-01", "eyesopen")] == 0
    assert labels[("sub-01", "eyesclosed")] == 1
    data, header = read_brainvision(recs[0]["vhdr_path"])
    assert data.shape[0] == 8


def test_discovery_skips_placeholders(tmp_path):
    root = generate_synthetic_dataset(tmp_path / "ds", n_subjects=1,
                                      duration_s=2.0, n_channels=4)
    fake = root / "sub-02" / "ses-session1" / "eeg"
    fake.mkdir(parents=True)
    (fake / "sub-02_ses-session1_task-eyesopen_eeg.vhdr").write_text(
        "/annex/objects/abcdef"  # git-annex pointer
    )
    recs = discover_recordings(root)
    assert {r["subject"] for r in recs} == {"sub-01"}
    assert not is_real_data(fake / "sub-02_ses-session1_task-eyesopen_eeg.vhdr")


def test_discovery_max_subjects(tmp_path):
    root = generate_synthetic_dataset(tmp_path / "ds", n_subjects=5,
                                      duration_s=2.0, n_channels=4)
    recs = discover_recordings(root, max_subjects=2)
    assert len({r["subject"] for r in recs}) == 2


def test_synthetic_alpha_biomarker():
    """Eyes-closed recordings must show the posterior alpha boost the real
    dataset has (ref 01:470-493) — it's what makes classification possible."""
    from eegflow.signal.spectral import band_power_summary

    names = EEG_CHANNELS_61
    open_rec = generate_recording(False, 10.0, 500.0, names, seed=1)
    closed_rec = generate_recording(True, 10.0, 500.0, names, seed=2)
    o1 = names.index("O1")
    bp_open = band_power_summary(open_rec[o1], 500.0)
    bp_closed = band_power_summary(closed_rec[o1], 500.0)
    ratio = bp_closed["alpha"] / bp_open["alpha"]
    assert ratio > 3.0  # strong alpha boost
    # frontal channels carry much less of it
    fp1 = names.index("Fp1")
    frontal_ratio = (band_power_summary(closed_rec[fp1], 500.0)["alpha"]
                     / band_power_summary(open_rec[fp1], 500.0)["alpha"])
    assert ratio > frontal_ratio


def test_synthetic_windows_fixture():
    x, y = synthetic_windows(n_per_class=16, seq_length=128, n_channels=8)
    assert x.shape == (32, 128, 8)
    assert set(y) == {0, 1}
    assert np.isfinite(x).all()


def test_downloader_enumeration():
    files = enumerate_files("/tmp/x", n_subjects=2)
    assert len(files) == 2 * 3 * 2 * 3  # subjects x sessions x tasks x exts
    assert str(files[0]["url"]).startswith(
        "https://s3.amazonaws.com/openneuro.org/ds004148/sub-01/"
    )


def test_downloader_skips_existing(tmp_path):
    files = enumerate_files(tmp_path, n_subjects=1)
    target = files[0]
    p = target["path"]
    p.parent.mkdir(parents=True)
    p.write_bytes(b"x" * (MIN_REAL_SIZE + 1))
    res = download_file(target)
    assert res["status"] == "skipped"  # no network touched
