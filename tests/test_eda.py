"""EDA-module unit tests on a small synthetic BIDS tree."""

import numpy as np
import pytest

from eegflow.data.synthetic import generate_synthetic_dataset
from eegflow.eda import (
    analyze_recordings,
    basic_statistics,
    dataset_census,
    generate_eda_report,
    spectral_summary,
)


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("eda_ds")
    return generate_synthetic_dataset(root, n_subjects=3, duration_s=5.0,
                                      n_channels=8)


def test_dataset_census(ds):
    c = dataset_census(ds)
    assert c["n_recordings"] == 6
    assert c["n_subjects"] == 3
    assert c["recordings_per_task"] == {"eyesopen": 3, "eyesclosed": 3}


def test_census_respects_subject_cap(ds):
    c = dataset_census(ds, max_subjects=1)
    assert c["n_subjects"] == 1 and c["n_recordings"] == 2


def test_analyze_and_basic_statistics(ds):
    rows = analyze_recordings(ds, n_sample=4, crop_seconds=3.0)
    assert len(rows) == 4
    for r in rows:
        assert r["n_channels"] == 8
        assert r["sampling_rate"] == pytest.approx(500.0)
        assert 0 < r["amplitude_std_uv"] < 1000  # microvolt scale
    stats = basic_statistics(rows)
    assert stats["n_recordings"] == 4
    assert stats["sampling_rates"] == [500.0]


def test_basic_statistics_empty():
    assert basic_statistics([{"error": "x"}]) == {"n_recordings": 0}


def test_spectral_summary_biomarker(ds, rng):
    from eegflow.data.bids import discover_recordings
    from eegflow.data.brainvision import read_brainvision

    recs = discover_recordings(ds)
    open_rec = next(r for r in recs if r["label"] == 0)
    closed_rec = next(r for r in recs if r["label"] == 1)
    open_data, header = read_brainvision(open_rec["vhdr_path"])
    closed_data, _ = read_brainvision(closed_rec["vhdr_path"])
    names = [c["name"] for c in header["channels"]]
    # posterior channel carries the boost (montage_subset includes them)
    post = [i for i, n in enumerate(names)
            if n in ("O1", "Oz", "O2", "POz", "Iz", "PO8", "P8")]
    assert post, f"no posterior channel in {names}"
    s = spectral_summary(open_data[post[0]], closed_data[post[0]],
                         header["sampling_rate"])
    assert s["alpha_closed_open_ratio"] > 2.0
    assert set(s["bands"]) == {"delta", "theta", "alpha", "beta", "gamma"}


def test_eda_report(ds, tmp_path):
    census = dataset_census(ds)
    stats = basic_statistics(analyze_recordings(ds, n_sample=2))
    report = generate_eda_report(census, stats, None, tmp_path / "r.md")
    assert "# EEG Dataset" in report
    assert (tmp_path / "r.md").read_text() == report
