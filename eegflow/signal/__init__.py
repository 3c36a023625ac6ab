from eegflow.signal.filters import (  # noqa: F401
    bandpass_filter,
    butter_bandpass,
    fft_zero_phase,
    filtfilt_iir,
)
from eegflow.signal.features import extract_features, feature_names  # noqa: F401
from eegflow.signal.preprocess import (  # noqa: F401
    create_sequences,
    normalize,
    preprocess_recording,
    split_subjects,
)
from eegflow.signal.spectral import band_power, welch_psd  # noqa: F401
