from eegflow.data.bids import discover_recordings, is_real_data  # noqa: F401
from eegflow.data.brainvision import read_brainvision, read_vhdr  # noqa: F401
from eegflow.data.synthetic import (  # noqa: F401
    EEG_CHANNELS_61,
    generate_recording,
    generate_synthetic_dataset,
    synthetic_windows,
)
