from eegflow.eda.explore import (  # noqa: F401
    analyze_recordings,
    basic_statistics,
    dataset_census,
    generate_eda_report,
    spectral_summary,
)
