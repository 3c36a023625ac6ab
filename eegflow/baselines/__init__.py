from eegflow.baselines.classical import (  # noqa: F401
    load_or_extract_features,
    train_gradient_boosting,
    train_random_forest,
    train_svm,
)
