from eegflow.analyze.evaluate import binary_metrics, bootstrap_ci, evaluate_model  # noqa: F401
from eegflow.analyze.stats import (  # noqa: F401
    bootstrap_metric_ci,
    cohens_d,
    interpret_cohens_d,
    mcnemar_test,
    paired_t_test,
)
