"""eegflow — TPU-native LSTM-ODE framework for EEG cognitive-state modeling.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
LSTM-ODE-BCI pipeline (see SURVEY.md): BrainVision ingestion, jit-able signal
preprocessing, a BiLSTM-attention eyes-open/closed classifier, a three-state
Active/Passive/Fatigued compartmental ODE integrated on-device, probabilistic
LSTM->ODE rate coupling, forecasting, explainability, ablations/statistics,
classical baselines, and figure/report generation — all designed TPU-first:
static shapes, `lax.scan`/`vmap` control flow, bf16 matmuls on the MXU, and
`jax.sharding` data parallelism over an ICI mesh.
"""

__version__ = "0.1.0"

from eegflow.core.config import (  # noqa: F401
    CouplingConfig,
    DataConfig,
    ModelConfig,
    ODEConfig,
    PipelineConfig,
    PreprocessConfig,
    TrainConfig,
    TransformerConfig,
)
