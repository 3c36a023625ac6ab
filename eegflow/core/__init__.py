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
from eegflow.core.prng import key_chain, seed_everything  # noqa: F401
from eegflow.core.timing import Timer, timed  # noqa: F401
