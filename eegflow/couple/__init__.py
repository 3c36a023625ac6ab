from eegflow.couple.modulation import infer_initial_state, modulate_rates  # noqa: F401
from eegflow.couple.rollout import (  # noqa: F401
    CoupledModel,
    coupled_rollout,
    make_spmd_rollout,
    predict_batch,
    predict_trajectory,
)
from eegflow.couple.sweep import coupling_strength_sweep  # noqa: F401
