from eegflow.ode.field import (  # noqa: F401
    RATE_NAMES,
    apf_field,
    rates_to_array,
    rates_to_dict,
    stability_analysis,
    steady_state,
    steady_state_numeric,
    transition_matrix,
)
from eegflow.ode.integrate import (  # noqa: F401
    expm_solve,
    expm_solve_piecewise,
    rk4_solve,
    rk4_solve_modulated,
    solve,
    solve_batch,
    solve_with_modulation,
)
from eegflow.ode.mapping import map_eye_state_to_cognitive  # noqa: F401
from eegflow.ode.sensitivity import parameter_sensitivity  # noqa: F401
