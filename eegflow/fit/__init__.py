from eegflow.fit.evolution import differential_evolution_fit, fit_ode_rates, make_fit_loss  # noqa: F401
