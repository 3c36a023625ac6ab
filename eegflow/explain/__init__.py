from eegflow.explain.attention import analyze_attention_patterns  # noqa: F401
from eegflow.explain.compare import compare_importance_methods  # noqa: F401
from eegflow.explain.gradient import gradient_channel_importance  # noqa: F401
from eegflow.explain.kernelshap import kernel_shap_channel_importance, kernel_shap_values  # noqa: F401
from eegflow.explain.ode_interp import analyze_ode_dynamics  # noqa: F401
from eegflow.explain.permutation import permutation_channel_importance  # noqa: F401
from eegflow.explain.summary import build_summary  # noqa: F401
