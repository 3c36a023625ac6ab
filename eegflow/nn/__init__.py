from eegflow.nn.attention import (  # noqa: F401
    additive_attention_apply,
    additive_attention_init,
    multihead_attention_apply,
    multihead_attention_init,
)
from eegflow.nn.layers import dense_apply, dense_init, dropout, layer_norm_apply, layer_norm_init  # noqa: F401
from eegflow.nn.losses import cross_entropy_loss, focal_loss  # noqa: F401
from eegflow.nn.lstm import (  # noqa: F401
    bilstm_stack_apply,
    bilstm_stack_init,
    lstm_cell,
    lstm_layer_apply,
    lstm_layer_init,
)
from eegflow.nn.model import classifier_apply, classifier_init, model_flops_per_window  # noqa: F401
from eegflow.nn.transformer import (  # noqa: F401
    transformer_apply,
    transformer_init,
)
