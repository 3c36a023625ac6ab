from eegflow.train.data import (  # noqa: F401
    augment_data,
    batch_iterator,
    class_weight_array,
    weighted_epoch_indices,
)
from eegflow.train.loop import TrainResult, train_classifier  # noqa: F401
from eegflow.train.mesh import (  # noqa: F401
    make_data_mesh,
    replicate_to_mesh,
    shard_batch,
)
from eegflow.train.schedule import warmup_cosine_schedule  # noqa: F401
from eegflow.train.steps import make_eval_step, make_optimizer, make_train_step  # noqa: F401
