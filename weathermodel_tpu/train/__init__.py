from weathermodel_tpu.train.state import TrainState, create_train_state
from weathermodel_tpu.train.steps import (
    Batch,
    make_train_step,
    make_eval_step,
    compile_step,
)
