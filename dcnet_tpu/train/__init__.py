from dcnet_tpu.train.state import TrainState, create_train_state, make_optimizer
from dcnet_tpu.train.step import eval_step, train_step, train_step_donated
