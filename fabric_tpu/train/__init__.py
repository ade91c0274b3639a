from fabric_tpu.train.state import TrainState, create_state  # noqa: F401
from fabric_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
from fabric_tpu.train.loop import train  # noqa: F401
