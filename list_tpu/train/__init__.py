"""Training stack: state, optimizers, checkpoints, executors, driver."""

from list_tpu.train.state import TrainState, make_optimizer  # noqa: F401
from list_tpu.train.executors import (  # noqa: F401
    CoarseNetExecutor, LISTExecutor, total_loss)
from list_tpu.train import checkpoints  # noqa: F401
from list_tpu.train.trainer import (  # noqa: F401
    train, build_model, build_executor, run_testlist, train_one_epoch)
