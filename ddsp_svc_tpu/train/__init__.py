from .checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from .state import TrainState, create_train_state, make_lr_schedule  # noqa: F401
