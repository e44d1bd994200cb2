from lvae_tpu.training.trainer import BaseTrainingWrapper, parse_model_args
from lvae_tpu.training.optim import (
    TrainState, create_train_state, make_train_step, build_transform,
)
from lvae_tpu.training.schedules import lr_factor, get_cosine_factor
from lvae_tpu.training import checkpoint
