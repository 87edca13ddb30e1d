from egovlp_tpu.train.state import TrainState, create_train_state, make_optimizer
from egovlp_tpu.train.trainer import Trainer, TrainerConfig
