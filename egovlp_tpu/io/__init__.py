from egovlp_tpu.io.config import Config, load_config
from egovlp_tpu.io.checkpoints import CheckpointManager
from egovlp_tpu.io.logging import MetricLogger
