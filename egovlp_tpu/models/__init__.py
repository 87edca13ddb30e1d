from egovlp_tpu.models.video_tower import SpaceTimeTransformer, VideoTowerConfig
from egovlp_tpu.models.text_tower import DistilBert, TextTowerConfig
from egovlp_tpu.models.dual_encoder import (
    DualEncoder,
    DualEncoderConfig,
    sim_matrix,
)
