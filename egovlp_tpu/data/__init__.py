from egovlp_tpu.data.samplers import (
    sample_frames,
    sample_frames_clips,
    sample_frames_start_end,
)
from egovlp_tpu.data.text import WordPieceTokenizer
