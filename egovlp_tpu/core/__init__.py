from egovlp_tpu.core.mesh import (
    MeshSpec,
    create_mesh,
    current_mesh,
    data_sharding,
    replicated,
    shard_batch,
)
from egovlp_tpu.core.precision import Policy, DEFAULT_POLICY
from egovlp_tpu.core.dist_eval import gather_eval
from egovlp_tpu.core.pp import pipeline_blocks, video_tower_pp_apply
from egovlp_tpu.core.tp import shard_state_tp, tp_shardings
from egovlp_tpu.core.zero import apply_zero, shard_state_zero, zero_shardings
