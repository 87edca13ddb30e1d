from egovlp_tpu.core.mesh import MeshSpec, create_mesh, data_sharding, replicated
from egovlp_tpu.core.precision import Policy, DEFAULT_POLICY
