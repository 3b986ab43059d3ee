"""pgica_tpu.parallel subpackage."""
from pgica_tpu.parallel.mesh import MeshContext
from pgica_tpu.parallel.sharding import infer_param_spec, make_param_shardings, shard_params
from pgica_tpu.parallel.zero1 import Zero1State, make_zero1_train_step
