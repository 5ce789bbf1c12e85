from vsnca_tpu.parallel.mesh import make_mesh, replicate, shard_along
from vsnca_tpu.parallel.spatial import spatial_rollout
from vsnca_tpu.parallel.train_dp import make_dp_train_step
