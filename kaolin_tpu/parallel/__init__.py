"""Device-mesh parallelism layer — a capability the reference lacks entirely
(SURVEY §2.4: kaolin is single-process single-GPU; zero collectives).

TPU-native design: ``jax.sharding.Mesh`` + ``shard_map`` for
  (a) data-parallel skinning-weight training (grad psum over ``dp``),
  (b) scene-parallel physics (independent scenes sharded across devices),
  (c) batch-parallel rendering/metrics over the batch axis.
Collectives ride ICI via XLA (psum/all_gather); no NCCL analog needed.
"""

from kaolin_tpu.parallel.ops import (  # noqa: F401
    sharded_chamfer_distance,
    sharded_dibr_rasterization,
)
from kaolin_tpu.parallel.simplicits import (  # noqa: F401
    make_demo_scene,
    sharded_mlp_train_step,
    sharded_scene_batch_step,
    stack_scenes,
)
