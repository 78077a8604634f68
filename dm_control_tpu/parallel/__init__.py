"""Device-mesh parallelism utilities.

Replaces the reference's process-level parallelism (SubprocVecEnv pipes,
dm_control/scripts/vec_env.py:396-532; torch DataParallel,
scripts/trainer.py:54) with JAX SPMD: one mesh over the pod slice, env
batches sharded along an ``env`` axis, learner state replicated, gradient
reductions riding ICI collectives inserted by XLA.
"""

from dm_control_tpu.parallel.mesh import (  # noqa: F401
    env_sharding, make_mesh, replicated, shard_batch, shard_env_map,
)
from dm_control_tpu.parallel.runtime import (  # noqa: F401
    assert_partitioned, env_batch_sharding, initialize,
    make_global_env_batch, pod_mesh,
)
