from gandes_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_state,
    state_shardings,
)
