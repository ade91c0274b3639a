from fabric_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_shardings, replicated, shard_batch,
)
