from vitgan_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    shard_pytree_replicated,
    initialize_distributed,
)
from vitgan_tpu.parallel.pipeline import (  # noqa: F401
    pipeline_blocks,
    pp_bundle,
    stack_blocks,
)
