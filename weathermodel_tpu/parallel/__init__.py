from weathermodel_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    param_sharding_rules,
    fsdp_sharding_rules,
    combined_sharding_rules,
    shard_params,
    shard_params_fsdp,
    ensure_on_mesh,
    prefetch_to_device,
)
from weathermodel_tpu.parallel.multihost import initialize as multihost_initialize
from weathermodel_tpu.parallel.ring_attention import (
    make_ring_attention,
    ring_attention,
)
from weathermodel_tpu.parallel.pipeline import (
    make_pipeline,
    stack_stage_params,
)
