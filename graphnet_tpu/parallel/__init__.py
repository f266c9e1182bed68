"""Multi-chip / multi-host parallelism."""

from graphnet_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from graphnet_tpu.parallel.graph_sharding import (
    make_dp_graph_mesh,
    shard_batch_nodes,
)
from graphnet_tpu.parallel.distributed import (
    host_local_batch_slice,
    init_distributed,
    shard_host_local,
)
