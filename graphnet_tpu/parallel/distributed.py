"""Multi-host (pod) initialisation.

The reference's multi-node story is one Lightning flag
(``strategy="ddp"`` → torch.distributed/NCCL; ``easy_model.py:90``).
TPU-natively, each host runs the same program under a single-controller-
per-host model: call :func:`init_distributed` first, build a global mesh
over ``jax.devices()`` (all chips in the slice), and shard the global
batch over the ``data`` axis — each host feeds only its local shard
(``host_local_batch_slice``).  Gradient psum rides ICI within a slice and
DCN across slices, inserted by XLA.

This module is exercised on single-host runs (init is a no-op) and on
virtual multi-device CPU meshes; real pods run the identical code path.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialise JAX distributed if running multi-process.

    Arguments default from the standard env vars
    (``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/``PROCESS_ID``); on TPU
    pods they are auto-detected by ``jax.distributed.initialize`` with no
    arguments.  Returns ``(process_index, process_count)``.
    """
    explicit = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if explicit or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(","):
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes
            or int(os.environ.get("NUM_PROCESSES", 0)) or None,
            process_id=process_id
            if process_id is not None
            else (
                int(os.environ["PROCESS_ID"])
                if "PROCESS_ID" in os.environ
                else None
            ),
        )
    return jax.process_index(), jax.process_count()


def host_local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    assert per * n == global_batch_size, (
        f"global batch {global_batch_size} not divisible by "
        f"{n} processes"
    )
    return i * per, per


def shard_host_local(batch, mesh: jax.sharding.Mesh, data_axis="data"):
    """Assemble a globally-sharded EventBatch from this host's local
    arrays via ``make_array_from_process_local_data``."""
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(data_axis)
    )

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return x

    return jax.tree_util.tree_map(put, batch)
