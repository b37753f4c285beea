"""Device mesh + sharding helpers.

The reference has no distributed training at all (SURVEY §2.9: single-GPU,
no torch.distributed anywhere). The TPU-native scaling story is built here
from scratch: a 1-D ``data`` mesh (extendable to ("data", "model")) over
which the train step is `shard_map`ped — batch and ROI tensors sharded on
``data``, parameters replicated, gradients `psum`ed over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialisation (SURVEY §2.9's comm-backend replacement:
    `jax.distributed.initialize` + XLA collectives over ICI/DCN instead of
    NCCL/MPI). On a single host this is a no-op returning the local device
    count; on a slice it must run on every host before device use."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.device_count()


def create_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_spec(mesh: Mesh) -> P:
    """Shard the leading (batch) axis over the data axis."""
    return P(mesh.axis_names[0])


def replicated_spec() -> P:
    return P()


def shard_batch(mesh: Mesh, tree):
    """Place a host batch pytree with the leading axis sharded over data."""
    spec = batch_spec(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec)), tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, replicated_spec())), tree)
