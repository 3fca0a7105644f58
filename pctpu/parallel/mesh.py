"""Device-mesh helpers: the framework's communication backend.

The reference has no comm layer (SURVEY.md §5.8 — nn.DataParallel and a
Lightning backend string). Here distribution is pjit-sharded programs over a
`jax.sharding.Mesh`; ICI/DCN collectives are emitted by XLA from sharding
constraints (psum for reductions, all_gather for halos).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[Tuple[str, int]] = (("data", -1),),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from (axis_name, size) pairs; -1 = use all remaining
    devices. E.g. make_mesh((('pair', 4), ('point', 2)))."""
    devs = np.array(devices if devices is not None else jax.devices())
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    n = devs.size
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    return Mesh(devs[:total].reshape(sizes), tuple(names))


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Multi-host runtime bring-up (`jax.distributed.initialize`): same
    pjit program on every host, DCN between hosts, ICI within a slice —
    the TPU counterpart of torch.distributed init (SURVEY.md §2.2 DDP)."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
