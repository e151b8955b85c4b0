"""Multi-host execution glue: jax.distributed + host-sharded data loading.

The reference scales by running independent processes on partitioned point
sets (config/mask partitioning; SURVEY.md section 2.4 P1/P5).  Here a
multi-host TPU slice runs ONE logical program: each host loads only its own
point shard (forcing IO is per-host), `make_array_from_process_local_data`
assembles the global sharded arrays, and the same jitted scan runs SPMD over
the global ``points`` mesh with zero hot-loop collectives (columns are
independent; psum only for metrics/failure budgets).

Wall-clock scaling is therefore linear by construction up to input-pipeline
limits; the BASELINE scaling measurement reduces to per-host IO throughput.
This module is exercised single-process in CI (8 virtual devices) and by the
driver's dryrun; a real pod slice only changes `initialize()` arguments.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import POINTS, make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed bootstrap; no-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_point_range(n_points_total: int) -> Tuple[int, int]:
    """[start, end) of the globally-ordered point range this host owns
    (equal contiguous shards; the host loads ONLY this slice's forcing)."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = -(-n_points_total // n_proc)
    start = min(pid * per, n_points_total)
    return start, min(start + per, n_points_total)


def global_points_mesh() -> Mesh:
    """Mesh over every device of every process, points axis only."""
    return make_mesh(jax.devices())


def make_global(tree, mesh: Mesh, axis: int = 0):
    """Assemble host-local shards into global sharded arrays.

    Each leaf is this host's [local_P, ...] (axis 0) or [..., local_P]
    contribution; returns globally-sharded jax.Arrays.
    """
    def put(x):
        x = np.asarray(x)
        if x.ndim <= axis:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = [None] * x.ndim
        spec[axis] = POINTS
        sharding = NamedSharding(mesh, P(*spec))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = list(x.shape)
        global_shape[axis] = x.shape[axis] * jax.process_count()
        return jax.make_array_from_process_local_data(
            sharding, x, tuple(global_shape))
    return jax.tree.map(put, tree)


def host_any(x) -> bool:
    """``bool(np.any(x))`` that also works for multi-process global arrays
    (np.asarray on those raises).  Every process returns the SAME answer --
    the per-host bits are allgathered -- so it is safe to branch static
    (trace-time) configuration on the result."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        local = any(bool(np.any(np.asarray(s.data)))
                    for s in x.addressable_shards)
        from jax.experimental import multihost_utils
        return bool(np.any(multihost_utils.process_allgather(
            np.array([local]))))
    return bool(np.any(np.asarray(x)))


def gather_to_host(x):
    """Fetch a (possibly sharded) array fully to this host (output writing;
    on multi-host each host addresses only its shards, so production writers
    should use `x.addressable_shards` per host instead)."""
    return np.asarray(jax.device_get(x))
