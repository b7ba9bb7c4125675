"""Multi-host (DCN) scaffolding: jax.distributed entry point + global
mesh/input helpers.

The reference is single-host (pthreads inside one witness binary;
SURVEY §2.4) — multi-host is this framework's extension of the same
im-signal parallelization contract (/root/reference/src/rollup-main.circom:93-99)
across a DCN-connected pod: the tx-lane axis shards over ALL devices of
all processes; the rq-link all_gathers and the verdict psum ride ICI
within a slice and DCN between hosts, inserted by the same shard_map
program (parallel/sharding.py) — no separate comm backend, exactly as
XLA intends.

Usage (one call per process, before any jax array op):

    from circuits_tpu.parallel import distributed as dist
    dist.initialize()                  # env-driven (see below) or
    dist.initialize("host0:1234", 2, 0)  # explicit

Env fallbacks: CTPU_COORDINATOR, CTPU_NUM_PROCESSES, CTPU_PROCESS_ID
(standard cluster-manager envs work too — jax.distributed auto-detects
SLURM/GKE). After initialize(), `global_tx_mesh()` spans every device
in the job and `shard_batch()` builds the global arrays from
process-local tx slices.

Validated by tests/test_multihost.py: a real 2-process CPU run on this
machine (4 virtual devices per process -> one 8-device DCN-style mesh)
executing the sharded residual check with a psum verdict.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import AXIS, _LANE_DIM, _CHAIN_LANE_DIM, _spec

_initialized = False


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """jax.distributed.initialize with env fallbacks (idempotent).
    No-op when num_processes resolves to 1 and no coordinator is set —
    single-process callers can call this unconditionally."""
    global _initialized
    if _initialized:
        return
    coordinator = coordinator or os.environ.get("CTPU_COORDINATOR")
    if num_processes is None and "CTPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["CTPU_NUM_PROCESSES"])
    if process_id is None and "CTPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["CTPU_PROCESS_ID"])
    if coordinator is None and (num_processes or 1) == 1:
        return  # single-process: nothing to set up
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes,
        process_id=process_id, local_device_ids=local_device_ids)
    _initialized = True


def global_tx_mesh() -> Mesh:
    """1-D tx-lane mesh over every device of every process. Device
    order is jax.devices() (process-major), so each host's local tx
    slice is contiguous — host i feeds lanes [i*T/n, (i+1)*T/n)."""
    return Mesh(np.array(jax.devices()), (AXIS,))


def shard_batch(mesh: Mesh, local_packed: dict, local_chains: dict):
    """Build global device arrays from process-local tx slices.

    Each process passes the packed inputs/chains for ITS tx lanes (the
    full batch dict restricted to the local slice along the lane dim;
    replicated arrays must be identical on every process). Returns
    (packed, chains) as global jax.Arrays laid out over `mesh`."""
    def build(v, dim):
        sharding = NamedSharding(mesh, _spec(dim, v.ndim))
        if dim is None:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(v), np.asarray(v).shape)
        arr = np.asarray(v)
        gshape = list(arr.shape)
        gshape[dim] = gshape[dim] * (jax.process_count())
        return jax.make_array_from_process_local_data(
            sharding, arr, tuple(gshape))

    packed = {k: build(v, _LANE_DIM.get(k))
              for k, v in local_packed.items()}
    chains = {k: build(v, _CHAIN_LANE_DIM[k])
              for k, v in local_chains.items()}
    return packed, chains
