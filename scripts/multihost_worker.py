"""One process of the 2-process DCN-style run (tests/test_multihost.py).

Usage: python scripts/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form one
8-device tx-lane mesh. Every process builds the same batch host-side
(the coordinator role in production), feeds only ITS tx-lane slice via
make_array_from_process_local_data, and runs the sharded witness step;
the verdict psum crosses the process boundary (the DCN analogue).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

from circuits_tpu.utils.compile_opts import (enable_cpu_fast_compile,
                                             enable_persistent_cache)

enable_cpu_fast_compile()
import jax

jax.config.update("jax_platforms", "cpu")
enable_persistent_cache(jax)

from circuits_tpu.parallel import distributed as dist

dist.initialize(f"localhost:{port}", n_proc, proc_id)
assert jax.process_count() == n_proc
assert len(jax.devices()) == 4 * n_proc, jax.devices()

from functools import partial
import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from __graft_entry__ import _build_packed
from circuits_tpu.models import rollup_main as rm
from circuits_tpu.parallel import sharding as sh

params = (8, 16, 2, 2)
n_tx = params[0]
packed_full = _build_packed(*params)
chains_full = rm.build_chains(packed_full, n_tx, params[3])

mesh = dist.global_tx_mesh()
n_dev = mesh.devices.size
t_loc = n_tx // n_dev
lanes_per_proc = n_tx // n_proc
lo, hi = proc_id * lanes_per_proc, (proc_id + 1) * lanes_per_proc


def local_slice(v, dim):
    if dim is None:
        return np.asarray(v)
    idx = [slice(None)] * v.ndim
    idx[dim] = slice(lo, hi)
    return np.asarray(v[tuple(idx)])


local_packed = {k: local_slice(v, sh._LANE_DIM.get(k))
                for k, v in packed_full.items()}
local_chains = {k: local_slice(v, sh._CHAIN_LANE_DIM[k])
                for k, v in chains_full.items()}
packed, chains = dist.shard_batch(mesh, local_packed, local_chains)

fn = partial(sh._sharded_step, n_tx=n_tx, t_loc=t_loc,
             n_levels=params[1], max_l1_tx=params[2], max_fee_tx=params[3])
in_specs = (
    {k: sh._spec(sh._LANE_DIM.get(k), v.ndim)
     for k, v in packed_full.items()},
    {k: sh._spec(sh._CHAIN_LANE_DIM[k], v.ndim)
     for k, v in chains_full.items()},
)
out_specs = (dict(hash_global_inputs=P(), new_state_root=P(),
                  new_exit_root=P(), new_last_idx=P(), acc_fee_out=P()), P())
step = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False))
out, ok = step(packed, chains)
jax.block_until_ready(out["hash_global_inputs"])
assert bool(np.asarray(ok)), "multihost sharded witness flagged failure"

# the public output must match the single-host oracle on every process
from circuits_tpu.field import fr

got = int(fr.unpack_np(np.asarray(out["hash_global_inputs"]))[0])
print(f"proc {proc_id}: ok hash={got}", flush=True)
print(f"MULTIHOST_OK {proc_id} {got}", flush=True)
