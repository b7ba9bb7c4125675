"""Tx-lane sharding of RollupMain over a 1-D device mesh.

Design (TPU-native replacement for the reference's pthread witness
parallelism, tools/helpers/actions.js:41 + circom_runtime threads):

  * mesh axis "tx": each chip evaluates a contiguous slice of tx lanes —
    decode, EdDSA, balance update, both SMT processors — with zero
    communication (the im chains arrive as per-lane inputs).
  * The neighbour windows (rq links) and the global SHA256 read across
    lanes; XLA's SPMD partitioner turns those into collective-permute /
    all-gather over ICI automatically. No hand-written collectives.
  * im chains of length T-1 are padded host-side to per-lane length-T
    prev/expected arrays (models.rollup_main.build_chains) so every
    sharded array has the lane axis divisible by the mesh.

Use `make_sharded_rollup_main(mesh, ...)` then call with inputs placed by
`tx_shardings`. nTx must be divisible by the mesh size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import fr
from ..models.rollup_main import rollup_main, build_chains

AXIS = "tx"

# input key -> which dim is the tx-lane dim (None = replicated)
_LANE_DIM = {
    # per-tx field arrays (16, T)
    "tx_compressed_data": 1, "amount_f": 1, "tx_compressed_data_v2": 1,
    "from_idx": 1, "aux_from_idx": 1, "to_idx": 1, "aux_to_idx": 1,
    "to_bjj_ay": 1, "to_eth_addr": 1, "max_num_batch": 1,
    "rq_tx_compressed_data_v2": 1, "rq_to_eth_addr": 1, "rq_to_bjj_ay": 1,
    "s": 1, "r8x": 1, "r8y": 1, "load_amount_f": 1, "from_eth_addr": 1,
    "token_id1": 1, "nonce1": 1, "balance1": 1, "ay1": 1, "eth_addr1": 1,
    "old_key1": 1, "old_value1": 1,
    "token_id2": 1, "nonce2": 1, "balance2": 1, "ay2": 1, "eth_addr2": 1,
    "old_key2": 1, "old_value2": 1,
    # per-tx flags (T,)
    "on_chain": 0, "new_account": 0, "new_exit": 0, "is_old0_1": 0,
    "is_old0_2": 0, "sign1": 0, "sign2": 0, "rq_offset": 0,
    # bits (256, T)
    "from_bjj_compressed": 1,
    # siblings (L+1, 16, T)
    "siblings1": 2, "siblings2": 2,
    # scalars / fee-slot arrays / im chains: replicated (im chains have
    # length T-1 — they are consumed through build_chains on the host
    # side of the jit boundary, see make_sharded_rollup_main)
}


def make_tx_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (AXIS,))


def tx_shardings(mesh: Mesh, inp: dict) -> dict:
    """NamedSharding pytree matching a packed+chained input dict: lane
    axes sharded over the mesh, everything else replicated."""
    specs = {}
    for k, v in inp.items():
        dim = _LANE_DIM.get(k)
        if dim is None:
            specs[k] = NamedSharding(mesh, P())
        else:
            spec = [None] * v.ndim
            spec[dim] = AXIS
            specs[k] = NamedSharding(mesh, P(*spec))
    return specs


# chain arrays produced by build_chains: lane dim index
_CHAIN_LANE_DIM = {
    "prev_on_chain": 0, "in_idx": 1, "old_state_root": 1,
    "old_exit_root": 1, "acc_fee_in": 2, "expected_out_idx": 1,
    "expected_state_root": 1, "expected_exit_root": 1,
    "expected_acc_fee": 2,
}


def _chained_rollup_main(inp, chains, n_tx, n_levels, max_l1_tx,
                         max_fee_tx):
    # rollup_main re-derives chains from im arrays; the sharded path
    # injects precomputed ones so every sharded array has a length-T
    # lane axis (im arrays are length T-1, not mesh-divisible).
    from ..models import rollup_main as rm

    lanes, lane_ok = rm.rollup_main_lanes(inp, chains, n_tx, n_levels,
                                          max_fee_tx)
    ok_all = jnp.all(lane_ok)

    fee_old_root = jnp.concatenate(
        [inp["im_init_state_root_fee"], inp["im_state_root_fee"]], axis=-1)
    from ..models.fee_tx import fee_tx
    fee_root, fee_ok = fee_tx(
        fee_old_root, inp["fee_plan_tokens"], inp["fee_idxs"],
        inp["im_final_acc_fee"],
        inp["token_id3"], inp["nonce3"], inp["sign3"], inp["balance3"],
        inp["ay3"], inp["eth_addr3"], inp["siblings3"])
    ok_all = ok_all & jnp.all(fee_ok)
    ok_all = ok_all & jnp.all(
        fr.eq(fee_root[:, :-1], inp["im_state_root_fee"]))

    from ..models.hash_inputs import hash_inputs
    l1_bits = lanes["l1_tx_full_data"][:, :max_l1_tx]
    l1_flat = l1_bits.T.reshape(-1, 1)
    l1l2 = lanes["l1l2_tx_data"]
    not_null = (~lanes["is_amount_nullified"]).astype(jnp.uint32)
    amount_rows = l1l2[2 * n_levels:2 * n_levels + 40] * not_null
    l1l2 = jnp.concatenate(
        [l1l2[:2 * n_levels], amount_rows, l1l2[2 * n_levels + 40:]],
        axis=0)
    l1l2_flat = l1l2.T.reshape(-1, 1)

    h, h_ok = hash_inputs(
        n_levels, n_tx, max_l1_tx, max_fee_tx,
        inp["old_last_idx"], lanes["out_idx"][:, -1:],
        inp["old_state_root"], fee_root[:, -1:],
        lanes["new_exit_root"][:, -1:], l1_flat, l1l2_flat,
        jnp.moveaxis(inp["fee_idxs"], 1, 0)[:, :, None],
        inp["global_chain_id"], inp["current_num_batch"])
    ok_all = ok_all & jnp.all(h_ok)

    outputs = dict(
        hash_global_inputs=h,
        new_state_root=fee_root[:, -1:],
        new_exit_root=lanes["new_exit_root"][:, -1:],
        new_last_idx=lanes["out_idx"][:, -1:],
    )
    return outputs, ok_all


def make_sharded_rollup_main(mesh: Mesh, n_tx: int, n_levels: int,
                             max_l1_tx: int, max_fee_tx: int):
    """Returns run(packed_inputs) -> (outputs, ok) with the tx axis
    sharded over `mesh`. build_chains runs unsharded (host-cheap concat)
    so the device arrays all carry a length-T lane axis."""
    assert n_tx % mesh.devices.size == 0, \
        f"nTx={n_tx} must divide over {mesh.devices.size} devices"

    fn = partial(_chained_rollup_main, n_tx=n_tx, n_levels=n_levels,
                 max_l1_tx=max_l1_tx, max_fee_tx=max_fee_tx)
    jitted = jax.jit(fn)

    def run(packed: dict):
        chains = build_chains(packed, n_tx, max_fee_tx)
        in_specs = tx_shardings(mesh, packed)
        chain_specs = {}
        for k, v in chains.items():
            spec = [None] * v.ndim
            spec[_CHAIN_LANE_DIM[k]] = AXIS
            chain_specs[k] = NamedSharding(mesh, P(*spec))
        placed = {k: jax.device_put(v, in_specs[k])
                  for k, v in packed.items()}
        chains_placed = {k: jax.device_put(v, chain_specs[k])
                         for k, v in chains.items()}
        return jitted(placed, chains_placed)

    return run
