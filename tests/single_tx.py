"""getSingleTxInput equivalent (reference test/helpers/helpers.js:45-137):
slice a built batch into per-tx RollupTx-model inputs so one transaction
can be driven and asserted in isolation (the reference's
rollup-tx.test.js assertTxs pattern)."""

from functools import partial

import jax

from circuits_tpu.engine.witness import pack_rollup_inputs
from circuits_tpu.models.rollup_main import (build_chains, build_tx_inputs,
                                             _neighbors)
from circuits_tpu.models.decode_tx import decode_tx
from circuits_tpu.field import fr

import jax.numpy as jnp


def batch_tx_inputs(bb):
    """Full-batch RollupTx input dict (+ chains) for a built batch."""
    n_tx, n_levels = bb.maxNTx, bb.nLevels
    max_l1, max_fee = bb.maxL1Tx, bb.totalFeeTransactions
    packed = pack_rollup_inputs(bb.get_input(), n_tx, n_levels, max_l1,
                                max_fee)
    chains = build_chains(packed, n_tx, max_fee)
    dec, _ = decode_tx(
        n_levels,
        chains["prev_on_chain"], packed["tx_compressed_data"],
        packed["max_num_batch"], packed["amount_f"], packed["to_eth_addr"],
        packed["to_bjj_ay"], packed["rq_tx_compressed_data_v2"],
        packed["rq_to_eth_addr"], packed["rq_to_bjj_ay"],
        packed["from_eth_addr"], packed["from_bjj_compressed"],
        packed["load_amount_f"],
        jnp.broadcast_to(packed["global_chain_id"], (16, n_tx)),
        jnp.broadcast_to(packed["current_num_batch"], (16, n_tx)),
        packed["on_chain"], packed["new_account"],
        packed["aux_from_idx"], packed["aux_to_idx"], chains["in_idx"])
    zero1 = fr.zeros((1,))
    neighbors = (*_neighbors(packed["tx_compressed_data_v2"], zero1),
                 *_neighbors(packed["to_eth_addr"], zero1),
                 *_neighbors(packed["to_bjj_ay"], zero1))
    tx_in = build_tx_inputs(packed, chains, dec, n_tx, max_fee, neighbors)
    return tx_in, chains


def get_single_tx_input(tx_in: dict, i: int) -> dict:
    """Lane i of a full-batch RollupTx input (every entry carries the
    lane axis last)."""
    return {k: v[..., i:i + 1] for k, v in tx_in.items()}
