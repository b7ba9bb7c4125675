"""RollupMain — the full batch circuit as a batched witness evaluator.

Replicates /root/reference/src/rollup-main.circom:82-475, phases A–H.
The key structural move (the reference's own parallelization contract,
:93-99): every DecodeTx/RollupTx/FeeTx instance reads coordinator-provided
im* chain values instead of its neighbour's outputs, so the nTx lane axis
is a pure batch axis. Here that axis IS the array batch axis — one
`rollup_tx` call evaluates all lanes at once, and `parallel/` shards the
same axis across chips with jax.sharding annotations.

Structure:
  build_chains()       im chains -> per-lane prev/expected arrays (len T)
  rollup_main_lanes()  phases A–E: per-lane decode + tx + integrity
  rollup_main()        + phases F–H (fee txs, global SHA256) and verdict

Input dict layout (shapes; T = nTx, F = maxFeeTx, L = nLevels):
  scalars (16, 1):  old_last_idx, old_state_root, global_chain_id,
                    current_num_batch, im_init_state_root_fee
  per-tx (16, T):   tx_compressed_data, amount_f, tx_compressed_data_v2, ...
  per-tx flags (T,): on_chain, new_account, new_exit, is_old0_1, is_old0_2,
                    sign1, sign2, rq_offset (uint32)
  bits (256, T):    from_bjj_compressed
  siblings (L+1, 16, T): siblings1, siblings2
  im chains: (16, T-1) im_state_root, im_exit_root, im_out_idx;
             (T-1,) im_on_chain; (F, 16, T-1) im_acc_fee_out
  fee phase: (16, F) fee arrays + (16, F-1) im_state_root_fee chain etc.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..field import fr
from .decode_tx import decode_tx
from .rollup_tx import rollup_tx
from .fee_tx import fee_tx
from .hash_inputs import hash_inputs


def _neighbors(x, zero):
    """x (16, T) -> future (3, 16, T) and past (4, 16, T) neighbour
    stacks: future[j][i] = x[i+j+1], past[j][i] = x[i-j-1], zero-padded
    (src/rollup-main.circom:287-309)."""
    fut, past = [], []
    for j in range(3):
        fut.append(jnp.concatenate(
            [x[:, j + 1:], jnp.broadcast_to(zero, x[:, :j + 1].shape)],
            axis=-1))
    for j in range(4):
        past.append(jnp.concatenate(
            [jnp.broadcast_to(zero, x[:, :j + 1].shape), x[:, :-(j + 1)]],
            axis=-1))
    return jnp.stack(fut), jnp.stack(past)


def build_chains(inp: dict, n_tx: int, max_fee_tx: int) -> dict:
    """im* chains -> per-lane 'previous' and 'expected' arrays of length T.
    Lane i's previous values are lane i-1's im entries (lane 0 gets the
    batch-level initial values); expected values are lane i's own im
    entries (last lane: imInitStateRootFee / imFinalAccFee per
    src/rollup-main.circom:427-431; the exit root of the last lane is an
    unconstrained output → masked in the check)."""
    zero1 = fr.zeros((1,))
    cat = partial(jnp.concatenate, axis=-1)
    return dict(
        prev_on_chain=jnp.concatenate(
            [jnp.ones((1,), dtype=jnp.bool_),
             inp["im_on_chain"].astype(jnp.bool_)]),
        # lane i's im_onChain[i] (the value the decode-integrity check
        # compares against); built host-side so the sharded path gets a
        # clean per-lane array instead of a cross-shard shift
        im_oc_next=jnp.concatenate(
            [inp["im_on_chain"].astype(jnp.bool_),
             jnp.zeros((1,), dtype=jnp.bool_)]),
        in_idx=cat([inp["old_last_idx"], inp["im_out_idx"]]),
        old_state_root=cat([inp["old_state_root"], inp["im_state_root"]]),
        old_exit_root=cat([zero1, inp["im_exit_root"]]),
        acc_fee_in=jnp.concatenate(
            [jnp.zeros((max_fee_tx, 16, 1), dtype=jnp.uint32),
             inp["im_acc_fee_out"]], axis=-1),
        expected_out_idx=cat([inp["im_out_idx"],
                              jnp.zeros_like(zero1)]),  # last: unchecked
        expected_state_root=cat([inp["im_state_root"],
                                 inp["im_init_state_root_fee"]]),
        expected_exit_root=cat([inp["im_exit_root"], zero1]),
        expected_acc_fee=jnp.concatenate(
            [inp["im_acc_fee_out"],
             jnp.moveaxis(inp["im_final_acc_fee"], 1, 0)[:, :, None]],
            axis=-1),
    )


def build_tx_inputs(inp: dict, chains: dict, dec: dict, n_tx: int,
                    max_fee_tx: int, neighbors) -> dict:
    """Assemble the RollupTx model's input dict from packed batch inputs
    + chains + decode outputs. Shared by rollup_main_lanes and the
    single-tx slicer (tests, the getSingleTxInput equivalent —
    reference test/helpers/helpers.js:45-137). Every entry carries the
    tx-lane axis LAST."""
    fut_v2, past_v2, fut_eth, past_eth, fut_ay, past_ay = neighbors
    fee_plan = jnp.broadcast_to(
        jnp.moveaxis(inp["fee_plan_tokens"], 1, 0)[:, :, None],
        (max_fee_tx, 16, n_tx))
    return dict(
        fee_plan_tokens=fee_plan,
        acc_fee_in=chains["acc_fee_in"],
        future_tx_v2=fut_v2, past_tx_v2=past_v2,
        future_to_eth=fut_eth, past_to_eth=past_eth,
        future_to_ay=fut_ay, past_to_ay=past_ay,
        from_idx=dec["from_idx"], aux_from_idx=inp["aux_from_idx"],
        to_idx=dec["to_idx"], aux_to_idx=inp["aux_to_idx"],
        to_bjj_ay=inp["to_bjj_ay"], to_bjj_sign=dec["to_bjj_sign"],
        to_eth_addr=inp["to_eth_addr"],
        amount=dec["amount"], token_id=dec["token_id"],
        nonce=dec["nonce"], user_fee_sel=fr.low_u32(dec["user_fee"]),
        rq_offset=inp["rq_offset"].astype(jnp.uint32),
        on_chain=inp["on_chain"], new_account=inp["new_account"],
        rq_tx_v2=inp["rq_tx_compressed_data_v2"],
        rq_to_eth=inp["rq_to_eth_addr"], rq_to_ay=inp["rq_to_bjj_ay"],
        sig_l2_hash=dec["sig_l2_hash"],
        s=inp["s"], r8x=inp["r8x"], r8y=inp["r8y"],
        from_eth_addr=inp["from_eth_addr"],
        from_bjj_compressed=inp["from_bjj_compressed"],
        load_amount_f=inp["load_amount_f"],
        token_id1=inp["token_id1"], nonce1=inp["nonce1"],
        sign1=inp["sign1"], balance1=inp["balance1"], ay1=inp["ay1"],
        eth_addr1=inp["eth_addr1"], siblings1=inp["siblings1"],
        is_old0_1=inp["is_old0_1"], old_key1=inp["old_key1"],
        old_value1=inp["old_value1"],
        token_id2=inp["token_id2"], nonce2=inp["nonce2"],
        sign2=inp["sign2"], balance2=inp["balance2"],
        new_exit=inp["new_exit"], ay2=inp["ay2"],
        eth_addr2=inp["eth_addr2"], siblings2=inp["siblings2"],
        is_old0_2=inp["is_old0_2"], old_key2=inp["old_key2"],
        old_value2=inp["old_value2"],
        old_state_root=chains["old_state_root"],
        old_exit_root=chains["old_exit_root"],
    )


def rollup_main_lanes(inp: dict, chains: dict, n_tx: int, n_levels: int,
                      max_fee_tx: int, neighbors=None, last_mask=None,
                      debug: bool = False):
    """Phases A–E for all tx lanes. Returns (lane outputs dict, per-lane
    ok (T,)).

    `n_tx` is the width of the lane axis IN THIS CALL — the sharded path
    passes the per-shard width plus `neighbors` (pre-sliced rq-link
    window stacks, see `neighbor_windows`) and `last_mask` ((T,) bool,
    True at the globally-last lane); single-chip callers omit both."""
    # A - binary checks (:205-219): all boolean inputs must be 0/1 —
    # non-binary flags flip the verdict instead of silently coercing
    # (src/rollup-main.circom:206-218)
    bjj_bits = inp["from_bjj_compressed"]
    lane_ok = jnp.all(bjj_bits <= 1, axis=0)
    for flag in ("on_chain", "new_account", "is_old0_1", "is_old0_2"):
        lane_ok = lane_ok & (inp[flag] <= 1)

    # B - decode (:221-254)
    dec, dec_ok = decode_tx(
        n_levels,
        chains["prev_on_chain"], inp["tx_compressed_data"],
        inp["max_num_batch"], inp["amount_f"], inp["to_eth_addr"],
        inp["to_bjj_ay"], inp["rq_tx_compressed_data_v2"],
        inp["rq_to_eth_addr"], inp["rq_to_bjj_ay"], inp["from_eth_addr"],
        inp["from_bjj_compressed"], inp["load_amount_f"],
        jnp.broadcast_to(inp["global_chain_id"], (16, n_tx)),
        jnp.broadcast_to(inp["current_num_batch"], (16, n_tx)),
        inp["on_chain"], inp["new_account"],
        inp["aux_from_idx"], inp["aux_to_idx"], chains["in_idx"])
    lane_ok = lane_ok & dec_ok

    # C - decode integrity (:256-265)
    last = (jnp.arange(n_tx) == n_tx - 1) if last_mask is None else last_mask
    lane_ok = lane_ok & fr.eq(dec["tx_compressed_data_v2"],
                              inp["tx_compressed_data_v2"])
    on_chain_b = inp["on_chain"].astype(jnp.bool_)
    lane_ok = lane_ok & ((on_chain_b == chains["im_oc_next"]) | last)
    lane_ok = lane_ok & (fr.eq(dec["out_idx"],
                               chains["expected_out_idx"]) | last)

    # D - rollup transactions (:267-379)
    if neighbors is None:
        zero1 = fr.zeros((1,))
        fut_v2, past_v2 = _neighbors(inp["tx_compressed_data_v2"], zero1)
        fut_eth, past_eth = _neighbors(inp["to_eth_addr"], zero1)
        fut_ay, past_ay = _neighbors(inp["to_bjj_ay"], zero1)
    else:
        fut_v2, past_v2, fut_eth, past_eth, fut_ay, past_ay = neighbors

    tx_in = build_tx_inputs(inp, chains, dec, n_tx, max_fee_tx,
                            (fut_v2, past_v2, fut_eth, past_eth,
                             fut_ay, past_ay))
    txo, tx_ok = rollup_tx(tx_in, n_levels, debug=debug)
    lane_ok = lane_ok & tx_ok

    # E + G(:427-431) - im integrity per lane
    lane_ok = lane_ok & fr.eq(txo["new_state_root"],
                              chains["expected_state_root"])
    lane_ok = lane_ok & (fr.eq(txo["new_exit_root"],
                               chains["expected_exit_root"]) | last)
    # (F, T) slot-wise equality -> per-lane all-slots-match; without the
    # axis-0 reduction lane_ok silently broadcast to (F, T)
    lane_ok = lane_ok & jnp.all(fr.eq(
        jnp.moveaxis(txo["acc_fee_out"], 1, 0),
        jnp.moveaxis(chains["expected_acc_fee"], 1, 0)), axis=0)

    lanes = dict(
        l1_tx_full_data=dec["l1_tx_full_data"],
        l1l2_tx_data=dec["l1l2_tx_data"],
        out_idx=dec["out_idx"],
        new_state_root=txo["new_state_root"],
        new_exit_root=txo["new_exit_root"],
        acc_fee_out=txo["acc_fee_out"],
        is_amount_nullified=txo["is_amount_nullified"],
    )
    if debug:
        lanes["decode"] = dec
        lanes["tx"] = {k: txo[k] for k in
                       ("states", "balance", "old_state_hash1",
                        "old_state_hash2", "new_state_hash1",
                        "new_state_hash2", "sig_ax", "p1_new_root",
                        "p2_new_root",
                        # witness-vector catalog (witness_vector.py)
                        "decode_ay", "decode_sign", "s1", "s2",
                        "new_nonce1", "sig_ay", "sig_sign",
                        "p1_enabled", "p2_enabled")}
    return lanes, lane_ok


def global_tail(inp: dict, lanes: dict, n_tx: int, n_levels: int,
                max_l1_tx: int, max_fee_tx: int, debug: bool = False):
    """Phases F–H: fee transactions, fee-chain integrity, global SHA256.
    `lanes` must carry FULL-width (all-T-lane) arrays — the sharded path
    all-gathers its shards before calling. Returns (outputs, ok)."""
    # F - fee transactions (:391-417), batched over the F slot axis
    fee_old_root = jnp.concatenate(
        [inp["im_init_state_root_fee"], inp["im_state_root_fee"]], axis=-1)
    fee_res = fee_tx(
        fee_old_root, inp["fee_plan_tokens"], inp["fee_idxs"],
        inp["im_final_acc_fee"],
        inp["token_id3"], inp["nonce3"], inp["sign3"], inp["balance3"],
        inp["ay3"], inp["eth_addr3"], inp["siblings3"], debug=debug)
    fee_root, fee_ok = fee_res[0], fee_res[1]
    ok_all = jnp.all(fee_ok)

    # G - fee im integrity (:419-424)
    ok_all = ok_all & jnp.all(
        fr.eq(fee_root[:, :-1], inp["im_state_root_fee"]))

    # H - global input hash (:433-474)
    l1_bits = lanes["l1_tx_full_data"][:, :max_l1_tx]  # (736, maxL1Tx)
    l1_flat = l1_bits.T.reshape(-1, 1)
    l1l2 = lanes["l1l2_tx_data"]  # (2L+48, T)
    not_nullified = (~lanes["is_amount_nullified"]).astype(jnp.uint32)
    amount_rows = l1l2[2 * n_levels:2 * n_levels + 40] * not_nullified
    l1l2 = jnp.concatenate(
        [l1l2[:2 * n_levels], amount_rows, l1l2[2 * n_levels + 40:]],
        axis=0)
    l1l2_flat = l1l2.T.reshape(-1, 1)

    new_last_idx = lanes["out_idx"][:, -1:]
    final_state_root = fee_root[:, -1:]
    final_exit_root = lanes["new_exit_root"][:, -1:]

    h, h_ok = hash_inputs(
        n_levels, n_tx, max_l1_tx, max_fee_tx,
        inp["old_last_idx"], new_last_idx, inp["old_state_root"],
        final_state_root, final_exit_root, l1_flat, l1l2_flat,
        jnp.moveaxis(inp["fee_idxs"], 1, 0)[:, :, None],
        inp["global_chain_id"], inp["current_num_batch"])
    ok_all = ok_all & jnp.all(h_ok)

    outputs = dict(
        hash_global_inputs=h,
        new_state_root=final_state_root,
        new_exit_root=final_exit_root,
        new_last_idx=new_last_idx,
        acc_fee_out=lanes["acc_fee_out"][:, :, -1],
    )
    if debug:
        outputs["fee"] = dict(fee_res[2], new_root=fee_root)
    return outputs, ok_all


def rollup_main(inp: dict, n_tx: int, n_levels: int, max_l1_tx: int,
                max_fee_tx: int):
    """Returns (outputs: dict with hash_global_inputs (16, 1) and the
    final roots, ok: scalar bool)."""
    chains = build_chains(inp, n_tx, max_fee_tx)
    lanes, lane_ok = rollup_main_lanes(inp, chains, n_tx, n_levels,
                                       max_fee_tx)
    ok_all = jnp.all(lane_ok)
    # A (global) - im_on_chain binary (src/rollup-main.circom:206-209)
    ok_all = ok_all & jnp.all(inp["im_on_chain"] <= 1)
    out, tail_ok = global_tail(inp, lanes, n_tx, n_levels, max_l1_tx,
                               max_fee_tx)
    return out, ok_all & tail_ok


def make_rollup_main(n_tx, n_levels, max_l1_tx, max_fee_tx):
    """Jitted closure over the static circuit parameters."""
    return jax.jit(partial(rollup_main, n_tx=n_tx, n_levels=n_levels,
                           max_l1_tx=max_l1_tx, max_fee_tx=max_fee_tx))
