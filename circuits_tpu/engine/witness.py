"""Input packing + jitted witness evaluation for the top-level circuits.

The reference flow `input.json -> native witness calculator -> witness`
(tools/helpers/actions.js:132-146) becomes: builder input dict (Python
ints, camelCase keys identical to the circom input JSON) -> packed limb
arrays with the tx lane as batch axis -> one jitted evaluation returning
the public outputs + a validity verdict.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..field import fr
from ..models.rollup_main import rollup_main
from ..models.withdraw import withdraw

_SCALARS = ["oldLastIdx", "oldStateRoot", "globalChainID",
            "currentNumBatch", "imInitStateRootFee"]
_PER_TX_FIELD = [
    "txCompressedData", "amountF", "txCompressedDataV2", "fromIdx",
    "auxFromIdx", "toIdx", "auxToIdx", "toBjjAy", "toEthAddr",
    "maxNumBatch", "rqTxCompressedDataV2", "rqToEthAddr", "rqToBjjAy",
    "s", "r8x", "r8y", "loadAmountF", "fromEthAddr",
    "tokenID1", "nonce1", "balance1", "ay1", "ethAddr1", "oldKey1",
    "oldValue1",
    "tokenID2", "nonce2", "balance2", "ay2", "ethAddr2", "oldKey2",
    "oldValue2",
]
_PER_TX_FLAG = ["onChain", "newAccount", "newExit", "isOld0_1", "isOld0_2",
                "sign1", "sign2", "rqOffset"]
_PER_FEE_FIELD = ["feePlanTokens", "feeIdxs", "imFinalAccFee", "tokenID3",
                  "nonce3", "balance3", "ay3", "ethAddr3"]

_SNAKE = {
    "txCompressedData": "tx_compressed_data",
    "amountF": "amount_f",
    "txCompressedDataV2": "tx_compressed_data_v2",
    "fromIdx": "from_idx", "auxFromIdx": "aux_from_idx",
    "toIdx": "to_idx", "auxToIdx": "aux_to_idx",
    "toBjjAy": "to_bjj_ay", "toEthAddr": "to_eth_addr",
    "maxNumBatch": "max_num_batch",
    "rqTxCompressedDataV2": "rq_tx_compressed_data_v2",
    "rqToEthAddr": "rq_to_eth_addr", "rqToBjjAy": "rq_to_bjj_ay",
    "s": "s", "r8x": "r8x", "r8y": "r8y",
    "loadAmountF": "load_amount_f", "fromEthAddr": "from_eth_addr",
    "tokenID1": "token_id1", "nonce1": "nonce1", "balance1": "balance1",
    "ay1": "ay1", "ethAddr1": "eth_addr1", "oldKey1": "old_key1",
    "oldValue1": "old_value1",
    "tokenID2": "token_id2", "nonce2": "nonce2", "balance2": "balance2",
    "ay2": "ay2", "ethAddr2": "eth_addr2", "oldKey2": "old_key2",
    "oldValue2": "old_value2",
    "onChain": "on_chain", "newAccount": "new_account",
    "newExit": "new_exit", "isOld0_1": "is_old0_1",
    "isOld0_2": "is_old0_2", "sign1": "sign1", "sign2": "sign2",
    "rqOffset": "rq_offset",
    "oldLastIdx": "old_last_idx", "oldStateRoot": "old_state_root",
    "globalChainID": "global_chain_id",
    "currentNumBatch": "current_num_batch",
    "imInitStateRootFee": "im_init_state_root_fee",
    "feePlanTokens": "fee_plan_tokens", "feeIdxs": "fee_idxs",
    "imFinalAccFee": "im_final_acc_fee",
    "tokenID3": "token_id3", "nonce3": "nonce3", "balance3": "balance3",
    "ay3": "ay3", "ethAddr3": "eth_addr3",
}


def pack_rollup_inputs(inp: dict, n_tx: int, n_levels: int,
                       max_l1_tx: int, max_fee_tx: int) -> dict:
    """Builder/JSON input dict (camelCase, Python ints) -> model arrays."""
    out = {}
    for k in _SCALARS:
        out[_SNAKE[k]] = fr.pack([inp[k]])
    for k in _PER_TX_FIELD:
        out[_SNAKE[k]] = fr.pack(inp[k])
    for k in _PER_TX_FLAG:
        out[_SNAKE[k]] = jnp.asarray(
            np.array([int(v) for v in inp[k]], dtype=np.uint32))
    for k in _PER_FEE_FIELD:
        out[_SNAKE[k]] = fr.pack(inp[k])
    out["sign3"] = jnp.asarray(
        np.array([int(v) for v in inp["sign3"]], dtype=np.uint32))

    # bits: (T, 256) LSB-first lists -> (256, T)
    bjj = np.array(inp["fromBjjCompressed"], dtype=np.uint32)
    out["from_bjj_compressed"] = jnp.asarray(bjj.T)

    # siblings: (T, L+1) -> (L+1, 16, T)
    def pack_sib(rows):
        arr = fr.pack_np(rows)  # (16, T, L+1)
        return jnp.asarray(np.moveaxis(arr, 2, 0))

    out["siblings1"] = pack_sib(inp["siblings1"])
    out["siblings2"] = pack_sib(inp["siblings2"])
    out["siblings3"] = pack_sib(inp["siblings3"])

    # im chains
    out["im_on_chain"] = jnp.asarray(
        np.array(inp["imOnChain"], dtype=np.uint32))
    out["im_out_idx"] = fr.pack(inp["imOutIdx"])
    out["im_state_root"] = fr.pack(inp["imStateRoot"])
    out["im_exit_root"] = fr.pack(inp["imExitRoot"])
    out["im_state_root_fee"] = fr.pack(inp["imStateRootFee"])
    # (T-1, F) -> (F, 16, T-1)
    acc = fr.pack_np(inp["imAccFeeOut"])  # (16, T-1, F)
    out["im_acc_fee_out"] = jnp.asarray(np.moveaxis(acc, 2, 0))
    return out


class RollupEngine:
    """Monomorphized RollupMain(nTx, nLevels, maxL1Tx, maxFeeTx) witness
    engine (the createCircuit/compileCircuit equivalent,
    tools/helpers/actions.js:17-70 — here monomorphization is a jit
    specialization, not a code-generation step)."""

    def __init__(self, n_tx, n_levels, max_l1_tx, max_fee_tx):
        self.params = (n_tx, n_levels, max_l1_tx, max_fee_tx)
        self._fn = jax.jit(partial(
            rollup_main, n_tx=n_tx, n_levels=n_levels,
            max_l1_tx=max_l1_tx, max_fee_tx=max_fee_tx))

    def pack(self, inp: dict) -> dict:
        return pack_rollup_inputs(inp, *self.params)

    def run(self, inp: dict):
        """inp: builder input dict. Returns (outputs dict of host ints,
        ok bool)."""
        packed = self.pack(inp)
        out, ok = self._fn(packed)
        return self.unpack_outputs(out), bool(ok)

    @staticmethod
    def unpack_outputs(out: dict) -> dict:
        res = {}
        for k in ["hash_global_inputs", "new_state_root", "new_exit_root",
                  "new_last_idx"]:
            res[k] = fr.unpack_int(np.asarray(out[k]))
        res["acc_fee_out"] = [
            int(v) for v in fr.unpack_np(
                np.moveaxis(np.asarray(out["acc_fee_out"]), 1, 0))]
        return res

    # Signal catalog: dotted trace name -> (group path in the debug lane
    # dict, circom signal it mirrors). The trace()/get_signal() pair is
    # the printSignals equivalent (reference
    # test/helpers/helpers.js:168-188) — every name reads the value the
    # corresponding circom signal would hold, per tx lane.
    SIGNALS = {
        # DecodeTx (src/decode-tx.circom)
        "decode.fromIdx": (("decode", "from_idx"), "Decoder[i].fromIdx"),
        "decode.toIdx": (("decode", "to_idx"), "Decoder[i].toIdx"),
        "decode.tokenID": (("decode", "token_id"), "Decoder[i].tokenID"),
        "decode.nonce": (("decode", "nonce"), "Decoder[i].nonce"),
        "decode.userFee": (("decode", "user_fee"), "Decoder[i].userFee"),
        "decode.amount": (("decode", "amount"), "Decoder[i].amount"),
        "decode.toBjjSign": (("decode", "to_bjj_sign"),
                             "Decoder[i].toBjjSign"),
        "decode.sigL2Hash": (("decode", "sig_l2_hash"),
                             "Decoder[i].sigL2Hash"),
        "decode.newAccountIdx": (("decode", "out_idx"),
                                 "Decoder[i].outIdx"),
        "decode.txCompressedDataV2": (("decode", "tx_compressed_data_v2"),
                                      "Decoder[i].txCompressedDataV2"),
        # RollupTxStates (src/rollup-tx-states.circom)
        "states.key1": (("tx", "states", "key1"), "Tx[i].states.key1"),
        "states.key2": (("tx", "states", "key2"), "Tx[i].states.key2"),
        "states.P1_fnc0": (("tx", "states", "p1_fnc0"),
                           "Tx[i].states.P1_fnc0"),
        "states.P1_fnc1": (("tx", "states", "p1_fnc1"),
                           "Tx[i].states.P1_fnc1"),
        "states.P2_fnc0": (("tx", "states", "p2_fnc0"),
                           "Tx[i].states.P2_fnc0"),
        "states.P2_fnc1": (("tx", "states", "p2_fnc1"),
                           "Tx[i].states.P2_fnc1"),
        "states.isExit": (("tx", "states", "is_exit"),
                          "Tx[i].states.isExit"),
        "states.verifySignEnabled": (("tx", "states",
                                      "verify_sign_enabled"),
                                     "Tx[i].states.verifySignEnabled"),
        "states.nullifyLoadAmount": (("tx", "states",
                                      "nullify_load_amount"),
                                     "Tx[i].states.nullifyLoadAmount"),
        "states.nullifyAmount": (("tx", "states", "nullify_amount"),
                                 "Tx[i].states.nullifyAmount"),
        # BalanceUpdater (src/balance-updater.circom)
        "balanceUpdater.newStBalanceSender": (
            ("tx", "balance", "new_balance_sender"),
            "Tx[i].balancesUpdater.newStBalanceSender"),
        "balanceUpdater.newStBalanceReceiver": (
            ("tx", "balance", "new_balance_receiver"),
            "Tx[i].balancesUpdater.newStBalanceReceiver"),
        "balanceUpdater.fee2Charge": (("tx", "balance", "fee2_charge"),
                                      "Tx[i].balancesUpdater.fee2Charge"),
        "balanceUpdater.isP2Nop": (("tx", "balance", "is_p2_nop"),
                                   "Tx[i].balancesUpdater.isP2Nop"),
        "balanceUpdater.isAmountNullified": (
            ("tx", "balance", "is_amount_nullified"),
            "Tx[i].balancesUpdater.isAmountNullified"),
        "decodeLoadAmount": (("tx", "balance", "load_amount"),
                             "Tx[i].decodeLoadAmountF.out"),
        # HashState instances (src/lib/hash-state.circom)
        "oldStHash1": (("tx", "old_state_hash1"), "Tx[i].oldStHash1.out"),
        "oldStHash2": (("tx", "old_state_hash2"), "Tx[i].oldStHash2.out"),
        "newStHash1": (("tx", "new_state_hash1"), "Tx[i].newStHash1.out"),
        "newStHash2": (("tx", "new_state_hash2"), "Tx[i].newStHash2.out"),
        # EdDSA / SMT (src/rollup-tx.circom phases F, J)
        "sigAx": (("tx", "sig_ax"), "Tx[i].getAx.ax"),
        "processor1.newRoot": (("tx", "p1_new_root"),
                               "Tx[i].processor1.newRoot"),
        "processor2.newRoot": (("tx", "p2_new_root"),
                               "Tx[i].processor2.newRoot"),
        # lane outputs
        "newStateRoot": (("new_state_root",), "Tx[i].newStateRoot"),
        "newExitRoot": (("new_exit_root",), "Tx[i].newExitRoot"),
        "outIdx": (("out_idx",), "Decoder[i].outIdx"),
        "isAmountNullified": (("is_amount_nullified",),
                              "Tx[i].isAmountNullified"),
    }

    def _trace_lanes(self, inp: dict):
        from ..models.rollup_main import build_chains, rollup_main_lanes

        n_tx, n_levels, max_l1_tx, max_fee_tx = self.params
        if not hasattr(self, "_trace_fn"):
            def fn(packed):
                chains = build_chains(packed, n_tx, max_fee_tx)
                return rollup_main_lanes(packed, chains, n_tx, n_levels,
                                         max_fee_tx, debug=True)

            self._trace_fn = jax.jit(fn)
        return self._trace_fn(self.pack(inp))

    def _full_debug(self, inp: dict):
        """One debug evaluation of the WHOLE circuit (lanes + fee phase +
        global hash) with every intermediate materialized — the witness-
        vector export path (engine/witness_vector.py). Returns
        (lanes, lane_ok, outputs, ok)."""
        from ..models.rollup_main import (build_chains, global_tail,
                                          rollup_main_lanes)

        n_tx, n_levels, max_l1_tx, max_fee_tx = self.params
        if not hasattr(self, "_full_debug_fn"):
            def fn(packed):
                chains = build_chains(packed, n_tx, max_fee_tx)
                lanes, lane_ok = rollup_main_lanes(
                    packed, chains, n_tx, n_levels, max_fee_tx, debug=True)
                out, tail_ok = global_tail(packed, lanes, n_tx, n_levels,
                                           max_l1_tx, max_fee_tx,
                                           debug=True)
                ok = (jnp.all(lane_ok) & tail_ok
                      & jnp.all(packed["im_on_chain"] <= 1))
                return lanes, lane_ok, out, ok

            self._full_debug_fn = jax.jit(fn)
        return self._full_debug_fn(self.pack(inp))

    @staticmethod
    def _lookup(lanes: dict, path: tuple):
        v = lanes
        for p in path:
            v = v[p]
        return v

    @staticmethod
    def _to_host(arr) -> list:
        a = np.asarray(arr)
        if a.ndim >= 1 and a.shape[0] == 16 and a.dtype == np.uint32:
            return [int(v) for v in fr.unpack_np(a)]
        return [int(v) for v in a.reshape(-1)]

    def trace(self, inp: dict) -> dict:
        """Signal-level introspection (the printSignals equivalent,
        reference test/helpers/helpers.js:168-188): every SIGNALS entry
        as a per-lane list of host ints, plus lane_ok / accFeeOut."""
        lanes, lane_ok = self._trace_lanes(inp)
        res = {"lane_ok": np.asarray(lane_ok).tolist()}
        for name in self.SIGNALS:
            path, _ = self.SIGNALS[name]
            res[name] = self._to_host(self._lookup(lanes, path))
        acc = np.asarray(lanes["acc_fee_out"])  # (F, 16, T)
        res["accFeeOut"] = [
            [int(v) for v in fr.unpack_np(acc[f])]
            for f in range(acc.shape[0])]
        return res

    def get_signal(self, inp: dict, name: str):
        """Read one named signal for every tx lane. `name` is a SIGNALS
        key, optionally suffixed "[i]" for a single lane
        (e.g. "states.key1[2]")."""
        lane = None
        if name.endswith("]") and "[" in name:
            base, idx = name[:-1].rsplit("[", 1)
            lane, name = int(idx), base
        if name not in self.SIGNALS:
            raise KeyError(
                f"unknown signal {name!r}; catalog: {sorted(self.SIGNALS)}")
        lanes, _ = self._trace_lanes(inp)
        vals = self._to_host(self._lookup(lanes, self.SIGNALS[name][0]))
        return vals if lane is None else vals[lane]


class WithdrawEngine:
    """Monomorphized Withdraw(nLevels) witness engine, batched over
    withdrawal lanes."""

    def __init__(self, n_levels):
        self.n_levels = n_levels
        self._fn = jax.jit(partial(withdraw, n_levels))

    def run(self, inputs: list[dict]):
        """inputs: list of withdraw input dicts (rootExit, ethAddr,
        tokenID, balance, idx, sign, ay, siblingsState). Returns
        (hash list, ok array)."""
        n = len(inputs)
        L = self.n_levels + 1

        def pk(key):
            return fr.pack([int(str(d[key]), 0) if isinstance(d[key], str)
                            else int(d[key]) for d in inputs])

        sib_rows = []
        for d in inputs:
            s = list(d["siblingsState"])
            sib_rows.append(s + [0] * (L - len(s)))
        sib = jnp.asarray(np.moveaxis(fr.pack_np(sib_rows), 2, 0))
        sign = jnp.asarray(np.array([int(d["sign"]) for d in inputs],
                                    dtype=np.uint32))
        h, ok = self._fn(pk("rootExit"), pk("ethAddr"), pk("tokenID"),
                         pk("balance"), pk("idx"), sign, pk("ay"), sib)
        vals = [int(v) for v in fr.unpack_np(np.asarray(h))]
        return vals, np.asarray(ok)

    def run_debug(self, inputs: list[dict]):
        """Like run() but also returns the intermediates dict (the
        witness-vector export path)."""
        if not hasattr(self, "_fn_debug"):
            self._fn_debug = jax.jit(partial(withdraw, self.n_levels,
                                             debug=True))
        n = len(inputs)
        L = self.n_levels + 1

        def pk(key):
            return fr.pack([int(str(d[key]), 0) if isinstance(d[key], str)
                            else int(d[key]) for d in inputs])

        sib_rows = []
        for d in inputs:
            s = list(d["siblingsState"])
            sib_rows.append(s + [0] * (L - len(s)))
        sib = jnp.asarray(np.moveaxis(fr.pack_np(sib_rows), 2, 0))
        sign = jnp.asarray(np.array([int(d["sign"]) for d in inputs],
                                    dtype=np.uint32))
        h, ok, dbg = self._fn_debug(
            pk("rootExit"), pk("ethAddr"), pk("tokenID"), pk("balance"),
            pk("idx"), sign, pk("ay"), sib)
        vals = [int(v) for v in fr.unpack_np(np.asarray(h))]
        return vals, np.asarray(ok), dbg
