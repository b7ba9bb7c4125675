"""Unit tests for the circuit-template models (decision table, balance
updater, fee accumulator, rq verifier, decode) against the reference
circuits' documented behavior (cited per test)."""

import numpy as np
import jax.numpy as jnp
import pytest

from circuits_tpu.field import fr
from circuits_tpu.models.tx_states import rollup_tx_states
from circuits_tpu.models.balance_updater import balance_updater
from circuits_tpu.models.fee_accumulator import fee_accumulator
from circuits_tpu.models.rq_tx_verifier import rq_tx_verifier
from circuits_tpu.builder.fee_table import compute_fee as fee_oracle
from circuits_tpu.builder import tx_utils, float40


def F(vals):
    return fr.pack(list(vals))


def flags(vals):
    return jnp.asarray(np.array(vals, dtype=np.uint32))


# ---------------------------------------------------------------------------
# RollupTxStates — the 11 tx types (rollup-tx-states.circom:41-54)
# ---------------------------------------------------------------------------


def test_tx_states_decision_table():
    ANY = (1 << 160) - 1
    # per-row: (name, inputs dict, expected outputs dict)
    rows = [
        ("createAccount",
         dict(fromIdx=0, toIdx=0, toEthAddr=0, auxFromIdx=260, auxToIdx=0,
              amount=0, newExit=0, loadAmount=0, newAccount=1, onChain=1),
         dict(isP1Insert=1, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=260, p1=(1, 0))),
        ("createAccountDeposit",
         dict(fromIdx=0, toIdx=0, toEthAddr=0, auxFromIdx=260, auxToIdx=0,
              amount=0, newExit=0, loadAmount=500, newAccount=1, onChain=1),
         dict(isP1Insert=1, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=260, p1=(1, 0))),
        ("deposit",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=0, newExit=0, loadAmount=500, newAccount=0, onChain=1),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, p1=(0, 1))),
        # rollup-tx-states.test.js:81-129 — INSERT on p1 via auxFromIdx,
        # UPDATE on p2 via toIdx; tokenID2 mismatch nullifies the amount
        ("createAccountDepositTransfer",
         dict(fromIdx=0, toIdx=257, toEthAddr=0, auxFromIdx=256,
              auxToIdx=0, amount=10, newExit=0, loadAmount=30,
              newAccount=1, onChain=1, fromEthAddr=2, ethAddr1=2,
              tokenID=3, tokenID1=3, tokenID2=3),
         dict(isP1Insert=1, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, key2=257, p1=(1, 0), p2=(0, 1),
              nullifyLoadAmount=0, nullifyAmount=0)),
        ("createAccountDepositTransfer/tokenID2-mismatch",
         dict(fromIdx=0, toIdx=257, toEthAddr=0, auxFromIdx=256,
              auxToIdx=0, amount=10, newExit=0, loadAmount=30,
              newAccount=1, onChain=1, fromEthAddr=2, ethAddr1=2,
              tokenID=3, tokenID1=3, tokenID2=4),
         dict(isP1Insert=1, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, key2=257, nullifyLoadAmount=0, nullifyAmount=1)),
        # rollup-tx-states.test.js:180-244 — UPDATE/UPDATE; tokenID1
        # mismatch nullifies both the load and the amount, ethAddr1 or
        # tokenID2 mismatch only the amount
        ("depositTransfer",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=30, newAccount=0,
              onChain=1, fromEthAddr=2, ethAddr1=2, tokenID=3, tokenID1=3,
              tokenID2=3),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, key2=0, p1=(0, 1), p2=(0, 1),
              nullifyLoadAmount=0, nullifyAmount=0)),
        ("depositTransfer/tokenID1-mismatch",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=30, newAccount=0,
              onChain=1, fromEthAddr=2, ethAddr1=2, tokenID=3, tokenID1=4,
              tokenID2=3),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, nullifyLoadAmount=1, nullifyAmount=1)),
        ("depositTransfer/ethAddr1-mismatch",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=30, newAccount=0,
              onChain=1, fromEthAddr=2, ethAddr1=4, tokenID=3, tokenID1=3,
              tokenID2=3),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, nullifyLoadAmount=0, nullifyAmount=1)),
        ("depositTransfer/tokenID2-mismatch",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=30, newAccount=0,
              onChain=1, fromEthAddr=2, ethAddr1=2, tokenID=3, tokenID1=3,
              tokenID2=4),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, nullifyLoadAmount=0, nullifyAmount=1)),
        # rollup-tx-states.test.js:246-311 — forceTransfer UPDATE/UPDATE;
        # any of ethAddr1/tokenID1/tokenID2 mismatch nullifies the amount
        ("forceTransfer",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=0, newAccount=0, onChain=1,
              fromEthAddr=2, ethAddr1=2, tokenID=3, tokenID1=3,
              tokenID2=3),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, key2=0, p1=(0, 1), p2=(0, 1),
              nullifyLoadAmount=0, nullifyAmount=0)),
        ("forceTransfer/ethAddr1-mismatch",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=0, newAccount=0, onChain=1,
              fromEthAddr=2, ethAddr1=4, tokenID=3, tokenID1=3,
              tokenID2=3),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, nullifyLoadAmount=0, nullifyAmount=1)),
        ("forceTransfer/tokenID1-mismatch",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=0, newAccount=0, onChain=1,
              fromEthAddr=2, ethAddr1=2, tokenID=3, tokenID1=4,
              tokenID2=3),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, nullifyLoadAmount=0, nullifyAmount=1)),
        ("forceTransfer/tokenID2-mismatch",
         dict(fromIdx=256, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=30, newExit=0, loadAmount=0, newAccount=0, onChain=1,
              fromEthAddr=2, ethAddr1=2, tokenID=3, tokenID1=3,
              tokenID2=2),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=0,
              key1=256, nullifyLoadAmount=0, nullifyAmount=1)),
        ("forceExit",
         dict(fromIdx=256, toIdx=1, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=100, newExit=1, loadAmount=0, newAccount=0, onChain=1),
         dict(isP1Insert=0, isP2Insert=1, isExit=1, verifySign=0, nop=0,
              key1=256, key2=256, p1=(0, 1), p2=(1, 0))),
        ("transfer",
         dict(fromIdx=256, toIdx=257, toEthAddr=0, auxFromIdx=0,
              auxToIdx=0, amount=100, newExit=0, loadAmount=0,
              newAccount=0, onChain=0),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=1, nop=0,
              key1=256, key2=257, p1=(0, 1), p2=(0, 1))),
        ("exit",
         dict(fromIdx=256, toIdx=1, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=100, newExit=1, loadAmount=0, newAccount=0, onChain=0),
         dict(isP1Insert=0, isP2Insert=1, isExit=1, verifySign=1, nop=0,
              key1=256, key2=256, p1=(0, 1), p2=(1, 0))),
        ("transferToEthAddr",
         dict(fromIdx=256, toIdx=0, toEthAddr=0x1234, auxFromIdx=0,
              auxToIdx=257, amount=100, newExit=0, loadAmount=0,
              newAccount=0, onChain=0),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=1, nop=0,
              key1=256, key2=257, checkToEthAddr=1, checkToBjj=0)),
        ("transferToBjj",
         dict(fromIdx=256, toIdx=0, toEthAddr=ANY, auxFromIdx=0,
              auxToIdx=257, amount=100, newExit=0, loadAmount=0,
              newAccount=0, onChain=0),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=1, nop=0,
              key1=256, key2=257, checkToEthAddr=0, checkToBjj=1)),
        ("nop",
         dict(fromIdx=0, toIdx=0, toEthAddr=0, auxFromIdx=0, auxToIdx=0,
              amount=0, newExit=0, loadAmount=0, newAccount=0, onChain=0),
         dict(isP1Insert=0, isP2Insert=0, isExit=0, verifySign=0, nop=1,
              key1=0, p1=(0, 0), p2=(0, 0))),
    ]
    defaults = dict(fromEthAddr=0, ethAddr1=0, tokenID=1, tokenID1=1,
                    tokenID2=1)
    ins = {k: F([r[1][k] for r in rows]) for k in
           ["fromIdx", "toIdx", "toEthAddr", "auxFromIdx", "auxToIdx",
            "amount", "loadAmount"]}
    onp = {k: F([r[1].get(k, defaults[k]) for r in rows]) for k in
           ["fromEthAddr", "ethAddr1", "tokenID", "tokenID1", "tokenID2"]}
    fl = {k: flags([r[1][k] for r in rows]) for k in
          ["newExit", "newAccount", "onChain"]}
    out, ok = rollup_tx_states(
        ins["fromIdx"], ins["toIdx"], ins["toEthAddr"], ins["auxFromIdx"],
        ins["auxToIdx"], ins["amount"], fl["newExit"], ins["loadAmount"],
        fl["newAccount"], fl["onChain"],
        onp["fromEthAddr"], onp["ethAddr1"],
        onp["tokenID"], onp["tokenID1"], onp["tokenID2"])
    assert bool(np.all(np.asarray(ok)))
    key1 = fr.unpack_np(np.asarray(out["key1"]))
    key2 = fr.unpack_np(np.asarray(out["key2"]))
    for i, (name, _inp, exp) in enumerate(rows):
        assert bool(np.asarray(out["is_p1_insert"])[i]) == bool(
            exp["isP1Insert"]), name
        assert bool(np.asarray(out["is_p2_insert"])[i]) == bool(
            exp["isP2Insert"]), name
        assert bool(np.asarray(out["is_exit"])[i]) == bool(
            exp["isExit"]), name
        assert bool(np.asarray(out["verify_sign_enabled"])[i]) == bool(
            exp["verifySign"]), name
        assert bool(np.asarray(out["nop"])[i]) == bool(exp["nop"]), name
        if "key1" in exp:
            assert int(key1[i]) == exp["key1"], name
        if "key2" in exp:
            assert int(key2[i]) == exp["key2"], name
        if "p1" in exp:
            assert (bool(np.asarray(out["p1_fnc0"])[i]),
                    bool(np.asarray(out["p1_fnc1"])[i])) == \
                tuple(map(bool, exp["p1"])), name
        if "p2" in exp:
            assert (bool(np.asarray(out["p2_fnc0"])[i]),
                    bool(np.asarray(out["p2_fnc1"])[i])) == \
                tuple(map(bool, exp["p2"])), name
        if "checkToEthAddr" in exp:
            assert bool(np.asarray(out["check_to_eth_addr"])[i]) == bool(
                exp["checkToEthAddr"]), name
            assert bool(np.asarray(out["check_to_bjj"])[i]) == bool(
                exp["checkToBjj"]), name
        if "nullifyLoadAmount" in exp:
            assert bool(np.asarray(out["nullify_load_amount"])[i]) == bool(
                exp["nullifyLoadAmount"]), name
            assert bool(np.asarray(out["nullify_amount"])[i]) == bool(
                exp["nullifyAmount"]), name


def test_tx_states_l2_loadamount_fails():
    out, ok = rollup_tx_states(
        F([256]), F([257]), F([0]), F([0]), F([0]), F([10]), flags([0]),
        F([5]), flags([0]), flags([0]), F([0]), F([0]), F([1]), F([1]),
        F([1]))
    assert not bool(np.asarray(ok)[0])


# ---------------------------------------------------------------------------
# BalanceUpdater (balance-updater.circom:24-113)
# ---------------------------------------------------------------------------


def _run_bal(bal1, bal2, amount, load, fee_sel, on_chain, nop=0,
             nul_load=0, nul_amt=0):
    out, ok = balance_updater(
        F([bal1]), F([bal2]), F([amount]), F([load]),
        flags([fee_sel]), flags([on_chain]), flags([nop]),
        flags([nul_load]), flags([nul_amt]))
    res = {k: (int(fr.unpack_np(np.asarray(v))[0])
               if v.ndim == 2 else bool(np.asarray(v)[0]))
           for k, v in out.items()}
    return res, bool(np.asarray(ok)[0])


def test_balance_updater_l2_transfer_with_fee():
    # fee selector 126 ~ 10%: factor table entry applies >>60
    amount = 1000
    fee = fee_oracle(amount, 126)
    res, ok = _run_bal(5000, 300, amount, 0, 126, on_chain=0)
    assert ok
    assert res["new_balance_sender"] == 5000 - amount - fee
    assert res["new_balance_receiver"] == 300 + amount
    assert res["fee2_charge"] == fee


def test_balance_updater_l1_deposit():
    res, ok = _run_bal(100, 0, 0, 700, 200, on_chain=1)
    assert ok
    assert res["new_balance_sender"] == 800
    assert res["fee2_charge"] == 0  # no fee on L1 (:53)


def test_balance_updater_l2_underflow_fails():
    res, ok = _run_bal(50, 0, 100, 0, 0, on_chain=0)
    assert not ok


def test_balance_updater_l1_underflow_degrades():
    # L1 underflow: amount processed as 0 (:85-86)
    res, ok = _run_bal(50, 10, 100, 0, 0, on_chain=1)
    assert ok
    assert res["new_balance_sender"] == 50
    assert res["new_balance_receiver"] == 10
    assert res["is_amount_nullified"]


def test_balance_updater_nullify_load_amount():
    # reference vectors test/balance-updater.test.js:87-113: only the
    # load is nullified; the transfer amount still settles and the
    # amount-nullified flag stays low.
    res, ok = _run_bal(100, 200, 50, 50, 200, on_chain=1, nul_load=1)
    assert ok
    assert res["new_balance_sender"] == 100 - 50
    assert res["new_balance_receiver"] == 200 + 50
    assert res["fee2_charge"] == 0
    assert not res["is_amount_nullified"]
    assert res["is_p2_nop"]


def test_balance_updater_nullify_amount():
    # test/balance-updater.test.js:115-141: the transfer amount is
    # nullified but the deposit load still lands on the sender.
    res, ok = _run_bal(100, 200, 500, 50, 200, on_chain=1, nul_amt=1)
    assert ok
    assert res["new_balance_sender"] == 100 + 50
    assert res["new_balance_receiver"] == 200
    assert res["fee2_charge"] == 0
    assert res["is_amount_nullified"]


def test_balance_updater_nullify():
    res, ok = _run_bal(500, 10, 100, 200, 0, on_chain=1, nul_load=1,
                       nul_amt=1)
    assert ok
    assert res["new_balance_sender"] == 500
    assert res["new_balance_receiver"] == 10
    assert res["is_amount_nullified"]
    assert res["is_p2_nop"]  # amount != 0 -> processor 2 still active


# ---------------------------------------------------------------------------
# FeeAccumulator — reference vectors (test/fee-accumulator.test.js:27-113)
# ---------------------------------------------------------------------------

FEE_VECTORS = [
    (110, 1000, list(range(101, 117)), [1001 + i for i in range(16)],
     [1001, 1002, 1003, 1004, 1005, 1006, 1007, 1008, 1009, 2010, 1011,
      1012, 1013, 1014, 1015, 1016]),
    (103, 1000, [101, 102, 103, 103, 105, 106, 107, 108, 109, 110, 111,
                 112, 113, 114, 115, 103],
     [1001 + i for i in range(16)],
     [1001, 1002, 2003, 1004, 1005, 1006, 1007, 1008, 1009, 1010, 1011,
      1012, 1013, 1014, 1015, 1016]),
    (0, 1000, [101, 102, 103, 103, 105, 106, 107, 108, 109, 110, 111, 112,
               113, 114, 115, 103],
     [1001 + i for i in range(16)], [1001 + i for i in range(16)]),
    (0, 3000, [5, 4, 3, 2, 1, 0, 6, 7, 8, 0, 0, 0, 0, 0, 0, 0],
     [1001 + i for i in range(16)],
     [1001, 1002, 1003, 1004, 1005, 4006, 1007, 1008, 1009, 1010, 1011,
      1012, 1013, 1014, 1015, 1016]),
    (0, 1000, [0] * 16, [0] * 16, [1000] + [0] * 15),
]


def test_fee_accumulator_vectors():
    for token, fee, plan, acc_in, expected in FEE_VECTORS:
        plan_arr = jnp.stack([F([p]) for p in plan])     # (16slots,16,1)
        acc_arr = jnp.stack([F([a]) for a in acc_in])
        out = fee_accumulator(F([token]), F([fee]), plan_arr, acc_arr)
        got = [int(fr.unpack_np(np.asarray(out[i]))[0])
               for i in range(len(plan))]
        assert got == expected, (token, fee)


# ---------------------------------------------------------------------------
# RqTxVerifier (rq-tx-verifier.circom:19-94)
# ---------------------------------------------------------------------------


def test_rq_tx_verifier():
    fut = jnp.stack([F([11]), F([12]), F([13])])
    past = jnp.stack([F([21]), F([22]), F([23]), F([24])])
    zero = F([0])
    # offset 0 selects constant 0
    ok = rq_tx_verifier(fut, past, fut, past, fut, past,
                        zero, zero, zero, flags([0]))
    assert bool(np.asarray(ok)[0])
    # offset 1..3 -> future[0..2]
    for off, val in [(1, 11), (2, 12), (3, 13), (4, 24), (5, 23),
                     (6, 22), (7, 21)]:
        ok = rq_tx_verifier(fut, past, fut, past, fut, past,
                            F([val]), F([val]), F([val]), flags([off]))
        assert bool(np.asarray(ok)[0]), off
        ok = rq_tx_verifier(fut, past, fut, past, fut, past,
                            F([val + 1]), F([val]), F([val]), flags([off]))
        assert not bool(np.asarray(ok)[0]), off


# ---------------------------------------------------------------------------
# DecodeTx vs host encodings (decode-tx.circom:44-369)
# ---------------------------------------------------------------------------


def test_decode_tx_roundtrip():
    from circuits_tpu.models.decode_tx import decode_tx

    tx = dict(chainID=5, fromIdx=256, toIdx=257, tokenID=3, nonce=7,
              userFee=126, toBjjSign=True, amount=1000)
    cd = tx_utils.build_tx_compressed_data(tx)
    amount_f = float40.fix2float(1000)
    out, ok = decode_tx(
        16,
        flags([0]), F([cd]), F([0]), F([amount_f]), F([0x99]), F([7]),
        F([0]), F([0]), F([0]), F([0]),
        jnp.zeros((256, 1), dtype=jnp.uint32), F([0]),
        F([5]), F([0]), flags([0]), flags([0]), F([0]), F([0]), F([300]))
    assert bool(np.asarray(ok)[0])
    get = lambda k: int(fr.unpack_np(np.asarray(out[k]))[0])
    assert get("from_idx") == 256
    assert get("to_idx") == 257
    assert get("token_id") == 3
    assert get("nonce") == 7
    assert get("user_fee") == 126
    assert bool(np.asarray(out["to_bjj_sign"])[0])
    assert get("amount") == 1000
    assert get("out_idx") == 300
    v2 = tx_utils.build_tx_compressed_data_v2(tx)
    assert get("tx_compressed_data_v2") == v2
    # sigL2Hash matches the host oracle
    sig_tx = dict(tx, toEthAddr=0x99, toBjjAy=7, maxNumBatch=0)
    assert get("sig_l2_hash") == tx_utils.build_hash_sig(sig_tx)


def test_decode_tx_incremental_idx_and_new_account():
    """test/decode-tx.test.js:208-269: outIdx increments exactly when an
    L1 tx creates an account; auxFromIdx must match it; newAccount must
    equal (onChain & fromIdx==0)."""
    from circuits_tpu.models.decode_tx import decode_tx

    cd = tx_utils.build_tx_compressed_data(dict(chainID=0))
    zeros256 = jnp.zeros((256, 1), dtype=jnp.uint32)

    def run(on_chain, new_account, aux_from, in_idx):
        out, ok = decode_tx(
            16, flags([1]), F([cd]), F([0]), F([0]), F([0]), F([0]),
            F([0]), F([0]), F([0]), F([0]), zeros256, F([0]),
            F([0]), F([6]), flags([on_chain]), flags([new_account]),
            F([aux_from]), F([0]), F([in_idx]))
        return (int(fr.unpack_np(np.asarray(out["out_idx"]))[0]),
                bool(np.asarray(ok)[0]))

    out_idx, ok = run(1, 1, 3, 2)
    assert ok and out_idx == 3       # correct incremental: outIdx=inIdx+1
    _, ok = run(1, 1, 3, 5)
    assert not ok                    # auxFromIdx != inIdx+1
    _, ok = run(1, 0, 3, 5)
    assert not ok                    # fromIdx==0 on-chain forces newAccount
    out_idx, ok = run(0, 0, 3, 5)
    assert ok and out_idx == 5       # L2: outIdx = inIdx


def _bits_to_int(bits):
    """Device big-endian bit column (nbits, 1) -> int."""
    arr = np.asarray(bits)[:, 0]
    return int("".join(str(int(b)) for b in arr), 2)


def test_decode_tx_l1l2_tx_data():
    """test/decode-tx.test.js:271-367: the data-availability bytes of an
    L2 tx match the host encoder (fromIdx | finalToIdx | amountF | fee),
    including auxToIdx selection when toIdx == 0."""
    from circuits_tpu.models.decode_tx import decode_tx

    for to_idx, aux_to in [(257, 0), (0, 260)]:
        tx = dict(chainID=5, fromIdx=256, toIdx=to_idx, tokenID=3,
                  nonce=7, userFee=126, amount=1000)
        cd = tx_utils.build_tx_compressed_data(tx)
        out, ok = decode_tx(
            16, flags([0]), F([cd]), F([0]),
            F([float40.fix2float(1000)]), F([0]), F([0]),
            F([0]), F([0]), F([0]), F([0]),
            jnp.zeros((256, 1), dtype=jnp.uint32), F([0]),
            F([5]), F([0]), flags([0]), flags([0]), F([0]),
            F([aux_to]), F([300]))
        assert bool(np.asarray(ok)[0])
        expected = int(tx_utils.encode_l2_tx(
            dict(tx, auxToIdx=aux_to), 16), 16)
        assert _bits_to_int(out["l1l2_tx_data"]) == expected, to_idx


def test_decode_tx_l1_tx_full_data():
    """test/decode-tx.test.js:369-449: the 624-bit L1TxFullData matches
    the host encoder for an L1 tx and is all-zero for an L2 tx."""
    from circuits_tpu.models.decode_tx import decode_tx

    bjj = 0x2AB1C5F37D0099887766554433221100FFEEDDCCBBAA99887766554433221100
    bjj_bits = jnp.asarray(
        np.array([[(bjj >> i) & 1] for i in range(256)], dtype=np.uint32))
    eth, load, tok, to_idx = 0x7E5F4552091A69125D5DFCB7B8C2659029395BDF, 700, 3, 257
    tx = dict(chainID=0, fromIdx=0, toIdx=to_idx, tokenID=tok, amount=0)
    cd = tx_utils.build_tx_compressed_data(tx)
    out, ok = decode_tx(
        16, flags([1]), F([cd]), F([0]), F([0]), F([0]), F([0]),
        F([0]), F([0]), F([0]), F([eth]), bjj_bits,
        F([float40.fix2float(load)]),
        F([0]), F([0]), flags([1]), flags([1]), F([3]), F([0]), F([2]))
    assert bool(np.asarray(ok)[0])
    expected = int(tx_utils.encode_l1_tx_full(
        dict(fromEthAddr=eth, fromBjjCompressed=bjj, fromIdx=0,
             loadAmountF=float40.fix2float(load), amount=0,
             tokenID=tok, toIdx=to_idx)), 16)
    assert _bits_to_int(out["l1_tx_full_data"]) == expected

    # L2 tx: the whole word is masked to zero (decode-tx.circom:285-324)
    tx2 = dict(chainID=5, fromIdx=256, toIdx=257, tokenID=3, amount=1000)
    cd2 = tx_utils.build_tx_compressed_data(tx2)
    out2, ok2 = decode_tx(
        16, flags([0]), F([cd2]), F([0]), F([float40.fix2float(1000)]),
        F([0]), F([0]), F([0]), F([0]), F([0]), F([eth]), bjj_bits,
        F([float40.fix2float(load)]),
        F([5]), F([0]), flags([0]), flags([0]), F([0]), F([0]), F([300]))
    assert bool(np.asarray(ok2)[0])
    assert _bits_to_int(out2["l1_tx_full_data"]) == 0


def test_decode_tx_l1_before_l2_ordering():
    from circuits_tpu.models.decode_tx import decode_tx

    cd = tx_utils.build_tx_compressed_data(dict(chainID=0))
    # previous tx L2 (previousOnChain=0), current L1 -> constraint fails
    out, ok = decode_tx(
        16,
        flags([0]), F([cd]), F([0]), F([0]), F([0]), F([0]),
        F([0]), F([0]), F([0]), F([0]),
        jnp.zeros((256, 1), dtype=jnp.uint32), F([0]),
        F([0]), F([0]), flags([1]), flags([1]), F([256]), F([0]),
        F([255]))
    assert not bool(np.asarray(ok)[0])
