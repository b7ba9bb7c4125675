"""The full 11-tx-type single-instance battery (VERDICT r4 task #6).

Every `it(...)` block of /root/reference/test/rollup-tx.test.js maps to a
named test here (line anchors in each docstring). The assertTxs pattern:
build a real batch, slice each lane into ONE RollupTx instance input
(tests/single_tx.py, the getSingleTxInput equivalent), evaluate it, and
assert per-lane ok + state/exit roots + accumulated fees against the
builder's im chains.
"""

from functools import partial

import numpy as np
import jax
import pytest

from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.builder.state_utils import Constants
from circuits_tpu.field import fr
from circuits_tpu.models.rollup_tx import rollup_tx

from tests.single_tx import batch_tx_inputs, get_single_tx_input

NTX, NLEV, ML1, MFT = 4, 16, 2, 2

a1, a2, a3 = HermezAccount(1), HermezAccount(2), HermezAccount(3)


def deposit(bb, acc, token, amount):
    bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amount),
                   tokenID=token, fromBjjCompressed=acc.bjjCompressed,
                   fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))


@pytest.fixture(scope="module")
def run_one():
    return jax.jit(partial(rollup_tx, n_levels=NLEV))


def assert_txs(bb, run_one):
    """assertTxs: every lane's single RollupTx instance must be ok and
    reproduce the im-chain roots and fee accumulators."""
    tx_in, chains = batch_tx_inputs(bb)
    for i in range(NTX):
        single = get_single_tx_input(tx_in, i)
        out, ok = run_one(single)
        assert bool(np.asarray(ok)[0]), f"lane {i} flagged"
        got_root = fr.unpack_int(np.asarray(out["new_state_root"]))
        want_root = fr.unpack_int(
            np.asarray(chains["expected_state_root"][..., i:i + 1]))
        assert got_root == want_root, f"lane {i} state root"
        got_fees = [fr.unpack_int(np.asarray(out["acc_fee_out"][f]))
                    for f in range(MFT)]
        want_fees = [fr.unpack_int(
            np.asarray(chains["expected_acc_fee"][f, :, i:i + 1]))
            for f in range(MFT)]
        assert got_fees == want_fees, f"lane {i} fees"


def _state(*deposits):
    """newState(): one deposit batch, consolidated."""
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    for acc, token, amount in deposits:
        deposit(bb, acc, token, amount)
    bb.build()
    db.consolidate(bb)
    return db


def test_nop_tx(run_one):
    """rollup-tx.test.js:56 — an empty batch: all-NOP lanes."""
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    bb.build()
    assert_txs(bb, run_one)


def test_l1_create_account(run_one):
    """:65 — createAccount (deposit 0)."""
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 0)
    bb.build()
    assert_txs(bb, run_one)


def test_l1_create_account_deposit(run_one):
    """:75 — createAccountDeposit."""
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    bb.build()
    assert_txs(bb, run_one)


def test_l1_create_account_deposit_transfer(run_one):
    """:85 — createAccountDepositTransfer."""
    db = _state((a1, 1, 1000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=0, loadAmountF=500, tokenID=1,
                    fromBjjCompressed=a2.bjjCompressed,
                    fromEthAddr=a2.ethAddr, toIdx=256, amount=100,
                    userFee=0, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_l1_deposit(run_one):
    """:112 — deposit into an existing account."""
    db = _state((a1, 1, 1000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=500, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=0, toIdx=0,
                    amount=0, userFee=0, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_l1_deposit_transfer(run_one):
    """:139 — depositTransfer."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=200, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=257, amount=100, userFee=126, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_l1_force_transfer(run_one):
    """:167 — forceTransfer: amount != 0, amount = 0, and both."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    tx = dict(fromIdx=256, loadAmountF=0, tokenID=1, fromBjjCompressed=0,
              fromEthAddr=a1.ethAddr, toIdx=257, amount=100, userFee=0,
              onChain=True)
    for txs in ([tx], [dict(tx, amount=0)], [tx, dict(tx, amount=0)]):
        bb = db.build_batch(NTX, NLEV, ML1, MFT)
        for t in txs:
            bb.add_tx(dict(t))
        bb.build()
        assert_txs(bb, run_one)


def test_l1_force_exit(run_one):
    """:216 — forceExit: single, double, 0-amount, mixed."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    tx = dict(fromIdx=256, loadAmountF=0, tokenID=1, fromBjjCompressed=0,
              fromEthAddr=a1.ethAddr, toIdx=Constants.exitIdx,
              amount=100, userFee=0, onChain=True)
    for txs in ([tx], [tx, tx], [dict(tx, amount=0)],
                [tx, dict(tx, amount=0)]):
        bb = db.build_batch(NTX, NLEV, ML1, MFT)
        for t in txs:
            bb.add_tx(dict(t))
        bb.build()
        assert_txs(bb, run_one)


def test_l2_transfer(run_one):
    """:275 — transfer: amount != 0, amount = 0, and both."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    base = dict(fromIdx=256, toIdx=257, tokenID=1, amount=100,
                userFee=184, nonce=0, onChain=0)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(base)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    bb2.add_token(1)
    bb2.build()
    assert_txs(bb2, run_one)

    bb3 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx2 = dict(base, amount=0)
    a1.sign_tx(tx2)
    bb3.add_tx(tx2)
    bb3.add_token(1)
    bb3.build()
    assert_txs(bb3, run_one)

    bb4 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx3 = dict(base)
    tx4 = dict(base, amount=0, nonce=1)
    a1.sign_tx(tx3)
    a1.sign_tx(tx4)
    bb4.add_tx(tx3)
    bb4.add_tx(tx4)
    bb4.add_token(1)
    bb4.build()
    assert_txs(bb4, run_one)


def test_l2_exit(run_one):
    """:339 — exit: single, double, 0-amount, mixed."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    base = dict(fromIdx=256, toIdx=Constants.exitIdx, tokenID=1,
                amount=100, userFee=184, nonce=0, onChain=0)

    for spec in ([dict(base)],
                 [dict(base), dict(base, nonce=1)],
                 [dict(base, amount=0)],
                 [dict(base, amount=0), dict(base, amount=0, nonce=1)]):
        bb = db.build_batch(NTX, NLEV, ML1, MFT)
        for t in spec:
            a1.sign_tx(t)
            bb.add_tx(t)
        bb.build()
        assert_txs(bb, run_one)


def test_l2_transfer_to_eth_addr(run_one):
    """:414 — transferToEthAddr."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=256, toIdx=Constants.nullIdx, toEthAddr=a2.ethAddr,
              tokenID=1, amount=50, nonce=0, userFee=126, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    bb2.build()
    assert_txs(bb2, run_one)


def test_l2_transfer_to_bjj(run_one):
    """:443 — transferToBjj via a coordinator-created Bjj account."""
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(1000),
                   tokenID=1, fromBjjCompressed=a2.bjjCompressed,
                   fromEthAddr=Constants.nullEthAddr, toIdx=0,
                   onChain=True))
    bb.build()
    db.consolidate(bb)
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=256, toIdx=Constants.nullIdx,
              toEthAddr=Constants.nullEthAddr, toBjjAy=a2.ay,
              toBjjSign=a2.sign, tokenID=1, amount=50, nonce=0,
              userFee=126, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    bb2.build()
    assert_txs(bb2, run_one)


def test_l1_create_account_deposit_invalid_bjj(run_one):
    """:483 — garbage Bjj key still creates the account on L1."""
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    bb.add_tx(dict(fromIdx=0, loadAmountF=1000, tokenID=1,
                   fromBjjCompressed=0x123456, fromEthAddr=0x123456789,
                   toIdx=0, onChain=True))
    bb.build()
    assert_txs(bb, run_one)


def test_nullifiers_l1_create_account_deposit_transfer(run_one):
    """:501 — wrong tokenID receiver -> nullifyAmount."""
    db = _state((a1, 1, 1000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=0, loadAmountF=500, tokenID=2,
                    fromBjjCompressed=a2.bjjCompressed,
                    fromEthAddr=a2.ethAddr, toIdx=256, amount=100,
                    userFee=0, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_nullifiers_l1_deposit(run_one):
    """:528 — deposit with wrong tokenID -> nullifyLoadAmount."""
    db = _state((a1, 1, 1000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=500, tokenID=2,
                    fromBjjCompressed=0, fromEthAddr=0, toIdx=0,
                    amount=0, userFee=0, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_nullifiers_l1_deposit_transfer_part1(run_one):
    """:555 — ethAddr mismatch nullifies amount; wrong tokenID nullifies
    both loadAmount and amount."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=500, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a2.ethAddr,
                    toIdx=257, amount=100, userFee=126, onChain=True))
    bb2.add_tx(dict(fromIdx=256, loadAmountF=500, tokenID=2,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=257, amount=100, userFee=126, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_nullifiers_l1_deposit_transfer_part2(run_one):
    """:600 — receiver tokenID mismatch (same-batch created account)."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb2, a3, 2, 3000)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=500, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a2.ethAddr,
                    toIdx=258, amount=100, userFee=126, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_nullifiers_l1_deposit_transfer_part3(run_one):
    """:632 — sender tokenID mismatch nullifies loadAmount + amount."""
    db = _state((a1, 1, 1000), (a2, 2, 2000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=500, tokenID=2,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=257, amount=100, userFee=126, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_nullifiers_l1_force_transfer(run_one):
    """:662 — the three forceTransfer nullifier cases."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=0, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a2.ethAddr,
                    toIdx=257, amount=100, userFee=0, onChain=True))
    bb2.build()

    bb3 = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb3, a3, 2, 3000)
    bb3.add_tx(dict(fromIdx=258, loadAmountF=0, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a3.ethAddr,
                    toIdx=257, amount=100, userFee=0, onChain=True))
    bb3.build()

    bb4 = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb4, a3, 2, 3000)
    bb4.add_tx(dict(fromIdx=256, loadAmountF=0, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=258, amount=100, userFee=0, onChain=True))
    bb4.build()

    for bb in (bb2, bb3, bb4):
        assert_txs(bb, run_one)


def test_underflow_l1_force_transfer(run_one):
    """:730 — L1 underflow degrades to a nullified amount."""
    db = _state((a1, 1, 1000), (a2, 1, 2000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=0, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=257, amount=1100, userFee=0, onChain=True))
    bb2.build()
    assert_txs(bb2, run_one)


def test_nullifiers_l1_force_exit(run_one):
    """:759 — nullified exits still insert 0-balance exit leaves."""
    db = _state((a1, 1, 1000), (a2, 2, 1000))
    ex = dict(fromIdx=256, loadAmountF=0, tokenID=1, fromBjjCompressed=0,
              fromEthAddr=a1.ethAddr, toIdx=Constants.exitIdx,
              amount=100, userFee=0, onChain=True)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(ex, fromEthAddr=a2.ethAddr))  # ethAddr mismatch
    bb2.add_tx(dict(ex))                           # real exit
    bb2.build()

    bb3 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb3.add_tx(dict(ex, tokenID=2))                # tokenID mismatch
    bb3.add_tx(dict(ex))
    bb3.build()

    bb4 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb4.add_tx(dict(ex))
    bb4.add_tx(dict(ex, fromIdx=257))              # wrong-token leaf
    bb4.build()

    for bb in (bb2, bb3, bb4):
        assert_txs(bb, run_one)


def test_l1_error_force_exit(run_one):
    """:872 — tampering tokenID1 of a single-instance input must flag a
    constraint failure (the "Constraint doesn't match" path)."""
    db = _state((a1, 1, 1000))
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=256, loadAmountF=0, tokenID=2,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=Constants.exitIdx, amount=100, userFee=0,
                    onChain=True))
    bb2.add_tx(dict(fromIdx=256, loadAmountF=0, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=Constants.exitIdx, amount=100, userFee=0,
                    onChain=True))
    bb2.build()
    tx_in, _ = batch_tx_inputs(bb2)
    single = get_single_tx_input(tx_in, 1)
    single = dict(single, token_id1=fr.pack([2]))
    _, ok = run_one(single)
    assert not bool(np.asarray(ok)[0])
