"""Batch-builder (host golden model) tests replicating the reference's
rollup-main scenarios with exact balance assertions
(test/rollup-main.test.js; host-only — no device compilation)."""

import pytest

from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.builder.state_utils import Constants

NTX, NLEV, ML1, MFT = 3, 16, 2, 2

a1 = HermezAccount(1)
a2 = HermezAccount(2)
a3 = HermezAccount(3)
IDX1, IDX2, IDX3 = 256, 257, 258


def deposit(bb, acc, token, amount):
    bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amount),
                   tokenID=token, fromBjjCompressed=acc.bjjCompressed,
                   fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))


def balances(db, idxs):
    return [db.get_state_by_idx(i)["balance"]
            if db.get_state_by_idx(i) else None for i in idxs]


def test_empty_batch():
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT).build()
    assert bb.get_new_state_root() == 0
    assert bb.get_hash_inputs() > 0


def test_create_account_and_deposits():
    # test/rollup-main.test.js:73-118
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    bb.build()
    db.consolidate(bb)
    assert db.get_state_by_idx(IDX1)["balance"] == 1000
    assert db.last_idx == 256

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=IDX1, loadAmountF=500, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=0, toIdx=0,
                    amount=0, userFee=0, onChain=True))
    bb2.build()
    db.consolidate(bb2)
    assert db.get_state_by_idx(IDX1)["balance"] == 1500


def test_deposit_transfer_and_force_txs():
    # createAccountDepositTransfer + depositTransfer (:120-164)
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    deposit(bb, a2, 1, 1000)
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=0, loadAmountF=500, tokenID=1,
                    fromBjjCompressed=a3.bjjCompressed,
                    fromEthAddr=a3.ethAddr, toIdx=IDX1, amount=100,
                    userFee=0, onChain=True))
    bb2.add_tx(dict(fromIdx=IDX3, loadAmountF=200, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a3.ethAddr,
                    toIdx=IDX2, amount=100, userFee=126, onChain=True))
    bb2.build()
    db.consolidate(bb2)
    assert balances(db, [IDX1, IDX2, IDX3]) == [1100, 1100, 500]


def test_force_transfer_and_force_exit():
    # :166-244
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    deposit(bb, a2, 1, 1000)
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_tx(dict(fromIdx=IDX1, loadAmountF=0, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=IDX2, amount=100, userFee=0, onChain=True))
    bb2.add_tx(dict(fromIdx=IDX1, loadAmountF=0, tokenID=1,
                    fromBjjCompressed=0, fromEthAddr=a1.ethAddr,
                    toIdx=Constants.exitIdx, amount=300, userFee=0,
                    onChain=True))
    bb2.build()
    db.consolidate(bb2)
    assert balances(db, [IDX1, IDX2]) == [600, 1100]
    exit_info = db.get_exit_tree_info(IDX1, 2)
    assert exit_info["state"]["balance"] == 300

    # two L1 exits same batch accumulate in one exit leaf (:237-243)
    bb3 = db.build_batch(NTX, NLEV, ML1, MFT)
    for _ in range(2):
        bb3.add_tx(dict(fromIdx=IDX2, loadAmountF=0, tokenID=1,
                        fromBjjCompressed=0, fromEthAddr=a2.ethAddr,
                        toIdx=Constants.exitIdx, amount=550, userFee=0,
                        onChain=True))
    bb3.build()
    db.consolidate(bb3)
    assert balances(db, [IDX1, IDX2]) == [600, 0]
    assert db.get_exit_tree_info(IDX2, 3)["state"]["balance"] == 1100


def test_l2_transfer_and_exit():
    # :246-341
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    deposit(bb, a2, 1, 1000)
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=IDX1, toIdx=IDX2, tokenID=1, amount=100, userFee=0,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    tx2 = dict(fromIdx=IDX2, toIdx=Constants.exitIdx, tokenID=1,
               amount=100, userFee=0, nonce=0, onChain=0)
    a2.sign_tx(tx2)
    bb2.add_tx(tx)
    bb2.add_tx(tx2)
    bb2.build()
    db.consolidate(bb2)
    assert balances(db, [IDX1, IDX2]) == [900, 1000]

    # two exits same batch: 525 + 450 (:304-341)
    bb3 = db.build_batch(NTX, NLEV, ML1, MFT)
    for amt, nonce in [(525, 1), (450, 2)]:
        t = dict(fromIdx=IDX2, toIdx=Constants.exitIdx, tokenID=1,
                 amount=amt, userFee=0, nonce=nonce, onChain=0)
        a2.sign_tx(t)
        bb3.add_tx(t)
    bb3.build()
    db.consolidate(bb3)
    assert balances(db, [IDX1, IDX2]) == [900, 25]
    assert db.get_exit_tree_info(IDX2, 3)["state"]["balance"] == 975


def test_l2_fees_exact_reference_balances():
    # "L2 'transfer' with fees & L2 'fee' txs" (:479-553): final balances
    # [722, 1049, 129] pin the fee table + fee-tx semantics exactly.
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    deposit(bb, a2, 1, 1000)
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb2, a3, 1, 0)
    tx = dict(fromIdx=IDX1, toIdx=IDX2, tokenID=1, amount=150,
              userFee=126, nonce=0, onChain=0)
    a1.sign_tx(tx)
    tx2 = dict(fromIdx=IDX2, toIdx=Constants.exitIdx, tokenID=1,
               amount=100, userFee=68, nonce=0, onChain=0)
    a2.sign_tx(tx2)
    bb2.add_tx(tx)
    bb2.add_tx(tx2)
    bb2.add_token(1)
    bb2.add_fee_idx(IDX3)
    bb2.build()
    db.consolidate(bb2)

    bb3 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx3 = dict(fromIdx=IDX1, toIdx=IDX1, tokenID=1, amount=150,
               userFee=184, nonce=1, onChain=0)
    a1.sign_tx(tx3)
    bb3.add_tx(tx3)
    bb3.add_token(1)
    bb3.add_fee_idx(IDX3)
    bb3.build()
    db.consolidate(bb3)

    assert balances(db, [IDX1, IDX2, IDX3]) == [722, 1049, 129]


def test_transfer_to_eth_addr_and_bjj():
    # :555-617: toIdx=0 resolved by the coordinator
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    deposit(bb, a2, 1, 1000)
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=IDX1, toIdx=0, tokenID=1, amount=100, userFee=0,
              nonce=0, onChain=0, toEthAddr=a2.ethAddr)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    tx2 = dict(fromIdx=IDX2, toIdx=0, tokenID=1, amount=50, userFee=0,
               nonce=0, onChain=0, toEthAddr=hex(Constants.nullEthAddr),
               toBjjAy=a1.ay, toBjjSign=a1.sign)
    a2.sign_tx(tx2)
    bb2.add_tx(tx2)
    bb2.build()
    db.consolidate(bb2)
    assert balances(db, [IDX1, IDX2]) == [950, 1050]
    # auxToIdx was resolved to the receiver account
    assert bb2.get_input()["auxToIdx"][0] == IDX2
    assert bb2.get_input()["auxToIdx"][1] == IDX1


def test_l2_nonce_and_underflow_rejected():
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 100)
    deposit(bb, a2, 1, 100)
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=IDX1, toIdx=IDX2, tokenID=1, amount=500, userFee=0,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    with pytest.raises(ValueError, match="underflow"):
        bb2.build()

    bb3 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=IDX1, toIdx=IDX2, tokenID=1, amount=10, userFee=0,
              nonce=5, onChain=0)
    a1.sign_tx(tx)
    bb3.add_tx(tx)
    with pytest.raises(ValueError, match="nonce"):
        bb3.build()


def test_l1_invalid_token_nullified():
    # rollup-main-L1 tests: depositTransfer with wrong tokenID nullifies
    # the transfer amount but keeps the deposit
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    deposit(bb, a2, 2, 1000)
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    # L1 depositTransfer from a1 (token 1) to a2 (token 2): tokenID2
    # mismatch -> nullifyAmount; load still applies
    bb2.add_tx(dict(fromIdx=IDX1, loadAmountF=float40.fix2float(100),
                    tokenID=1, fromBjjCompressed=0,
                    fromEthAddr=a1.ethAddr, toIdx=IDX2, amount=50,
                    userFee=0, onChain=True))
    bb2.build()
    db.consolidate(bb2)
    assert balances(db, [IDX1, IDX2]) == [1100, 1000]
    assert bb2.padded_txs[0]["isAmountNullified"]


def test_hash_inputs_matches_preimage_structure():
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 1000)
    bb.build()
    bits = bb.get_inputs_str()
    # L1TxFullData = 2*48 + 32 + 40 + 40 + 256 + 160 = 624 bits per slot
    # (src/hash-inputs.circom:30)
    expected_len = (2 * 48 + 3 * 256 + 16 + 32
                    + ML1 * 624 + NTX * (2 * NLEV + 48) + MFT * NLEV)
    assert len(bits) == expected_len
    assert bb.get_hash_inputs() < (1 << 254)
