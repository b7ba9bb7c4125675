"""Aux builder subsystems: DA encoders, withdraw oracle, checkpointing."""

import os
import tempfile

from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40, tx_utils
from circuits_tpu.builder.withdraw_utils import hash_inputs_withdraw
from circuits_tpu.builder.state_utils import Constants

a1 = HermezAccount(1)
a2 = HermezAccount(2)


def _funded_db():
    db = RollupDB()
    bb = db.build_batch(4, 16, 2, 2)
    for acc, amt in [(a1, 1000), (a2, 2000)]:
        bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amt),
                       tokenID=1, fromBjjCompressed=acc.bjjCompressed,
                       fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
    bb.build()
    db.consolidate(bb)
    return db


def test_encoders_match_builder_da():
    db = _funded_db()
    bb = db.build_batch(4, 16, 2, 2)
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=100, userFee=32,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb.add_tx(tx)
    bb.build()
    # slot 0's L1L2 bits == encodeL2Tx hex
    l2_hex = tx_utils.encode_l2_tx(tx, 16)
    slot_bits = bb.l1l2_bits[0]
    assert int(slot_bits, 2) == int(l2_hex, 16)


def test_encode_l1_tx_full_matches_builder():
    db = RollupDB()
    bb = db.build_batch(4, 16, 2, 2)
    tx = dict(fromIdx=0, loadAmountF=float40.fix2float(1000), tokenID=1,
              fromBjjCompressed=a1.bjjCompressed, fromEthAddr=a1.ethAddr,
              toIdx=0, onChain=True)
    bb.add_tx(dict(tx))
    bb.build()
    full_hex = tx_utils.encode_l1_tx_full(tx)
    assert int(bb.l1_full_bits[0], 2) == int(full_hex, 16)


def test_db_checkpoint_roundtrip():
    db = _funded_db()
    # create an exit so exit trees serialize too
    bb = db.build_batch(4, 16, 2, 2)
    tx = dict(fromIdx=256, toIdx=Constants.exitIdx, tokenID=1, amount=300,
              userFee=0, nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb.add_tx(tx)
    bb.build()
    db.consolidate(bb)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "db.json")
        db.save(path)
        db2 = RollupDB.load(path)
    assert db2.state_tree.root == db.state_tree.root
    assert db2.last_idx == db.last_idx
    assert db2.get_state_by_idx(256) == db.get_state_by_idx(256)
    info = db.get_exit_tree_info(256, 2)
    info2 = db2.get_exit_tree_info(256, 2)
    assert info["root"] == info2["root"]
    assert info["state"] == info2["state"]


def test_withdraw_oracle_value():
    h = hash_inputs_withdraw(dict(rootExit=123, ethAddr="0xabc",
                                  tokenID=1, balance=500, idx=256))
    assert 0 < h < (1 << 254)
