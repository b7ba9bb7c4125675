"""Signal-by-name tracing (printSignals equivalent) vs the host oracle.

Asserts >20 named internal signals of a mixed batch — L1 deposit lane +
L2 transfer lane — against independently computed expected values
(builder golden model + host crypto), the way the reference's
printSignals/getSignal debugging reads arbitrary witness signals
(test/helpers/helpers.js:168-188).
"""

import pytest

from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.builder.state_utils import hash_state
from circuits_tpu.builder.tx_utils import (build_hash_sig,
                                           build_tx_compressed_data_v2)
from circuits_tpu.builder.fee_table import compute_fee
from circuits_tpu.engine.witness import RollupEngine

NTX, NLEV, ML1, MFT = 3, 16, 2, 2

a1 = HermezAccount(1)
a2 = HermezAccount(2)
AMOUNT, FEE_SEL = 150, 126


@pytest.fixture(scope="module")
def traced():
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    for acc, amt in [(a1, 1000), (a2, 1000)]:
        bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amt),
                       tokenID=1, fromBjjCompressed=acc.bjjCompressed,
                       fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
    bb.build()
    db.consolidate(bb)
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_token(1)
    bb2.add_fee_idx(256)
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=AMOUNT,
              userFee=FEE_SEL, nonce=0, onChain=0)
    a1.sign_tx(tx)
    # lane 1: L1 deposit on top of the transfer lane
    l1 = dict(fromIdx=256, loadAmountF=float40.fix2float(500), tokenID=1,
              fromBjjCompressed=0, fromEthAddr=a1.ethAddr, toIdx=0,
              onChain=True)
    bb2.add_tx(l1)   # lane 0: L1 deposit (L1 txs come first)
    bb2.add_tx(tx)   # lane 1: L2 transfer
    bb2.build()
    eng = RollupEngine(NTX, NLEV, ML1, MFT)
    return eng, bb2, eng.trace(bb2.get_input()), tx


def test_lane_ok_and_decode_signals(traced):
    _, bb2, tr, tx = traced
    assert tr["lane_ok"] == [True, True, True]
    # lane 1 (L2 transfer) decode signals
    assert tr["decode.fromIdx"][1] == 256
    assert tr["decode.toIdx"][1] == 257
    assert tr["decode.tokenID"][1] == 1
    assert tr["decode.nonce"][1] == 0
    assert tr["decode.userFee"][1] == FEE_SEL
    assert tr["decode.amount"][1] == AMOUNT
    assert tr["decode.sigL2Hash"][1] == build_hash_sig(tx)
    assert tr["decode.txCompressedDataV2"][1] == \
        build_tx_compressed_data_v2(tx)
    # no account creation anywhere: out idx stays at the last index
    assert tr["outIdx"] == [257, 257, 257]


def test_states_signals(traced):
    _, _, tr, _ = traced
    # lane 1: UPDATE both processors, signature verified, no exit
    assert tr["states.key1"][1] == 256
    assert tr["states.key2"][1] == 257
    assert (tr["states.P1_fnc0"][1], tr["states.P1_fnc1"][1]) == (0, 1)
    assert (tr["states.P2_fnc0"][1], tr["states.P2_fnc1"][1]) == (0, 1)
    assert tr["states.verifySignEnabled"] == [0, 1, 0]
    assert tr["states.isExit"] == [0, 0, 0]
    assert tr["states.nullifyLoadAmount"] == [0, 0, 0]
    assert tr["states.nullifyAmount"] == [0, 0, 0]
    # lane 2 (NOP): both processors NOP
    assert (tr["states.P1_fnc0"][2], tr["states.P1_fnc1"][2]) == (0, 0)


def test_balance_updater_signals(traced):
    _, _, tr, _ = traced
    fee = compute_fee(AMOUNT, FEE_SEL)
    # lane 0: deposit of 500 onto a1 (before the transfer)
    assert tr["balanceUpdater.newStBalanceSender"][0] == 1500
    assert tr["decodeLoadAmount"][0] == 500
    # lane 1: the transfer out of the post-deposit balance
    assert tr["balanceUpdater.fee2Charge"][1] == fee
    assert tr["balanceUpdater.newStBalanceSender"][1] == \
        1500 - AMOUNT - fee
    assert tr["balanceUpdater.newStBalanceReceiver"][1] == 1000 + AMOUNT
    assert tr["balanceUpdater.isAmountNullified"] == [0, 0, 0]


def test_hash_state_and_root_signals(traced):
    _, bb2, tr, _ = traced
    fee = compute_fee(AMOUNT, FEE_SEL)
    # newStHash1 of lane 0 = HashState of the post-transfer sender leaf
    expect = hash_state(dict(tokenID=1, nonce=1, sign=a1.sign,
                             balance=1500 - AMOUNT - fee, ay=a1.ay,
                             ethAddr=a1.ethAddr))
    assert tr["newStHash1"][1] == expect
    # sigAx recovers the signer's ax
    assert tr["sigAx"][1] == a1.ax
    # per-lane roots chain into the batch result
    assert tr["newStateRoot"][2] == bb2.get_input()["imInitStateRootFee"]
    assert tr["processor2.newRoot"][1] == tr["newStateRoot"][1]


def test_get_signal_lane_indexing(traced):
    eng, bb2, _, _ = traced
    inp = bb2.get_input()
    assert eng.get_signal(inp, "states.key1[1]") == 256
    assert eng.get_signal(inp, "decode.tokenID") == [1, 1, 0]
    with pytest.raises(KeyError):
        eng.get_signal(inp, "not.a.signal")
