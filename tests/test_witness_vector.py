"""Full witness-vector export + independent re-verification.

The prover-handoff contract (reference: the native calculator writes
every signal to witness.json for snarkjs, tools/helpers/actions.js:
132-146): export the canonical vector for real (3,16,2,2) scenarios,
then (a) re-check every r1cs residual FROM THE EXPORTED VECTOR ALONE
(pure-Python, zero JAX — r1cs/witness_check.py), (b) confirm the vector
covers every SIGNALS-catalog value, (c) round-trip the snarkjs .wtns
container, and (d) prove tampering is detected.
"""

import pytest

from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.engine.witness import RollupEngine
from circuits_tpu.engine import witness_vector as wv
from circuits_tpu.r1cs.witness_check import verify_witness

NTX, NLEV, ML1, MFT = 3, 16, 2, 2
PARAMS = (NTX, NLEV, ML1, MFT)

a1 = HermezAccount(1)
a2 = HermezAccount(2)


def deposit(bb, acc, token, amount):
    bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amount),
                   tokenID=token, fromBjjCompressed=acc.bjjCompressed,
                   fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))


@pytest.fixture(scope="module")
def engine():
    return RollupEngine(*PARAMS)


@pytest.fixture(scope="module")
def batches():
    """Two consecutive real batches: an L1 deposit batch (INSERTs) and an
    L2 transfer + exit batch with fees (UPDATEs, exit-tree INSERT,
    EdDSA)."""
    db = RollupDB()
    bb1 = db.build_batch(*PARAMS)
    deposit(bb1, a1, 1, 10_000)
    deposit(bb1, a2, 1, 10_000)
    bb1.build()
    db.consolidate(bb1)

    bb2 = db.build_batch(*PARAMS)
    bb2.add_token(1)
    bb2.add_fee_idx(257)
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=1000,
              userFee=126, nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    exit_tx = dict(fromIdx=257, toIdx=1, tokenID=1, amount=500,
                   userFee=126, nonce=0, onChain=0)
    a2.sign_tx(exit_tx)
    bb2.add_tx(exit_tx)
    bb2.build()
    db.consolidate(bb2)
    return bb1, bb2


@pytest.fixture(scope="module")
def exported(engine, batches):
    bb1, bb2 = batches
    return [wv.export_witness(engine, bb.get_input())
            for bb in (bb1, bb2)]


def test_vector_is_canonical_and_complete(exported):
    names = wv.signal_names(*PARAMS)
    for got_names, values in exported:
        assert got_names == names
        assert len(values) == len(names)
        assert len(set(names)) == len(names), "duplicate signal names"
        assert values[0] == 1  # w[0] = 1, the circom convention


def test_residuals_from_vector_alone(exported):
    """(b): every reference `===` relation re-checked in pure Python
    from the exported vector, with no engine involvement."""
    for names, values in exported:
        w = dict(zip(names, values))
        res = verify_witness(w, *PARAMS)
        assert res["ok"], f"failures: {res['failures'][:10]}"
        # the full circuit's relation count at this shape is substantial
        assert res["n_checked"] > 1000


def test_output_matches_oracle(exported, batches):
    for (names, values), bb in zip(exported, batches):
        w = dict(zip(names, values))
        assert w["main.hashGlobalInputs"] == bb.get_hash_inputs()
        assert w["main.newStateRoot"] == bb.get_new_state_root()
        assert w["main.newExitRoot"] == bb.get_new_exit_root()


# trace-catalog name -> canonical witness name (per lane i)
_CATALOG_MAP = {
    "decode.fromIdx": "main.Decoder[{i}].fromIdx",
    "decode.toIdx": "main.Decoder[{i}].toIdx",
    "decode.tokenID": "main.Decoder[{i}].tokenID",
    "decode.nonce": "main.Decoder[{i}].nonce",
    "decode.userFee": "main.Decoder[{i}].userFee",
    "decode.amount": "main.Decoder[{i}].amount",
    "decode.toBjjSign": "main.Decoder[{i}].toBjjSign",
    "decode.sigL2Hash": "main.Decoder[{i}].sigL2Hash",
    "decode.newAccountIdx": "main.Decoder[{i}].outIdx",
    "decode.txCompressedDataV2": "main.Decoder[{i}].txCompressedDataV2",
    "states.key1": "main.Tx[{i}].states.key1",
    "states.key2": "main.Tx[{i}].states.key2",
    "states.P1_fnc0": "main.Tx[{i}].states.P1_fnc0",
    "states.P1_fnc1": "main.Tx[{i}].states.P1_fnc1",
    "states.P2_fnc0": "main.Tx[{i}].states.P2_fnc0",
    "states.P2_fnc1": "main.Tx[{i}].states.P2_fnc1",
    "states.isExit": "main.Tx[{i}].states.isExit",
    "states.verifySignEnabled": "main.Tx[{i}].states.verifySignEnabled",
    "states.nullifyLoadAmount": "main.Tx[{i}].states.nullifyLoadAmount",
    "states.nullifyAmount": "main.Tx[{i}].states.nullifyAmount",
    "balanceUpdater.newStBalanceSender":
        "main.Tx[{i}].balance.newStBalanceSender",
    "balanceUpdater.newStBalanceReceiver":
        "main.Tx[{i}].balance.newStBalanceReceiver",
    "balanceUpdater.fee2Charge": "main.Tx[{i}].balance.fee2Charge",
    "balanceUpdater.isP2Nop": "main.Tx[{i}].balance.isP2Nop",
    "balanceUpdater.isAmountNullified":
        "main.Tx[{i}].balance.isAmountNullified",
    "decodeLoadAmount": "main.Tx[{i}].decodeLoadAmount",
    "oldStHash1": "main.Tx[{i}].oldStHash1",
    "oldStHash2": "main.Tx[{i}].oldStHash2",
    "newStHash1": "main.Tx[{i}].newStHash1",
    "newStHash2": "main.Tx[{i}].newStHash2",
    "sigAx": "main.Tx[{i}].sigAx",
    "processor1.newRoot": "main.Tx[{i}].P1.newRoot",
    "processor2.newRoot": "main.Tx[{i}].P2.newRoot",
    "newStateRoot": "main.Tx[{i}].newStateRoot",
    "newExitRoot": "main.Tx[{i}].newExitRoot",
    "outIdx": "main.Decoder[{i}].outIdx",
    "isAmountNullified": "main.Tx[{i}].isAmountNullified",
}


def test_covers_signals_catalog(engine, batches, exported):
    """(c): every trace/SIGNALS catalog value appears in the exported
    vector with an identical value, lane by lane."""
    _, bb2 = batches
    names, values = exported[1]
    w = dict(zip(names, values))
    tr = engine.trace(bb2.get_input())
    assert set(_CATALOG_MAP) == set(engine.SIGNALS), \
        "catalog map out of sync with engine.SIGNALS"
    for cat_name, tmpl in _CATALOG_MAP.items():
        for i, v in enumerate(tr[cat_name]):
            assert w[tmpl.format(i=i)] == int(v), (cat_name, i)
    # accFeeOut (the extra trace entry) too
    for j, col in enumerate(tr["accFeeOut"]):
        for i, v in enumerate(col):
            assert w[f"main.Tx[{i}].accFeeOut[{j}]"] == int(v)


def test_wtns_roundtrip(tmp_path, exported):
    names, values = exported[1]
    p = tmp_path / "w.wtns"
    s = tmp_path / "w.wtns.sym.json"
    wv.write_wtns(p, values)
    wv.write_sym(s, names)
    # container structure: snarkjs-compatible magic/version/sections
    raw = p.read_bytes()
    assert raw[:4] == b"wtns"
    loaded = wv.load_witness(p, s)
    assert loaded == dict(zip(names, values))


def test_withdraw_witness_vector(batches):
    """Full witness vector for the Withdraw circuit: export a real
    exit-proof batch, re-verify every relation from the vector alone,
    and detect tampering."""
    from circuits_tpu.engine.witness import WithdrawEngine
    from circuits_tpu.r1cs.witness_check import verify_withdraw_witness
    from circuits_tpu.builder.rollup_db import RollupDB

    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    deposit(bb, a1, 1, 2000)
    bb.build()
    db.consolidate(bb)
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=256, toIdx=1, tokenID=1, amount=400, userFee=0,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    bb2.build()
    db.consolidate(bb2)

    info = db.get_exit_tree_info(256, db.last_batch)
    st = info["state"]
    winp = dict(rootExit=info["root"], ethAddr=st["ethAddr"],
                tokenID=st["tokenID"], balance=st["balance"], idx=256,
                sign=st["sign"], ay=st["ay"],
                siblingsState=info["siblings"])
    eng = WithdrawEngine(NLEV)
    names, values = wv.export_witness_withdraw(eng, [winp])
    assert names == wv.signal_names_withdraw(NLEV, 1)
    w = dict(zip(names, values))
    res = verify_withdraw_witness(w, NLEV, 1)
    assert res["ok"], res["failures"][:5]

    w2 = dict(w)
    w2["main.balance[0]"] += 1
    assert not verify_withdraw_witness(w2, NLEV, 1)["ok"]
    w3 = dict(w)
    w3["main.stateHash[0]"] ^= 1
    assert not verify_withdraw_witness(w3, NLEV, 1)["ok"]


def test_tamper_detected(exported):
    names, values = exported[1]
    w = dict(zip(names, values))
    # corrupt one internal signal: a state hash
    w2 = dict(w)
    w2["main.Tx[0].newStHash1"] = (w2["main.Tx[0].newStHash1"] + 1) % \
        (2**254)
    res = verify_witness(w2, *PARAMS)
    assert not res["ok"]
    # corrupt an input: balance1 changes the old leaf hash chain
    w3 = dict(w)
    w3["main.balance1[0]"] += 1
    res3 = verify_witness(w3, *PARAMS)
    assert not res3["ok"]
