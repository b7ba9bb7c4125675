"""FeeTx component tests (port of reference test/fee-tx.test.js):
empty fee-tx, non-change on root, real fee payment vs the builder's
imStateRootFee chain, and the wrong-tokenID failure."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P
from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.models.fee_tx import fee_tx

rng = random.Random(41)
NLEV = 16

jfee_tx = jax.jit(fee_tx)


def _run_one(inp: dict):
    """One FeeTx instance via the batched model (B=1)."""
    def pk(v):
        return fr.pack([v])

    sib = list(inp["siblings"]) + [0] * (NLEV + 1 - len(inp["siblings"]))
    sign = jnp.asarray(np.array([int(inp["sign"])], np.uint32))
    root, ok = jfee_tx(
        pk(inp["oldStateRoot"]), pk(inp["feePlanToken"]),
        pk(inp["feeIdx"]), pk(inp["accFee"]), pk(inp["tokenID"]),
        pk(inp["nonce"]), sign, pk(inp["balance"]), pk(inp["ay"]),
        pk(inp["ethAddr"]), jnp.asarray(np.moveaxis(fr.pack_np([sib]),
                                                    2, 0)))
    return int(fr.unpack_np(np.asarray(root))[0]), bool(np.asarray(ok)[0])


def test_empty_fee_tx():
    # all-zero instance: newStateRoot stays 0 (fee-tx.test.js:40-57)
    root, ok = _run_one(dict(oldStateRoot=0, feePlanToken=0, feeIdx=0,
                             accFee=0, tokenID=0, nonce=0, sign=0,
                             balance=0, ay=0, ethAddr=0, siblings=[]))
    assert ok and root == 0


def test_no_change_on_root():
    # feeIdx = 0 is a NOP regardless of the other inputs (:59-80)
    old_root = rng.randrange(2 ** 253)
    root, ok = _run_one(dict(
        oldStateRoot=old_root, feePlanToken=rng.randrange(2 ** 32),
        feeIdx=0, accFee=rng.randrange(2 ** 128),
        tokenID=rng.randrange(2 ** 32), nonce=rng.randrange(2 ** 40),
        sign=rng.randrange(2), balance=rng.randrange(2 ** 128),
        ay=rng.randrange(2 ** 253), ethAddr=rng.randrange(2 ** 160),
        siblings=[rng.randrange(2 ** 253) for _ in range(NLEV + 1)]))
    assert ok and root == old_root


def _built_fee_batch():
    a1, a2 = HermezAccount(1), HermezAccount(2)
    f1, f2 = HermezAccount(3), HermezAccount(4)
    db = RollupDB()
    bb = db.build_batch(8, NLEV, 6, 2)
    for acc, tok, amt in [(a1, 1, 1000), (a2, 1, 1000), (a1, 2, 1000),
                          (a2, 2, 1000), (f1, 1, 0), (f2, 2, 0)]:
        bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amt),
                       tokenID=tok, fromBjjCompressed=acc.bjjCompressed,
                       fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(8, NLEV, 6, 2)
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=50, nonce=0,
              userFee=173, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    tx2 = dict(fromIdx=258, toIdx=259, tokenID=2, amount=50, nonce=0,
               userFee=126, onChain=0)
    a1.sign_tx(tx2)
    bb2.add_tx(tx2)
    bb2.add_token(1)
    bb2.add_fee_idx(260)
    bb2.add_token(2)
    bb2.add_fee_idx(261)
    bb2.build()
    return bb2


def test_fee_tx_against_builder_chain():
    # both fee slots, checked against imStateRootFee (fee-tx.test.js:82-179)
    bb2 = _built_fee_batch()
    gen = bb2.get_input()

    for slot in range(2):
        old = (gen["imInitStateRootFee"] if slot == 0
               else gen["imStateRootFee"][0])
        inp = dict(oldStateRoot=old,
                   feePlanToken=gen["feePlanTokens"][slot],
                   feeIdx=gen["feeIdxs"][slot],
                   accFee=gen["imFinalAccFee"][slot],
                   tokenID=gen["tokenID3"][slot],
                   nonce=gen["nonce3"][slot], sign=gen["sign3"][slot],
                   balance=gen["balance3"][slot], ay=gen["ay3"][slot],
                   ethAddr=gen["ethAddr3"][slot],
                   siblings=list(gen["siblings3"][slot]))
        root, ok = _run_one(inp)
        assert ok, f"slot {slot}"
        want = (gen["imStateRootFee"][0] if slot == 0
                else bb2.get_new_state_root())
        assert root == int(want), f"slot {slot}"


def test_fee_tx_wrong_token_fails():
    # different tokenID in the leaf vs the fee plan (fee-tx.test.js:181-208)
    bb2 = _built_fee_batch()
    gen = bb2.get_input()
    inp = dict(oldStateRoot=gen["imInitStateRootFee"],
               feePlanToken=gen["feePlanTokens"][0] + 1,  # tampered
               feeIdx=gen["feeIdxs"][0],
               accFee=gen["imFinalAccFee"][0],
               tokenID=gen["tokenID3"][0], nonce=gen["nonce3"][0],
               sign=gen["sign3"][0], balance=gen["balance3"][0],
               ay=gen["ay3"][0], ethAddr=gen["ethAddr3"][0],
               siblings=list(gen["siblings3"][0]))
    _, ok = _run_one(inp)
    assert not ok
