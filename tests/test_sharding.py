"""Multi-chip: sharded witness evaluation == single-chip results
(SURVEY.md §4: "multi-chip tests asserting sharded == single-chip").

Runs on the 8-device virtual CPU mesh from conftest.
"""

import jax
import numpy as np
import pytest

from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.engine.witness import RollupEngine, pack_rollup_inputs
from circuits_tpu.parallel.sharding import (make_tx_mesh,
                                            make_sharded_rollup_main)
from circuits_tpu.field import fr

NTX, NLEV, ML1, MFT = 8, 16, 2, 2

a1 = HermezAccount(1)
a2 = HermezAccount(2)


def _build_batch():
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    for acc, amt in [(a1, 1000), (a2, 2000)]:
        bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amt),
                       tokenID=1, fromBjjCompressed=acc.bjjCompressed,
                       fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
    bb.build()
    db.consolidate(bb)

    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    bb2.add_token(1)
    bb2.add_fee_idx(256)
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=100, userFee=126,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    tx2 = dict(fromIdx=257, toIdx=256, tokenID=1, amount=40, userFee=32,
               nonce=0, onChain=0)
    a2.sign_tx(tx2)
    bb2.add_tx(tx2)
    bb2.build()
    return bb2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_equals_single_chip():
    bb = _build_batch()
    packed = pack_rollup_inputs(bb.get_input(), NTX, NLEV, ML1, MFT)

    mesh = make_tx_mesh(8)
    run = make_sharded_rollup_main(mesh, NTX, NLEV, ML1, MFT)
    out_s, ok_s = run(packed)
    assert bool(ok_s)

    eng = RollupEngine(NTX, NLEV, ML1, MFT)
    out_1, ok_1 = eng.run(bb.get_input())
    assert ok_1

    for k in ["hash_global_inputs", "new_state_root", "new_exit_root",
              "new_last_idx"]:
        sharded_val = fr.unpack_int(np.asarray(out_s[k]))
        assert sharded_val == out_1[k], k
    assert out_1["hash_global_inputs"] == bb.get_hash_inputs()
