"""AOT trace serialization (engine/aot.py): export once, rehydrate in a
tracing-free consumer, outputs bit-identical to the live jit path."""

import numpy as np
import pytest

from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.engine import aot
from circuits_tpu.engine.witness import RollupEngine

NTX, NLEV, ML1, MFT = 3, 16, 2, 2

a1, a2 = HermezAccount(1), HermezAccount(2)


def test_aot_export_roundtrip(tmp_path):
    db = RollupDB()
    bb = db.build_batch(NTX, NLEV, ML1, MFT)
    for acc in (a1, a2):
        bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(1000),
                       tokenID=1, fromBjjCompressed=acc.bjjCompressed,
                       fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
    bb.build()
    db.consolidate(bb)
    bb2 = db.build_batch(NTX, NLEV, ML1, MFT)
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=100, userFee=126,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    bb2.build()

    eng = RollupEngine(NTX, NLEV, ML1, MFT)
    packed = eng.pack(bb2.get_input())

    p = aot.export_rollup_main(NTX, NLEV, ML1, MFT,
                               tmp_path / "aot.bin")
    assert p.exists() and p.stat().st_size > 10_000
    fn = aot.load_rollup_main(p)

    out_a, ok_a = fn(packed)
    out_j, ok_j = eng._fn(packed)
    assert bool(np.asarray(ok_a)) and bool(np.asarray(ok_j))
    for k in out_j:
        assert np.array_equal(np.asarray(out_a[k]), np.asarray(out_j[k]))
