"""assertTxs equivalent (reference test/rollup-tx.test.js + helpers):
drive ONE RollupTx instance per transaction of a built batch and assert
its roots / accumulated fees against the builder's im chains."""

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

a1, a2 = HermezAccount(1), HermezAccount(2)


def _built_batch():
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
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=150, userFee=126,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    tx2 = dict(fromIdx=257, toIdx=Constants.exitIdx, tokenID=1,
               amount=100, userFee=68, nonce=0, onChain=0)
    a2.sign_tx(tx2)
    bb2.add_tx(tx)
    bb2.add_tx(tx2)
    bb2.build()
    return bb2


def test_single_tx_instances_match_im_chain():
    bb = _built_batch()
    tx_in, chains = batch_tx_inputs(bb)
    run_one = jax.jit(partial(rollup_tx, n_levels=NLEV))

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
