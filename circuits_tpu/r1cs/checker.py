"""Constraint-satisfaction checking.

The reference delegates "is this witness valid" to the R1CS + snarkjs
(`Az∘Bz = Cz`); this engine enforces the same relations as algebraic
residuals evaluated during witness computation — every circom `===` /
ForceEqualIfEnabled / Num2Bits range constraint appears as a boolean
mask, reduced chip-locally and combined into a global verdict
(all-reduce over the mesh when sharded).

`check_batch` exposes the per-phase lane masks for debugging, mirroring
the reference's negative tests that expect "Constraint doesn't match"
(test/rollup-main.test.js:679-684, 866-877).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import fr
from ..models.rollup_main import build_chains, rollup_main_lanes
from ..models.fee_tx import fee_tx


def check_batch(packed: dict, n_tx: int, n_levels: int, max_l1_tx: int,
                max_fee_tx: int) -> dict:
    """Returns dict(ok, lane_ok (nTx,), fee_ok (maxFeeTx,)) as host
    numpy — which lane / fee slot violated a constraint."""

    @partial(jax.jit, static_argnums=())
    def run(inp):
        chains = build_chains(inp, n_tx, max_fee_tx)
        _, lane_ok = rollup_main_lanes(inp, chains, n_tx, n_levels,
                                       max_fee_tx)
        fee_old_root = jnp.concatenate(
            [inp["im_init_state_root_fee"], inp["im_state_root_fee"]],
            axis=-1)
        fee_root, fee_ok = fee_tx(
            fee_old_root, inp["fee_plan_tokens"], inp["fee_idxs"],
            inp["im_final_acc_fee"], inp["token_id3"], inp["nonce3"],
            inp["sign3"], inp["balance3"], inp["ay3"], inp["eth_addr3"],
            inp["siblings3"])
        fee_ok = fee_ok & (
            fr.eq(fee_root[:, :-1], inp["im_state_root_fee"]).all()
            | jnp.zeros((), bool))
        return lane_ok, fee_ok

    lane_ok, fee_ok = run(packed)
    lane_ok = np.asarray(lane_ok)
    fee_ok = np.asarray(fee_ok)
    return dict(ok=bool(lane_ok.all() and fee_ok.all()),
                lane_ok=lane_ok, fee_ok=fee_ok)
