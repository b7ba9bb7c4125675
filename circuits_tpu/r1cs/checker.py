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
        # per-slot fee-chain integrity: slot j's output root must equal
        # imStateRootFee[j] (the last slot's root is the batch output and
        # has no im pin) — keeps the mask slot-local so a corrupted fee
        # slot is attributable (src/rollup-main.circom:419-424)
        chain_ok = fr.eq(fee_root[:, :-1], inp["im_state_root_fee"])
        fee_ok = fee_ok & jnp.concatenate(
            [chain_ok, jnp.ones((1,), dtype=jnp.bool_)])
        return lane_ok, fee_ok

    lane_ok, fee_ok = run(packed)
    lane_ok = np.asarray(lane_ok)
    fee_ok = np.asarray(fee_ok)
    return dict(ok=bool(lane_ok.all() and fee_ok.all()),
                lane_ok=lane_ok, fee_ok=fee_ok)


def check_batch_sharded(mesh, packed: dict, n_tx: int, n_levels: int,
                        max_l1_tx: int, max_fee_tx: int) -> dict:
    """Mesh-sharded residual check (SURVEY §7.5: "evaluate chip-locally
    in shards, all-reduce a verdict"): each device evaluates its tx-lane
    slice, per-lane masks come back sharded, and the scalar verdict is an
    explicit psum all-reduce over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..models.rollup_main import build_chains as _bc
    from ..parallel.sharding import (AXIS, _LANE_DIM, _CHAIN_LANE_DIM,
                                     _spec)
    from ..models import rollup_main as rm

    n_dev = mesh.devices.size
    assert n_tx % n_dev == 0
    t_loc = n_tx // n_dev

    def step(inp, chains):
        start = jax.lax.axis_index(AXIS) * t_loc
        zero1 = fr.zeros((1,))
        loc = lambda a: jax.lax.dynamic_slice_in_dim(a, start, t_loc, -1)
        neighbors = []
        for key in ("tx_compressed_data_v2", "to_eth_addr", "to_bjj_ay"):
            full = jax.lax.all_gather(inp[key], AXIS, axis=1, tiled=True)
            fut, past = rm._neighbors(full, zero1)
            neighbors += [loc(fut), loc(past)]
        last_mask = (start + jnp.arange(t_loc)) == n_tx - 1
        _, lane_ok = rm.rollup_main_lanes(
            inp, chains, t_loc, n_levels, max_fee_tx,
            neighbors=tuple(neighbors), last_mask=last_mask)
        # chip-local reduction, explicit all-reduce verdict over ICI
        n_bad = jax.lax.psum(jnp.sum((~lane_ok).astype(jnp.uint32)), AXIS)
        # fee phase: replicated (slot count is small)
        fee_old_root = jnp.concatenate(
            [inp["im_init_state_root_fee"], inp["im_state_root_fee"]],
            axis=-1)
        fee_root, fee_ok = fee_tx(
            fee_old_root, inp["fee_plan_tokens"], inp["fee_idxs"],
            inp["im_final_acc_fee"], inp["token_id3"], inp["nonce3"],
            inp["sign3"], inp["balance3"], inp["ay3"], inp["eth_addr3"],
            inp["siblings3"])
        chain_ok = fr.eq(fee_root[:, :-1], inp["im_state_root_fee"])
        fee_ok = fee_ok & jnp.concatenate(
            [chain_ok, jnp.ones((1,), dtype=jnp.bool_)])
        ok = (n_bad == 0) & jnp.all(fee_ok)
        return lane_ok, fee_ok, ok

    chains = _bc(packed, n_tx, max_fee_tx)
    in_specs = (
        {k: _spec(_LANE_DIM.get(k), v.ndim) for k, v in packed.items()},
        {k: _spec(_CHAIN_LANE_DIM[k], v.ndim) for k, v in chains.items()},
    )
    out_specs = (P(AXIS), P(), P())
    fn = jax.shard_map(step, mesh=mesh, in_specs=in_specs,
                       out_specs=out_specs, check_vma=False)
    placed = {k: jax.device_put(
        v, NamedSharding(mesh, _spec(_LANE_DIM.get(k), v.ndim)))
        for k, v in packed.items()}
    chains_placed = {k: jax.device_put(
        v, NamedSharding(mesh, _spec(_CHAIN_LANE_DIM[k], v.ndim)))
        for k, v in chains.items()}
    lane_ok, fee_ok, ok = jax.jit(fn)(placed, chains_placed)
    return dict(ok=bool(ok), lane_ok=np.asarray(lane_ok),
                fee_ok=np.asarray(fee_ok))
