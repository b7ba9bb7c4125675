"""Headline benchmark: rollup-tx witness lanes/sec on one chip.

Metric (BASELINE.json): witnesses/sec/chip for rollup-tx at a
production-shape parametrization (nLevels=32, maxFeeTx=64). A valid
L2-transfer lane (EdDSA verify + 2 SMT processors + 6 Poseidons + balance
update — the full RollupTx phase A–K pipeline plus DecodeTx) is tiled
across the batch axis; per-lane device work is identical to a real batch.

vs_baseline: the reference records no numbers (BASELINE.md). Baseline is
an estimate of the reference's native single-core witness calculator at
1000 tx/s (~45k constraints/tx at ~1.5 field-ops/constraint against
~50M/s single-core Montgomery muls + memory traffic), so
vs_baseline = tx_per_sec / 1000.

Prints ONE JSON line.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from circuits_tpu.builder.rollup_db import RollupDB
    from circuits_tpu.builder.account import HermezAccount
    from circuits_tpu.builder import float40
    from circuits_tpu.engine.witness import pack_rollup_inputs
    from circuits_tpu.models.rollup_main import (build_chains,
                                                 rollup_main_lanes)

    B = int(os.environ.get("BENCH_NTX", "512"))
    NLEV = int(os.environ.get("BENCH_NLEVELS", "32"))
    MFT = int(os.environ.get("BENCH_MAXFEETX", "64"))
    SEED_TX, ML1 = 4, 2

    # host: build a small valid batch, then tile its L2-transfer lane
    a1, a2 = HermezAccount(1), HermezAccount(2)
    db = RollupDB()
    bb = db.build_batch(SEED_TX, NLEV, ML1, MFT)
    for acc, amt in [(a1, 10_000_000), (a2, 20_000_000)]:
        bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(amt),
                       tokenID=1, fromBjjCompressed=acc.bjjCompressed,
                       fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
    bb.build()
    db.consolidate(bb)
    bb2 = db.build_batch(SEED_TX, NLEV, ML1, MFT)
    bb2.add_token(1)
    tx = dict(fromIdx=256, toIdx=257, tokenID=1, amount=1000, userFee=126,
              nonce=0, onChain=0)
    a1.sign_tx(tx)
    bb2.add_tx(tx)
    bb2.build()
    packed = pack_rollup_inputs(bb2.get_input(), SEED_TX, NLEV, ML1, MFT)
    chains = build_chains(packed, SEED_TX, MFT)

    lane = 0  # the L2 transfer lane (slot 0 of batch 2)
    reps = B

    def tile(x, dim):
        idx = [slice(None)] * x.ndim
        idx[dim] = slice(lane, lane + 1)
        sl = np.asarray(x[tuple(idx)])
        return jnp.asarray(np.repeat(sl, reps, axis=dim))

    from circuits_tpu.parallel.sharding import _LANE_DIM, _CHAIN_LANE_DIM
    tiled = {k: (tile(v, _LANE_DIM[k]) if k in _LANE_DIM else jnp.asarray(v))
             for k, v in packed.items()}
    tiled_chains = {k: tile(v, _CHAIN_LANE_DIM[k]) for k, v in
                    chains.items()}

    fn = jax.jit(partial(rollup_main_lanes, n_tx=B, n_levels=NLEV,
                         max_fee_tx=MFT))

    t0 = time.time()
    lanes, ok = fn(tiled, tiled_chains)
    jax.block_until_ready(lanes["new_state_root"])
    compile_time = time.time() - t0

    times = []
    for _ in range(3):
        t0 = time.time()
        lanes, ok = fn(tiled, tiled_chains)
        jax.block_until_ready(lanes["new_state_root"])
        times.append(time.time() - t0)
    best = min(times)
    tx_per_sec = B / best

    print(json.dumps({
        "metric": "rollup_tx_witness_per_sec",
        "value": round(tx_per_sec, 2),
        "unit": "tx/s",
        "vs_baseline": round(tx_per_sec / 1000.0, 3),
    }))
    print(f"# B={B} nLevels={NLEV} maxFeeTx={MFT} best={best:.3f}s "
          f"compile={compile_time:.1f}s platform="
          f"{jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
