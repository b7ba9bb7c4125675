"""Headline benchmark: rollup-tx witness lanes/sec on one chip.

Metric (BASELINE.json): witnesses/sec/chip for rollup-tx at a
production-shape parametrization (nLevels=32, maxFeeTx=64). A valid
L2-transfer lane (EdDSA verify + 2 SMT processors + 6 Poseidons + balance
update — the full RollupTx phase A–K pipeline plus DecodeTx) is tiled
across the batch axis; per-lane device work is identical to a real batch.

Methodology (hardened after round 3 recorded a physically impossible
number from an async-dispatch race):
  * the verdict `ok` is asserted every rep — a run that fails constraint
    checks reports ok=false instead of a throughput;
  * every timed rep device_get()s an output to host (np.asarray), which
    cannot complete before the computation has;
  * two independent measurements — median of >=10 individually blocked
    reps, and wall-clock over a pipelined window — must agree within 2x
    or the result is flagged self_inconsistent and the SLOWER reading is
    published;
  * readings faster than a physical floor (>=1 us/tx of VPU work per
    lane) are rejected outright.

vs_baseline: the reference records no numbers (BASELINE.md), so the
baseline is MEASURED, not estimated: this engine's own single-core CPU
witness run (XLA:CPU + native fr_ffi custom calls, pinned to 1 core, the
same lane step) — scripts/measure_cpu_baseline.py, committed as
BASELINE_CPU.json (83.7 tx/s on this environment's x86 host). The former
1k tx/s reference-binary estimate is kept as `vs_reference_estimate`.

Prints ONE JSON line.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def build_tiled_inputs(B, NLEV, MFT, jnp):
    """Host: build a small valid batch, then tile its L2-transfer lane
    across B lanes. Returns (tiled, tiled_chains, seed params)."""
    from circuits_tpu.builder.rollup_db import RollupDB
    from circuits_tpu.builder.account import HermezAccount
    from circuits_tpu.builder import float40
    from circuits_tpu.engine.witness import pack_rollup_inputs
    from circuits_tpu.models.rollup_main import build_chains
    from circuits_tpu.parallel.sharding import _LANE_DIM, _CHAIN_LANE_DIM

    SEED_TX, ML1 = 4, 2
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

    def tile(x, dim):
        idx = [slice(None)] * x.ndim
        idx[dim] = slice(lane, lane + 1)
        sl = np.asarray(x[tuple(idx)])
        return jnp.asarray(np.repeat(sl, B, axis=dim))

    tiled = {k: (tile(v, _LANE_DIM[k]) if k in _LANE_DIM else jnp.asarray(v))
             for k, v in packed.items()}
    tiled_chains = {k: tile(v, _CHAIN_LANE_DIM[k]) for k, v in
                    chains.items()}
    return tiled, tiled_chains


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from circuits_tpu.utils.compile_opts import enable_persistent_cache
    enable_persistent_cache(jax)

    from circuits_tpu.models.rollup_main import rollup_main_lanes
    from circuits_tpu.r1cs import constraints as cc

    B = int(os.environ.get("BENCH_NTX", "512"))
    NLEV = int(os.environ.get("BENCH_NLEVELS", "32"))
    MFT = int(os.environ.get("BENCH_MAXFEETX", "64"))
    REPS = int(os.environ.get("BENCH_REPS", "10"))
    WINDOW = int(os.environ.get("BENCH_WINDOW", "10"))

    tiled, tiled_chains = build_tiled_inputs(B, NLEV, MFT, jnp)

    fn = jax.jit(partial(rollup_main_lanes, n_tx=B, n_levels=NLEV,
                         max_fee_tx=MFT))

    # AOT trace artifact (engine/aot.py pattern): deserializing the
    # exported StableHLO skips the ~154 s Python trace+Mosaic lowering a
    # fresh process pays on the axon TPU (measured, SCALING.md §5); the
    # XLA compile underneath still consults the persistent cache, so
    # after one priming run warm compile_s is ~18 s. The default path is
    # keyed by a hash of the package sources — an artifact can never
    # replay a stale graph after a code change (it just regenerates).
    aot_file = os.environ.get("BENCH_AOT", "")
    if not aot_file and jax.devices()[0].platform == "tpu":
        import hashlib
        import glob as _glob
        h = hashlib.sha256()
        root = os.path.dirname(os.path.abspath(__file__))
        for f in sorted(_glob.glob(os.path.join(
                root, "circuits_tpu", "**", "*.py"), recursive=True)):
            h.update(open(f, "rb").read())
        aot_file = os.path.join(
            os.path.expanduser("~/.cache"),
            f"ctpu_bench_aot_{h.hexdigest()[:16]}_{B}_{NLEV}_{MFT}.bin")
    if aot_file:
        try:
            from pathlib import Path
            from jax import export as jex
            p = Path(aot_file)
            if p.exists():
                fn = jax.jit(jex.deserialize(p.read_bytes()).call)
                print(f"# loaded AOT trace {p} "
                      f"({p.stat().st_size // 2**20} MB)",
                      file=sys.stderr)
            else:
                checks = [jex.DisabledSafetyCheck.custom_call(t)
                          for t in ("tpu_custom_call", "fr_mont_mul",
                                    "fr_add", "fr_sub", "fr_pow",
                                    "fr_poseidon", "sha256_blocks")]
                shapes = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                    (tiled, tiled_chains))
                exp = jex.export(fn, disabled_checks=checks)(*shapes)
                p.write_bytes(exp.serialize())
                print(f"# wrote AOT trace {p}", file=sys.stderr)
        except Exception as e:  # AOT is an optimization, never fatal
            print(f"# AOT trace unavailable ({e!r}); tracing live",
                  file=sys.stderr)
            fn = jax.jit(partial(rollup_main_lanes, n_tx=B, n_levels=NLEV,
                                 max_fee_tx=MFT))

    # warmup + verification: device_get (bytes on the host prove the
    # computation ran) and assert the verdict
    t0 = time.time()
    lanes0, ok0 = fn(tiled, tiled_chains)
    root0 = np.asarray(lanes0["new_state_root"])
    ok0 = np.asarray(ok0)
    compile_time = time.time() - t0
    all_ok = bool(ok0.all())

    # tunnel round-trip baseline: a tiny fetch of an already-ready array
    # costs ~28 ms over the axon tunnel; the timed reps below each end
    # with one such fetch (the only HARD completion barrier — measured
    # this round, block_until_ready can return before execution
    # finishes), so its cost is measured here and subtracted.
    import jax.numpy as jnp
    ready = jnp.zeros((4,), jnp.uint32)
    np.asarray(ready)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(ready[0])
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))

    # 1) individually blocked reps: block on the WHOLE output tree AND
    # fetch 4 bytes of it; subtract the fetch RTT.
    blocked = []
    last = None
    for _ in range(REPS):
        t0 = time.time()
        last = fn(tiled, tiled_chains)
        jax.block_until_ready(last)
        np.asarray(last[0]["new_state_root"][0, 0])
        blocked.append(max(time.time() - t0 - rtt, 1e-9))
    blocked_med = float(np.median(blocked))
    lanesN, okN = last
    all_ok = all_ok and bool(np.asarray(okN).all())
    if not np.array_equal(np.asarray(lanesN["new_state_root"]), root0):
        all_ok = False  # nondeterminism would invalidate the run

    # 2) pipelined window cross-check: dispatch WINDOW reps back-to-back,
    # block once at the end — wall/WINDOW bounds the steady-state rate.
    t0 = time.time()
    outs = [fn(tiled, tiled_chains) for _ in range(WINDOW)]
    jax.block_until_ready(outs)
    # one hard barrier on the LAST result (dependencies order the rest)
    np.asarray(outs[-1][0]["new_state_root"][0, 0])
    pipelined = max(time.time() - t0 - rtt, 1e-9) / WINDOW

    # self-consistency: a blocked rep can never be faster than the
    # steady-state pipelined rate — a reading below pipelined/2 means the
    # "blocked" timer did not actually wait for the device (the exact
    # async race that produced round 3's impossible 3.2M tx/s). Publish
    # the conservative blocked latency; escalate to pipelined if the
    # blocked reading is untrustworthy.
    consistent = blocked_med >= 0.5 * pipelined
    per_run = blocked_med if consistent else max(blocked_med, pipelined)

    # physical floor: a full RollupTx lane (EdDSA + 2x33-level SMT + ~130
    # Poseidons) cannot cost < 1 us on any current chip
    if per_run < B * 1e-6:
        all_ok = False

    tx_per_sec = B / per_run
    lane_constraints = cc.decode_tx(NLEV) + cc.rollup_tx(NLEV, MFT)
    constraints_per_sec = tx_per_sec * lane_constraints

    # measured single-core CPU baseline (scripts/measure_cpu_baseline.py)
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_CPU.json")
    try:
        baseline_cpu = float(json.loads(open(baseline_path).read())["value"])
    except Exception:
        baseline_cpu = 83.7  # committed measurement, 2026-08-21

    print(json.dumps({
        "metric": "rollup_tx_witness_per_sec",
        "value": round(tx_per_sec, 2),
        "unit": "tx/s",
        "vs_baseline": round(tx_per_sec / baseline_cpu, 3),
        "baseline_cpu_tx_per_sec": baseline_cpu,
        "vs_reference_estimate": round(tx_per_sec / 1000.0, 3),
        "ok": all_ok,
        "self_consistent": consistent,
        "blocked_median_s": round(blocked_med, 4),
        "pipelined_s": round(pipelined, 4),
        "constraints_per_sec": round(constraints_per_sec),
        "compile_s": round(compile_time, 1),
        "fetch_rtt_ms": round(rtt * 1e3, 1),
        "platform": jax.devices()[0].platform,
        "batch": B,
        "reps": REPS,
        "scope": ("per-lane witness phases (DecodeTx + RollupTx A-K); "
                  "the batch-global SHA256 tail is excluded here and "
                  "measured in scripts/exp_production.py full-batch "
                  "runs"),
    }))
    print(f"# B={B} nLevels={NLEV} maxFeeTx={MFT} ok={all_ok} "
          f"blocked_med={blocked_med:.4f}s pipelined={pipelined:.4f}s "
          f"consistent={consistent} compile={compile_time:.1f}s "
          f"lane_constraints={lane_constraints} "
          f"platform={jax.devices()[0].platform}", file=sys.stderr)


if __name__ == "__main__":
    main()
