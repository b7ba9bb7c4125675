"""Per-kernel time breakdown of a production-shape batch (VERDICT r4
task #9 / SURVEY §5 tracing row).

The reference only wall-times whole build actions
(/root/reference/tools/helpers/actions.js:32,67-69,127-129); the upgrade
prescribed by SURVEY §5 is a per-kernel breakdown. The axon remote-TPU
platform exposes no profiler trace viewer, so this measures each phase
of the RollupTx lane pipeline as its own jitted sub-graph at the full
production lane width, with the hardened device_get barrier (bench.py
methodology) — the same kernels the fused step runs, timed in isolation.

Output: a phase table (ms, % of the summed phase time, and the fused
full-lanes step for comparison) for SCALING.md.

Usage: python scripts/profile_kernels.py [B]   (default 2048)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from circuits_tpu.utils.compile_opts import enable_persistent_cache

enable_persistent_cache(jax)

from bench import build_tiled_inputs
from circuits_tpu.field import fr
from circuits_tpu.models.decode_tx import decode_tx
from circuits_tpu.models.rollup_main import rollup_main_lanes
from circuits_tpu.models.rollup_tx import hash_state_pair
from circuits_tpu.ops import babyjubjub as bjj
from circuits_tpu.ops.smt import processor_chains
from circuits_tpu.ops.sha256 import sha256_bits

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLEV, MFT = 32, 64
REPS = 5

print(f"platform={jax.devices()[0].platform} B={B} nLevels={NLEV} "
      f"maxFeeTx={MFT}", flush=True)

tiled, chains = build_tiled_inputs(B, NLEV, MFT, jnp)


def barrier_time(fn, *args, reps=REPS, probe=None):
    """Median of `reps` device_get-barriered runs, RTT-subtracted."""
    out = fn(*args)
    leaf = probe(out) if probe else jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).reshape(-1)[:1]  # warm + materialize
    ready = jnp.zeros((4,), jnp.uint32)
    np.asarray(ready)
    rtts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(ready[0])
        rtts.append(time.time() - t0)
    rtt = float(np.median(rtts))
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        leaf = probe(out) if probe else jax.tree_util.tree_leaves(out)[0]
        jax.block_until_ready(out)
        np.asarray(leaf).reshape(-1)[:1]
        times.append(max(time.time() - t0 - rtt, 1e-9))
    return float(np.median(times))


results = {}

# ---- phase B: DecodeTx (bit unpack + float40 + Poseidon(6) sigL2Hash)
f_decode = jax.jit(lambda inp, ch: decode_tx(
    NLEV, ch["prev_on_chain"], inp["tx_compressed_data"],
    inp["max_num_batch"], inp["amount_f"], inp["to_eth_addr"],
    inp["to_bjj_ay"], inp["rq_tx_compressed_data_v2"],
    inp["rq_to_eth_addr"], inp["rq_to_bjj_ay"], inp["from_eth_addr"],
    inp["from_bjj_compressed"], inp["load_amount_f"],
    jnp.broadcast_to(inp["global_chain_id"], (16, B)),
    jnp.broadcast_to(inp["current_num_batch"], (16, B)),
    inp["on_chain"], inp["new_account"],
    inp["aux_from_idx"], inp["aux_to_idx"], ch["in_idx"]))
t0 = time.time()
results["decode (Poseidon6 + bit unpack)"] = barrier_time(
    f_decode, tiled, chains)
print(f"decode done ({time.time()-t0:.0f}s incl compile)", flush=True)

# ---- phases D+I: 4x HashState = two 2x-batched Poseidon(4) calls
f_hashes = jax.jit(lambda inp: hash_state_pair(
    (inp["token_id1"], inp["nonce1"], inp["sign1"], inp["balance1"],
     inp["ay1"], inp["eth_addr1"]),
    (inp["token_id2"], inp["nonce2"], inp["sign2"], inp["balance2"],
     inp["ay2"], inp["eth_addr2"])))
t0 = time.time()
d_hash = barrier_time(f_hashes, tiled)
results["state hashes x4 (Poseidon4)"] = 2 * d_hash  # old + new pairs
print(f"hashes done ({time.time()-t0:.0f}s incl compile)", flush=True)

# ---- phase J: fused dual-SMT chain (2B lanes x nLevels+1 levels)
nlimb = 16


def f_smt(inp):
    def cat2(a, b, flag=False):
        if flag:
            return jnp.concatenate([a.reshape(-1), b.reshape(-1)])
        if a.ndim == 3:
            return jnp.concatenate([a.reshape(a.shape[0], nlimb, -1),
                                    b.reshape(b.shape[0], nlimb, -1)],
                                   axis=-1)
        return jnp.concatenate([a.reshape(nlimb, -1),
                                b.reshape(nlimb, -1)], axis=-1)

    return processor_chains(
        cat2(inp["siblings1"], inp["siblings2"]),
        cat2(inp["old_key1"], inp["old_key2"]),
        cat2(inp["old_value1"], inp["old_value2"]),
        cat2(inp["is_old0_1"], inp["is_old0_2"], flag=True),
        cat2(inp["from_idx"], inp["to_idx"]),
        cat2(inp["balance1"], inp["balance2"]),
        cat2(inp["on_chain"], inp["on_chain"], flag=True),
        cat2(1 - inp["on_chain"], 1 - inp["on_chain"], flag=True))


t0 = time.time()
results[f"dual SMT chains (2x{NLEV+1} levels)"] = barrier_time(
    jax.jit(f_smt), tiled)
print(f"smt done ({time.time()-t0:.0f}s incl compile)", flush=True)

# ---- phase F: EdDSA verify (Pallas double-base Horner)
f_eddsa = jax.jit(lambda inp: bjj.eddsa_poseidon_verify(
    jnp.ones((B,), jnp.bool_), inp["r8x"], inp["ay1"], inp["s"],
    inp["r8x"], inp["r8y"], inp["tx_compressed_data"]))
t0 = time.time()
results["EdDSA verify (Pallas Horner)"] = barrier_time(f_eddsa, tiled)
print(f"eddsa done ({time.time()-t0:.0f}s incl compile)", flush=True)

# ---- phase H tail analogue: the global SHA256 over the DA bitstrings
n_bits = 48 * 2 + 256 * 3 + 256 * 736 + B * (2 * NLEV + 48) \
    + MFT * NLEV + 16 + 32
n_bits_pad = ((n_bits + 64) // 512 + 1) * 512 - 64  # block count proxy
f_sha = jax.jit(lambda bits: sha256_bits(bits))
bits_in = jnp.zeros((n_bits, 1), jnp.uint32)
t0 = time.time()
results[f"global SHA256 ({n_bits} bits)"] = barrier_time(f_sha, bits_in)
print(f"sha done ({time.time()-t0:.0f}s incl compile)", flush=True)

# ---- the fused full-lanes step (what bench.py times)
f_full = jax.jit(partial(rollup_main_lanes, n_tx=B, n_levels=NLEV,
                         max_fee_tx=MFT))
t0 = time.time()
full = barrier_time(f_full, tiled, chains,
                    probe=lambda o: o[0]["new_state_root"][0, 0])
print(f"full lanes step done ({time.time()-t0:.0f}s incl compile)",
      flush=True)

phase_sum = sum(results.values())
print(f"\n== per-kernel breakdown @B={B} (isolated sub-graphs, "
      f"median of {REPS}, device_get barrier) ==")
for name, t in sorted(results.items(), key=lambda kv: -kv[1]):
    print(f"  {name:42s} {t*1e3:8.1f} ms  {100*t/phase_sum:5.1f}%")
print(f"  {'sum of isolated phases':42s} {phase_sum*1e3:8.1f} ms")
print(f"  {'fused full lanes step':42s} {full*1e3:8.1f} ms "
      f"(fusion saves {100*(1 - full/phase_sum):.0f}% vs isolated sum)")
