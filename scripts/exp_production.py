"""Production-shape run: one full RollupMain(2048, 32, 256, 64) batch.

The north-star parametrization (/root/reference/tools/README.md:87;
~1.22e8 R1CS constraints, BASELINE.md). Measures the full pipeline on
the real chip: host builder time (sequential SMT root chain), input
packing, TPU compile, witness wall-time (blocked + pipelined), and
device memory. Writes a summary line for SCALING.md.

Usage: python scripts/exp_production.py [nTx]   (default 2048)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_TX = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NLEV, ML1, MFT = 32, 256, 64
N_ACC = max(N_TX, 2)

import jax

from circuits_tpu.utils.compile_opts import enable_persistent_cache

enable_persistent_cache(jax)

from functools import partial
from circuits_tpu.builder.rollup_db import RollupDB
from circuits_tpu.builder.account import HermezAccount
from circuits_tpu.builder import float40
from circuits_tpu.engine.witness import pack_rollup_inputs
from circuits_tpu.models.rollup_main import rollup_main
from circuits_tpu.r1cs import constraints as cc

print(f"platform={jax.devices()[0].platform} nTx={N_TX} nLevels={NLEV} "
      f"maxL1Tx={ML1} maxFeeTx={MFT}", flush=True)

# --- host: populate accounts via L1 deposit batches (generate-input.js
# populateDB equivalent) ---
t0 = time.time()
accounts = [HermezAccount(i + 1) for i in range(N_ACC)]
db = RollupDB()
added = 0
while added < N_ACC:
    bb = db.build_batch(N_TX, NLEV, ML1, MFT)
    for acc in accounts[added:added + ML1]:
        bb.add_tx(dict(fromIdx=0, loadAmountF=float40.fix2float(10_000_000),
                       tokenID=1, fromBjjCompressed=acc.bjjCompressed,
                       fromEthAddr=acc.ethAddr, toIdx=0, onChain=True))
        added += 1
    bb.build()
    db.consolidate(bb)
t_populate = time.time() - t0
print(f"populate: {N_ACC} accounts in {t_populate:.1f}s "
      f"({(N_ACC / t_populate):.0f} deposits/s)", flush=True)

# --- host: the production batch — N_TX L2 transfers (ring) ---
t0 = time.time()
bb = db.build_batch(N_TX, NLEV, ML1, MFT)
bb.add_token(1)
bb.add_fee_idx(256)
for i in range(N_TX):
    tx = dict(fromIdx=256 + i, toIdx=256 + ((i + 1) % N_ACC), tokenID=1,
              amount=1000, userFee=126, nonce=0, onChain=0)
    accounts[i].sign_tx(tx)
    bb.add_tx(tx)
t_sign = time.time() - t0
t0 = time.time()
bb.build()
t_build = time.time() - t0
print(f"sign: {t_sign:.1f}s  build (im-chains, sequential SMT): "
      f"{t_build:.1f}s ({N_TX / t_build:.0f} tx/s host)", flush=True)

t0 = time.time()
packed = pack_rollup_inputs(bb.get_input(), N_TX, NLEV, ML1, MFT)
t_pack = time.time() - t0
print(f"pack: {t_pack:.1f}s", flush=True)

# --- device: compile + run.  Timing methodology hardened to bench.py's
# (VERDICT r4 weak #1 / task #3): on the axon tunnel jax.block_until_ready
# can return BEFORE execution finishes (measured; bench.py:117-120), so
# every timed rep ends with a device_get of 4 bytes of the output — the
# only hard completion barrier — with the fetch RTT measured and
# subtracted, plus a blocked-vs-pipelined self-consistency gate and a
# physical floor.
import jax.numpy as jnp

fn = jax.jit(partial(rollup_main, n_tx=N_TX, n_levels=NLEV,
                     max_l1_tx=ML1, max_fee_tx=MFT))
t0 = time.time()
out, ok = fn(packed)
ok_host = bool(np.asarray(ok))          # device_get: a hard barrier
hash0 = np.asarray(out["hash_global_inputs"])
t_compile = time.time() - t0
print(f"first call (compile+run): {t_compile:.1f}s ok={ok_host}",
      flush=True)
assert ok_host

from circuits_tpu.field import fr

got = fr.unpack_int(hash0)
want = bb.get_hash_inputs()
assert got == want, "hashGlobalInputs mismatch vs builder oracle"
print("hashGlobalInputs: EXACT vs builder oracle", flush=True)

# tunnel fetch round-trip baseline (subtracted from each timed rep)
ready = jnp.zeros((4,), jnp.uint32)
np.asarray(ready)
rtts = []
for _ in range(5):
    t0 = time.time()
    np.asarray(ready[0])
    rtts.append(time.time() - t0)
rtt = float(np.median(rtts))

reps = 5
times = []
last = None
for _ in range(reps):
    t0 = time.time()
    out, ok = fn(packed)
    jax.block_until_ready((out, ok))
    np.asarray(out["hash_global_inputs"][0, 0])   # hard barrier
    times.append(max(time.time() - t0 - rtt, 1e-9))
blocked = float(np.median(times))
all_ok = ok_host and bool(np.asarray(ok))
if not np.array_equal(np.asarray(out["hash_global_inputs"]), hash0):
    all_ok = False  # nondeterminism invalidates the run

t0 = time.time()
outs = [fn(packed) for _ in range(reps)]
jax.block_until_ready(outs)
np.asarray(outs[-1][0]["hash_global_inputs"][0, 0])
pipelined = max(time.time() - t0 - rtt, 1e-9) / reps

# self-consistency: a blocked rep can never beat the pipelined steady
# state; a reading below pipelined/2 means the barrier did not hold
consistent = blocked >= 0.5 * pipelined
per_run = blocked if consistent else max(blocked, pipelined)
if per_run < N_TX * 1e-6:   # physical floor: >= 1 us/tx of VPU work
    all_ok = False

try:
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2**30
except Exception:
    peak = -1

total_c = cc.total_constraints(N_TX, NLEV, ML1, MFT)
print(f"witness: blocked_med={blocked:.3f}s pipelined={pipelined:.3f}s "
      f"fetch_rtt={rtt*1e3:.1f}ms -> {N_TX / per_run:.0f} tx/s blocked, "
      f"{N_TX / pipelined:.0f} tx/s pipelined", flush=True)
print(f"constraint mass: {total_c:,} R1CS rows -> "
      f"{total_c / per_run / 1e6:.0f}M constraints/s blocked", flush=True)
print(f"device peak memory: {peak:.2f} GiB", flush=True)
print(f"SUMMARY nTx={N_TX} populate={t_populate:.1f} sign={t_sign:.1f} "
      f"build={t_build:.1f} pack={t_pack:.1f} compile={t_compile:.1f} "
      f"blocked={blocked:.3f} pipelined={pipelined:.3f} "
      f"ok={all_ok} self_consistent={consistent} "
      f"fetch_rtt_ms={rtt*1e3:.1f} peakGiB={peak:.2f}",
      flush=True)
