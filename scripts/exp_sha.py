"""Measure the global-SHA256 phase: XLA scan chain vs pallas rounds
kernel, at the production preimage size (~420k bits / 822 blocks,
nTx=2048 HashInputs — SCALING.md §3b measured the scan at 62.6 ms).

Methodology notes (both bit this script's first version):
  * `jax.jit(sha_mod.sha256_bits)` on the SAME function object shares
    jax's function-keyed jit cache — switching the backend global and
    re-jitting silently reused the previous executable. Every timed
    path gets a FRESH lambda.
  * the axon per-dispatch floor (~2 RTTs ≈ 46 ms blocked, ~39 ms
    pipelined for this graph) masks any fast kernel; the honest device
    number comes from a 10x serial chain INSIDE one jit (each iteration
    feeds the digest back into the message).

Both paths are checked bit-exact against hashlib before timing.
Usage: python scripts/exp_sha.py [nbits]
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from circuits_tpu.utils.compile_opts import enable_persistent_cache

enable_persistent_cache(jax)

NBITS = int(sys.argv[1]) if len(sys.argv) > 1 else 420752
N_CHAIN = 10

from circuits_tpu.ops import sha256 as sha_mod

print(f"platform={jax.devices()[0].platform} nbits={NBITS} "
      f"nblocks={(NBITS + 65 + 511) // 512}")

rng = np.random.default_rng(5)
if NBITS % 8:
    raise SystemExit("use byte-aligned nbits for the hashlib oracle")
msg = rng.integers(0, 256, size=NBITS // 8, dtype=np.uint8)
bits = jax.device_put(jnp.asarray(
    np.unpackbits(msg)[:NBITS].reshape(NBITS, 1).astype(np.uint32)))
jax.block_until_ready(bits)
expect_bits = np.unpackbits(np.frombuffer(
    hashlib.sha256(msg.tobytes()).digest(), dtype=np.uint8))

ready = jnp.zeros((4,), jnp.uint32)
np.asarray(ready)
rtts = []
for _ in range(5):
    t0 = time.time()
    np.asarray(ready[0])
    rtts.append(time.time() - t0)
rtt = float(np.median(rtts))
print(f"fetch rtt = {rtt * 1e3:.1f} ms")


def run(path):
    sha_mod._BACKEND = path
    single = jax.jit(lambda b, _p=path: sha_mod.sha256_bits(b))
    out = np.asarray(single(bits))[:, 0]
    assert np.array_equal(out, expect_bits), f"{path}: WRONG DIGEST"

    def chain(b, _p=path):
        def body(i, b):
            d = sha_mod.sha256_bits(b)
            return b.at[:256].set(b[:256] ^ d)
        return jax.lax.fori_loop(0, N_CHAIN, body, b)

    fn = jax.jit(chain)
    t0 = time.time()
    o = fn(bits)
    jax.block_until_ready(o)
    np.asarray(o[0, 0])
    compile_s = time.time() - t0
    reps = []
    for _ in range(5):
        t0 = time.time()
        o = fn(bits)
        jax.block_until_ready(o)
        np.asarray(o[0, 0])
        reps.append(max(time.time() - t0 - rtt, 1e-9))
    med = float(np.median(reps))
    per = (med - 0.022) / N_CHAIN  # subtract the measured dispatch floor
    print(f"{path:8s} digest OK compile={compile_s:6.1f}s "
          f"{N_CHAIN}-chain={med * 1e3:7.1f} ms -> per-hash "
          f"~{per * 1e3:6.2f} ms")
    return per


t_xla = run("xla")
t_pallas = run("pallas")
print(f"speedup: {t_xla / t_pallas:.1f}x")
