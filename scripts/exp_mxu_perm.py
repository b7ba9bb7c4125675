"""Measure the MXU-matmul Poseidon backend vs the Pallas VPU kernel on
the real TPU (run with no JAX_PLATFORMS override).

Usage: python scripts/exp_mxu_perm.py [t] [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P

T = int(sys.argv[1]) if len(sys.argv) > 1 else 3
B = int(sys.argv[2]) if len(sys.argv) > 2 else 65536

rng = np.random.default_rng(0)


def rnd():
    return (int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63))
            * int(rng.integers(0, 2**63))) % P


st = fr.pack(np.array([[rnd() for _ in range(64)] * (B // 64)
                       for _ in range(T)], dtype=object))
stm = fr.to_mont(st)

print(f"platform={jax.devices()[0].platform} t={T} B={B}", flush=True)

from circuits_tpu.ops.pallas_poseidon import permute_mont as pallas_pm
from circuits_tpu.ops.poseidon_mxu import jpermute_mont_mxu

for name, fn in (("pallas-vpu", jax.jit(pallas_pm)),
                 ("mxu-matmul", jpermute_mont_mxu)):
    t0 = time.time()
    out = fn(stm)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    # per-rep TINY-SLICE device_get: on the axon platform
    # block_until_ready can return before execution completes (measured:
    # block=0.1 ms then a 47 s fetch on a heavy graph) — fetching 4
    # bytes of the result is the only hard completion barrier, and
    # transfers nothing
    np.asarray(fn(stm)[0, 0, 0])  # settle the queue
    ts = []
    for _ in range(8):
        t0 = time.time()
        np.asarray(fn(stm)[0, 0, 0])
        ts.append(time.time() - t0)
    per = min(ts)
    print(f"{name}: compile={compile_s:.1f}s best={per*1e3:.2f} ms "
          f"median={np.median(ts)*1e3:.2f} ms "
          f"-> {B/per/1e6:.3f} Mperm/s", flush=True)

a = np.asarray(jax.jit(pallas_pm)(stm))
b = np.asarray(jpermute_mont_mxu(stm))
print("bit-exact agreement:", np.array_equal(a, b), flush=True)
