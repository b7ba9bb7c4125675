"""Experiment: unrolled mont_mul reduction vs fori_loop — compile impact."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P, N_LIMBS, N0

MASK = np.uint32(0xFFFF)
SH16 = np.uint32(16)
_PL = [np.uint32((P >> (16 * i)) & 0xFFFF) for i in range(N_LIMBS)]
_N0 = np.uint32(N0)


def mont_mul_unrolled(a, b):
    """Straight-line CIOS on lazy columns (the pallas kernel's math,
    as plain XLA ops)."""
    cols = [None] * (2 * N_LIMBS + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N_LIMBS):
        ai = a[i]
        for j in range(N_LIMBS):
            p = ai * b[j]
            acc(i + j, p & MASK)
            acc(i + j + 1, p >> SH16)
    cols = [jnp.zeros_like(cols[0]) if c is None else c for c in cols]
    for i in range(N_LIMBS):
        m = (cols[i] * _N0) & MASK
        for j in range(N_LIMBS):
            q = m * _PL[j]
            cols[i + j] = cols[i + j] + (q & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (q >> SH16)
        cols[i + 1] = cols[i + 1] + (cols[i] >> SH16)
    limbs = fr._carry_prop(cols[N_LIMBS:2 * N_LIMBS + 1])
    limbs = fr._sub_if_ge(limbs, fr._P_LIMBS_NP)
    return fr._stack(limbs)


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    hlo = lowered.as_text()
    print(f"{name:24s} trace={t1-t0:6.2f}s compile={t2-t1:7.2f}s "
          f"hlo_lines={len(hlo.splitlines()):7d}")
    return compiled


T = 8
a = fr.pack(list(range(1, T + 1)))
b = fr.pack(list(range(100, 100 + T)))

# correctness
r1 = np.asarray(jax.jit(fr.mont_mul)(a, b))
r2 = np.asarray(jax.jit(mont_mul_unrolled)(a, b))
assert (r1 == r2).all(), "mismatch!"
print("unrolled mont_mul bit-exact vs fori version")

timeit("mont_mul_unrolled", mont_mul_unrolled, a, b)

# eddsa with unrolled mont_mul: monkeypatch
fr.mont_mul = mont_mul_unrolled
import importlib
from circuits_tpu.ops import poseidon as pmod
importlib.reload(pmod)
from circuits_tpu.ops import babyjubjub as bjj
importlib.reload(bjj)

en = jnp.ones((T,), dtype=jnp.uint32)
timeit("eddsa_unrolled", bjj.eddsa_poseidon_verify, en, a, b, a, a, b, a)
