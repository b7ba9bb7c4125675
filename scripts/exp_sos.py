"""Experiment: while-free mont_mul via separate (SOS) Montgomery reduction.

Measures standalone compile, a 100-deep top-level chain, and a scan body
with 13 of them — the three shapes that appear in the models.
"""

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
from circuits_tpu.field.scalar import P, N_LIMBS, R

MASK = np.uint32(0xFFFF)
SH16 = np.uint32(16)
NP_FULL = (-pow(P, -1, 1 << 256)) % (1 << 256)  # n' = -p^-1 mod R
_NP_LIMBS = [np.uint32((NP_FULL >> (16 * i)) & 0xFFFF) for i in range(16)]
_P_LIMBS = [np.uint32((P >> (16 * i)) & 0xFFFF) for i in range(16)]

# anti-diagonal gather indices (same trick as fr.mont_mul)
_DIAG = np.add.outer(32 * np.arange(16), np.arange(33)).astype(np.int32)
# low-triangular variant for mod-R products: entry (i, j) with i+j < 16
_DIAG_LO = np.add.outer(17 * np.arange(16), np.arange(17)).astype(np.int32)


def _conv_cols(a, b):
    """Full product columns: 33 lazy u32 cols, (33, *batch)."""
    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    prod = a[:, None] * b[None, :]
    lo = prod & MASK
    hi = prod >> SH16
    padw = [(0, 0)] * prod.ndim
    pl_ = list(padw); pl_[1] = (0, 33 - 16)
    ph_ = list(padw); ph_[1] = (1, 33 - 17)
    rows = jnp.pad(lo, pl_) + jnp.pad(hi, ph_)
    flat = rows.reshape((16 * 33,) + bshape)
    return jnp.sum(jnp.take(flat, jnp.asarray(_DIAG), axis=0), axis=0)


def _mul_mod_R(t_lo, c_limbs):
    """t_lo: (16, *batch) exact limbs; c_limbs: 16 np.uint32 constants.
    Returns exact low-256-bit product limbs (16, *batch)."""
    c = jnp.asarray(np.array(c_limbs, dtype=np.uint32)
                    .reshape((16,) + (1,) * (t_lo.ndim - 1)))
    cols = _conv_cols(t_lo, jnp.broadcast_to(c, t_lo.shape))
    # carry-propagate 16 cols (drop overflow past 2^256)
    out = []
    carry = None
    for k in range(16):
        v = cols[k] if carry is None else cols[k] + carry
        out.append(v & MASK)
        carry = v >> SH16
    return jnp.stack(out, axis=0)


def mont_mul_sos(a, b):
    """a*b*R^-1 mod p — separate Montgomery reduction, zero while loops."""
    cols_t = _conv_cols(a, b)  # (33, *batch) lazy
    # exact low 16 limbs of t
    t_lo = []
    carry = None
    for k in range(16):
        v = cols_t[k] if carry is None else cols_t[k] + carry
        t_lo.append(v & MASK)
        carry = v >> SH16
    t_lo_arr = jnp.stack(t_lo, axis=0)
    m = _mul_mod_R(t_lo_arr, _NP_LIMBS)  # exact, < R
    p_arr = jnp.asarray(np.array(_P_LIMBS, dtype=np.uint32)
                        .reshape((16,) + (1,) * (a.ndim - 1)))
    cols_mp = _conv_cols(m, jnp.broadcast_to(p_arr, m.shape))
    # u = (t + m*p) / R : sum lazy columns, propagate through all 33
    # (low 16 columns of the sum are ≡ 0 mod 2^256; carries ride up)
    cols = cols_t + cols_mp
    out = []
    carry = None
    for k in range(33):
        v = cols[k] if carry is None else cols[k] + carry
        if k >= 16:
            out.append(v & MASK)
        carry = v >> SH16
    out.append(carry)  # 18 entries
    limbs = fr._sub_if_ge(out, fr._P_LIMBS_NP)
    return jnp.stack(limbs[:16], axis=0)


def timeit(name, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    lowered.compile()
    t2 = time.time()
    print(f"{name:24s} trace={t1-t0:6.2f}s compile={t2-t1:7.2f}s "
          f"hlo_lines={len(lowered.as_text().splitlines()):7d}", flush=True)


T = 8
rng = np.random.default_rng(0)
va = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % P
      for _ in range(T)]
vb = [(int(rng.integers(0, 2**63)) ** 3 + i) % P for i, _ in enumerate(range(T))]
a = fr.pack(va)
b = fr.pack(vb)

ref = np.asarray(jax.jit(fr.mont_mul)(a, b))
got = np.asarray(jax.jit(mont_mul_sos)(a, b))
assert (ref == got).all(), (fr.unpack_np(ref), fr.unpack_np(got))
print("SOS mont_mul bit-exact vs CIOS", flush=True)

timeit("sos_standalone", mont_mul_sos, a, b)


def chain100(x, y):
    for _ in range(100):
        x = mont_mul_sos(x, y)
    return x


timeit("sos_chain100", chain100, a, b)


def scan13(x):
    def body(c, _):
        for _ in range(13):
            c = mont_mul_sos(c, x)
        return c, None
    out, _ = jax.lax.scan(body, x, None, length=64)
    return out


timeit("sos_scan64_body13", scan13, a)
