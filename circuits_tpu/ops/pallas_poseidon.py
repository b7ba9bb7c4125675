"""Pallas TPU kernel for the Poseidon permutation over BN254 Fr.

This is the fused hot-kernel replacement for the XLA scan in
``ops/poseidon.py`` (hot kernel #1: the reference burns ~77% of its
constraint mass in SMT/EdDSA Poseidons, SURVEY.md §6; reference field
inner loop: ffiasm x86-64 Montgomery asm, /root/reference/tools/helpers/
actions.js:207-229).

Design (TPU-first):
  * Layout (t, 16, S, 128): the Poseidon width t and the 16 Montgomery
    limbs are *structural* axes (only ever statically sliced); the
    witness batch fills a full VPU tile — S sublanes x 128 lanes — so
    every vector op runs at 100%% lane AND sublane utilization even for
    t=3 (the SMT inner hash, by far the hottest width).
  * Montgomery CIOS (16x16-bit limbs) fully unrolled as straight-line
    VPU code — no gathers, no dynamic slices, no inner fori_loop
    (contrast with the XLA path, which must keep its jaxpr small
    because it inlines at every call site; the kernel compiles once).
  * The MDS mix uses *summed-column* Montgomery reduction: schoolbook
    columns for all t products of one output element are accumulated
    lazily (bounded by t*2^21 < 2^24 per uint32 column) and reduced
    once — t x fewer reduction steps than t independent muls.
  * Round constants live in a VMEM ref indexed per round inside three
    fori_loop phases (full / partial / full), so partial rounds S-box
    only state[0].
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.scalar import P, R as MONT_R, N_LIMBS, N0, to_limbs
from .poseidon_constants import constants, N_ROUNDS_F, N_ROUNDS_P

LANES = 128
SUBLANES = 8
MASK = np.uint32(0xFFFF)
SH16 = np.uint32(16)
_PL = [np.uint32((P >> (16 * i)) & 0xFFFF) for i in range(N_LIMBS)]
_N0 = np.uint32(N0)


def _mont_limbs(x: int) -> list[int]:
    return to_limbs((x * MONT_R) % P)


@lru_cache(maxsize=None)
def _np_constants(t: int):
    C, M = constants(t)
    rf, rp = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    nr = rf + rp
    Cc = np.zeros((nr, t, N_LIMBS, 1, 1), dtype=np.uint32)
    for r in range(nr):
        for i in range(t):
            Cc[r, i, :, 0, 0] = _mont_limbs(C[r * t + i])
    Mc = np.zeros((t, t, N_LIMBS, 1, LANES), dtype=np.uint32)
    for i in range(t):
        for j in range(t):
            Mc[i, j, :, 0, :] = np.array(_mont_limbs(M[i][j]),
                                         dtype=np.uint32)[:, None]
    return Cc, Mc, rf, rp


# ---------------------------------------------------------------------------
# In-kernel field helpers. Arrays carry the limb axis at position -3
# (shape (..., 16, S, 128)); lazy uint32 columns are (..., S, 128).
# ---------------------------------------------------------------------------


def _carry_prop(cols):
    out = []
    carry = None
    for c in cols:
        v = c if carry is None else c + carry
        out.append(v & MASK)
        carry = v >> SH16
    out.append(carry)
    return out


def _sub_if_ge(limbs, mod: int):
    """Conditionally subtract the python-int modulus; limbs normalized."""
    n = len(limbs)
    ml = [np.uint32((mod >> (16 * i)) & 0xFFFF) for i in range(n)]
    diff = []
    borrow = jnp.zeros_like(limbs[0])
    for i in range(n):
        d = limbs[i] - ml[i] - borrow
        borrow = (d >> np.uint32(31)) & np.uint32(1)
        diff.append(d & MASK)
    keep = borrow.astype(jnp.bool_)
    return [jnp.where(keep, limbs[i], diff[i]) for i in range(n)]


def _limb(x, i):
    return x[..., i, :, :]


def _schoolbook(a, b):
    """a, b: (..., 16, S, 128) -> 33 lazy columns (..., S, 128)."""
    cols = [None] * (2 * N_LIMBS + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N_LIMBS):
        ai = _limb(a, i)
        for j in range(N_LIMBS):
            p = ai * _limb(b, j)
            acc(i + j, p & MASK)
            acc(i + j + 1, p >> SH16)
    # top column (index 32) receives no partial product — zero-fill
    return [jnp.zeros_like(cols[0]) if c is None else c for c in cols]


def _mont_reduce(cols, nsum: int):
    """16 CIOS steps on lazy columns (each < nsum * 2^21 + 2^21); returns
    canonical limb list of length 16. Result value < (nsum*p/R + 1)*p."""
    for i in range(N_LIMBS):
        m = (cols[i] * _N0) & MASK
        for j in range(N_LIMBS):
            q = m * _PL[j]
            cols[i + j] = cols[i + j] + (q & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (q >> SH16)
        cols[i + 1] = cols[i + 1] + (cols[i] >> SH16)
    limbs = _carry_prop(cols[N_LIMBS:2 * N_LIMBS + 1])  # 18 normalized
    if nsum > 4:
        limbs = _sub_if_ge(limbs, 4 * P)
    if nsum > 1:
        limbs = _sub_if_ge(limbs, 2 * P)
    limbs = _sub_if_ge(limbs, P)
    return limbs[:N_LIMBS]


def _stackl(limbs):
    return jnp.stack(limbs, axis=-3)


def _mm(a, b):
    """Montgomery mul, canonical in/out; (..., 16, S, 128)."""
    return _stackl(_mont_reduce(_schoolbook(a, b), nsum=1))


def _pow5(s):
    s2 = _mm(s, s)
    s4 = _mm(s2, s2)
    return _mm(s4, s)


def _add_c(s, c):
    """s + c mod p; s (t, 16, S, 128) canonical, c (t, 16, 1, 1)."""
    cols = [_limb(s, i) + _limb(c, i) for i in range(N_LIMBS)]
    limbs = _sub_if_ge(_carry_prop(cols), P)
    return _stackl(limbs[:N_LIMBS])


def _mix(s, Mc, t):
    """MDS mix: out[i] = sum_j M[i][j] * s[j] (Montgomery domain).

    One schoolbook over (t_out, t_in, 16, S, 128), columns summed over
    t_in before a single Montgomery reduction per output element."""
    a = jnp.broadcast_to(s[None], (t,) + s.shape)  # a[i, j] = s[j]
    cols = _schoolbook(a, Mc)                      # each (t, t, S, 128)

    # sum over t_in (mosaic: no uint reductions -> explicit slice adds)
    def jsum(c):
        acc = c[:, 0]
        for j in range(1, t):
            acc = acc + c[:, j]
        return acc

    cols = [jsum(c) for c in cols]                 # (t, S, 128)
    return _stackl(_mont_reduce(cols, nsum=t))


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _kernel(x_ref, c_ref, m_ref, o_ref, *, t: int):
    _, _, rf, rp = _np_constants(t)
    Mc = m_ref[...]  # (t, t, 16, 1, 128); S broadcasts at use
    half = rf // 2
    state = x_ref[...]  # (t, 16, S, 128)

    def full_round(r, s):
        c = c_ref[r]  # dynamic ref index: (t, 16, 1, 1)
        s = _add_c(s, c)
        s = _pow5(s)
        return _mix(s, Mc, t)

    def partial_round(r, s):
        c = c_ref[r]
        s = _add_c(s, c)
        s0 = _pow5(s[0:1])
        s = jnp.concatenate([s0, s[1:]], axis=0)
        return _mix(s, Mc, t)

    state = jax.lax.fori_loop(0, half, full_round, state)
    state = jax.lax.fori_loop(half, half + rp, partial_round, state)
    state = jax.lax.fori_loop(half + rp, rf + rp, full_round, state)
    o_ref[...] = state


@lru_cache(maxsize=None)
def _compiled(t: int, s: int, nb: int, interpret: bool):
    Cc, Mc, rf, rp = _np_constants(t)
    nr = rf + rp
    spec = pl.BlockSpec((t, N_LIMBS, s, LANES), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((nr, t, N_LIMBS, 1, 1), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((t, t, N_LIMBS, 1, LANES),
                         lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel, t=t),
        grid=(nb,),
        in_specs=[spec, cspec, mspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((t, N_LIMBS, nb * s, LANES),
                                       jnp.uint32),
        interpret=interpret,
    )
    # NOTE: keep the constants as numpy in the closure — a jnp.asarray
    # here would materialize inside whatever trace first calls this
    # (lru_cache outlives the trace -> UnexpectedTracerError).
    return jax.jit(lambda x: call(x, Cc, Mc))


def _block_shape(b: int) -> tuple[int, int]:
    """Pick (sublanes, n_blocks) for a batch of b lanes."""
    rows = max(1, -(-b // LANES))
    s = min(SUBLANES, rows)
    nb = -(-rows // s)
    return s, nb


def permute_mont(state_m: jnp.ndarray, *, interpret: bool = False
                 ) -> jnp.ndarray:
    """Drop-in for poseidon.permute_mont: (16, t, B) Montgomery in/out."""
    t = state_m.shape[1]
    b = state_m.shape[2]
    s, nb = _block_shape(b)
    bp = nb * s * LANES
    x = jnp.swapaxes(state_m, 0, 1)  # (t, 16, B)
    if bp != b:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, bp - b)))
    x = x.reshape(t, N_LIMBS, nb * s, LANES)
    out = _compiled(t, s, nb, interpret)(x)
    out = out.reshape(t, N_LIMBS, bp)
    return jnp.swapaxes(out[:, :, :b], 0, 1)
