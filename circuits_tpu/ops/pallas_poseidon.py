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


def _addv(a, b):
    """Elementwise mod-p add of two (..., 16, S, 128) canonical stacks."""
    cols = [_limb(a, i) + _limb(b, i) for i in range(N_LIMBS)]
    return _stackl(_sub_if_ge(_carry_prop(cols), P)[:N_LIMBS])


# ---------------------------------------------------------------------------
# Optimized partial-round schedule (sparse factorization; constants from
# poseidon_constants.optimized_constants — bit-exact to the naive order).
# Per partial round: 1 S-box + t muls/1 reduction (row 0) + (t-1) muls
# (column tail) instead of t^2 muls/t reductions for the dense mix.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _np_opt_constants(t: int):
    from .poseidon_constants import optimized_constants

    oc = optimized_constants(t)
    rf, rp = N_ROUNDS_F, N_ROUNDS_P[t - 2]

    def vec_c(rows, shape_tail):  # -> (n, t', 16) Montgomery limbs
        arr = np.zeros((len(rows), len(rows[0]), N_LIMBS) + shape_tail,
                       dtype=np.uint32)
        for r, row in enumerate(rows):
            for i, v in enumerate(row):
                arr[(r, i)] = np.array(
                    _mont_limbs(v), dtype=np.uint32).reshape(
                        (N_LIMBS,) + (1,) * len(shape_tail))
        return arr

    CF = vec_c(oc["full_c"], (1, 1))                      # (rf, t, 16,1,1)
    D = vec_c([oc["d"]], (1, 1))[0]                       # (t, 16, 1, 1)
    E = vec_c([[v] for v in oc["e"]], (1, 1))             # (rp, 1, 16,1,1)
    Mc = np.zeros((t, t, N_LIMBS, 1, LANES), dtype=np.uint32)
    PS = np.zeros_like(Mc)
    for i in range(t):
        for j in range(t):
            Mc[i, j, :, 0, :] = np.array(
                _mont_limbs(oc["m"][i][j]), dtype=np.uint32)[:, None]
            PS[i, j, :, 0, :] = np.array(
                _mont_limbs(oc["pre_sparse"][i][j]),
                dtype=np.uint32)[:, None]
    SR = np.zeros((rp, t, N_LIMBS, 1, LANES), dtype=np.uint32)
    SC = np.zeros((rp, max(t - 1, 1), N_LIMBS, 1, LANES), dtype=np.uint32)
    for r in range(rp):
        for j in range(t):
            SR[r, j, :, 0, :] = np.array(
                _mont_limbs(oc["sparse_row"][r][j]),
                dtype=np.uint32)[:, None]
        for j in range(t - 1):
            SC[r, j, :, 0, :] = np.array(
                _mont_limbs(oc["sparse_col"][r][j]),
                dtype=np.uint32)[:, None]
    return CF, D, E, Mc, PS, SR, SC


def opt_full_round(s, c_r, Mc, *, t: int):
    """One full round of the optimized schedule: ARK + x^5 + MDS mix.
    Module-level so the CPU CI suite can execute the exact in-kernel
    round code in a small jit (tests/test_kernel_bodies.py)."""
    s = _add_c(s, c_r)
    s = _pow5(s)
    return _mix(s, Mc, t)


def opt_partial_round(s, e_r, sr_r, sc_r, *, t: int):
    """One sparse partial round: S-box on row 0, sparse row/col mix."""
    s0 = _pow5(s[0:1])
    s0 = _add_c(s0, e_r)
    s = jnp.concatenate([s0, s[1:]], axis=0)
    # row 0: one summed-column Montgomery reduction over t products
    cols = _schoolbook(s, sr_r)              # lists of (t, S, 128)
    rowc = []
    for c in cols:
        acc = c[0]
        for j in range(1, t):
            acc = acc + c[j]
        rowc.append(acc)
    out0 = _stackl(_mont_reduce(rowc, nsum=t))[None]
    # column tail: s[j] += SC[r][j-1] * s0
    prods = _stackl(_mont_reduce(
        _schoolbook(jnp.broadcast_to(s0, (t - 1,) + s0.shape[1:]),
                    sc_r), nsum=1))
    return jnp.concatenate([out0, _addv(s[1:], prods)], axis=0)


def permute_opt_body(state, cf_ref, d_ref, e_ref, m_ref, ps_ref, sr_ref,
                     sc_ref, *, t: int):
    """Shared in-kernel permutation body (optimized schedule); `state`
    (t, 16, S, 128) Montgomery; const refs per _np_opt_constants."""
    rf, rp = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    half = rf // 2
    Mc = m_ref[...]

    def full_round(r, s):
        return opt_full_round(s, cf_ref[r], Mc, t=t)

    state = jax.lax.fori_loop(0, half - 1, full_round, state)
    state = _add_c(state, cf_ref[half - 1])
    state = _pow5(state)
    state = _mix(state, ps_ref[...], t)      # pre-sparse mix
    state = _add_c(state, d_ref[...])        # first partial round's ARK

    def partial(r, s):
        return opt_partial_round(s, e_ref[r], sr_ref[r], sc_ref[r], t=t)

    state = jax.lax.fori_loop(0, rp, partial, state)
    return jax.lax.fori_loop(half, rf, full_round, state)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _opt_kernel(x_ref, cf_ref, d_ref, e_ref, m_ref, ps_ref, sr_ref,
                sc_ref, o_ref, *, t: int):
    o_ref[...] = permute_opt_body(
        x_ref[...], cf_ref, d_ref, e_ref, m_ref, ps_ref, sr_ref, sc_ref,
        t=t)


import os as _os

# Read once at import: lru_cached compiles capture this value, so a
# post-compile env flip would otherwise be silently ignored (and
# pallas_poseidon / pallas_smt could even disagree if flipped between
# their first compiles).
_SPARSE = _os.environ.get("CTPU_POSEIDON_SPARSE", "1") not in ("0", "false")


def _use_sparse() -> bool:
    return _SPARSE


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


def _const_spec(arr):
    return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                        memory_space=pltpu.VMEM)


@lru_cache(maxsize=None)
def _compiled(t: int, s: int, nb: int, interpret: bool):
    spec = pl.BlockSpec((t, N_LIMBS, s, LANES), lambda i: (0, 0, i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((t, N_LIMBS, nb * s, LANES),
                                     jnp.uint32)
    if _use_sparse():
        consts = _np_opt_constants(t)
        call = pl.pallas_call(
            partial(_opt_kernel, t=t),
            grid=(nb,),
            in_specs=[spec] + [_const_spec(c) for c in consts],
            out_specs=spec,
            out_shape=out_shape,
            interpret=interpret,
            # the t=7 sparse partial body needs ~17M of scoped vmem
            # (16M default limit) — same raise as pallas_smt/_eddsa
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        # NOTE: keep the constants as numpy in the closure — a
        # jnp.asarray here would materialize inside whatever trace first
        # calls this (lru_cache outlives the trace).
        return jax.jit(lambda x: call(x, *consts))
    Cc, Mc, rf, rp = _np_constants(t)
    nr = rf + rp
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
        out_shape=out_shape,
        interpret=interpret,
    )
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
