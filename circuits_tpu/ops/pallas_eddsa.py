"""Pallas TPU kernel for the EdDSA-Poseidon group-equation check.

Hot kernel #2 (after the Poseidon permutation): the per-tx cost of
`EdDSAPoseidonVerifier` (reference: circomlib, used by
/root/reference/src/rollup-tx.circom:2) is dominated by ~3.8k Montgomery
multiplies of BabyJubJub point arithmetic.  The XLA path
(ops/babyjubjub.py) evaluates them as a 302-step chain of scans whose
bodies each round-trip HBM; this kernel fuses the ENTIRE check
  S*B8 == R8 + Poseidon(R8x,R8y,Ax,Ay,M)*A
into one VMEM-resident Pallas program.

Design (TPU-first, same layout family as pallas_poseidon):
  * batch fills a full VPU tile (S sublanes x 128 lanes); the 16
    Montgomery limbs are a structural axis, statically sliced.
  * fixed-base S*B8: 4-bit comb over a host-precomputed 64x16 window
    table (VMEM const) — zero doublings; per-window entry selection is a
    16-way masked sum (VPU selects, no gathers).
  * variable-base hm*A: windowed Horner — an in-kernel 16-entry table of
    d*A (14 mixed adds), then 64 iterations of (4 doublings + 1 add).
  * the group equation is checked projectively (X1 Z2 == X2 Z1 ...), so
    no inversion and no negation are needed.
  * unified twisted-Edwards formulas only (complete on BabyJubJub):
    padd 13 muls / mixed padd 12 / double 8, with curve constants baked
    into per-limb scalar multiplies (`_mm_const` — no constant arrays).
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.scalar import P, R as MONT_R, N_LIMBS
from .pallas_poseidon import (LANES, MASK, _carry_prop, _sub_if_ge,
                              _mont_reduce, _schoolbook, _stackl, _limb,
                              _mm, _block_shape)

_A_CONST = 168700   # BabyJubJub a (builder/babyjub.py:17)
_D_CONST = 168696   # BabyJubJub d

_PL_INT = [(P >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)]
_BIAS = sum((1 << 16) << (16 * i) for i in range(N_LIMBS))


def _mont_limb_ints(x: int) -> list[int]:
    v = (x * MONT_R) % P
    return [(v >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)]

_AR = _mont_limb_ints(_A_CONST)
_DR = _mont_limb_ints(_D_CONST)
_ONE_R = _mont_limb_ints(1)


# ---------------------------------------------------------------------------
# In-kernel field helpers on stacked (16, S, 128) canonical values
# ---------------------------------------------------------------------------


def _fadd(a, b):
    cols = [_limb(a, i) + _limb(b, i) for i in range(N_LIMBS)]
    return _stackl(_sub_if_ge(_carry_prop(cols), P)[:N_LIMBS])


def _sub_exact(limbs, mod: int):
    ml = [np.uint32((mod >> (16 * i)) & 0xFFFF) for i in range(len(limbs))]
    out, borrow = [], jnp.zeros_like(limbs[0])
    for i in range(len(limbs)):
        d = limbs[i] - ml[i] - borrow
        borrow = (d >> np.uint32(31)) & np.uint32(1)
        out.append(d & MASK)
    return out


def _fsub(a, b):
    # bias keeps every column non-negative in uint32 (see field/fr.py:202)
    cols = [_limb(a, i) + np.uint32(_PL_INT[i]) + np.uint32(0x10000)
            - _limb(b, i) for i in range(N_LIMBS)]
    limbs = _sub_exact(_carry_prop(cols), _BIAS)
    return _stackl(_sub_if_ge(limbs, P)[:N_LIMBS])


def _mm_const(a, cl):
    """Montgomery mul by a fixed constant whose limbs are python ints —
    partial products against scalars, no constant arrays in the kernel."""
    cols = [None] * (2 * N_LIMBS + 1)

    def acc(k, v):
        cols[k] = v if cols[k] is None else cols[k] + v

    for i in range(N_LIMBS):
        ai = _limb(a, i)
        for j in range(N_LIMBS):
            if cl[j] == 0:
                continue
            p = ai * np.uint32(cl[j])
            acc(i + j, p & MASK)
            acc(i + j + 1, p >> np.uint32(16))
    cols = [jnp.zeros_like(a[..., 0, :, :]) if c is None else c
            for c in cols]
    return _stackl(_mont_reduce(cols, nsum=1))


def _feq(a, b):
    acc = _limb(a, 0) ^ _limb(b, 0)
    for i in range(1, N_LIMBS):
        acc = acc | (_limb(a, i) ^ _limb(b, i))
    return acc == 0


def _one_like(ref):
    """Montgomery 1 broadcast to ref's (16, S, 128) shape."""
    bshape = ref.shape[-2:]
    return jnp.stack([jnp.full(bshape, np.uint32(l)) for l in _ONE_R])


# ---------------------------------------------------------------------------
# Curve formulas (projective twisted Edwards, Montgomery-domain coords)
# ---------------------------------------------------------------------------


def _padd(p1, p2):
    """Unified add (add-2008-bbjlp), 13 muls."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    a = _mm(z1, z2)
    b = _mm(a, a)
    c = _mm(x1, x2)
    d = _mm(y1, y2)
    e = _mm_const(_mm(c, d), _DR)
    f = _fsub(b, e)
    g = _fadd(b, e)
    t = _mm(_fadd(x1, y1), _fadd(x2, y2))
    u = _fsub(_fsub(t, c), d)
    v = _fsub(d, _mm_const(c, _AR))
    x3 = _mm(_mm(a, f), u)
    y3 = _mm(_mm(a, g), v)
    z3 = _mm(f, g)
    return (x3, y3, z3)


def _padd_affine(p1, q):
    """Mixed add with affine q=(x2, y2) (Z2=1), 12 muls."""
    x1, y1, z1 = p1
    x2, y2 = q
    b = _mm(z1, z1)
    c = _mm(x1, x2)
    d = _mm(y1, y2)
    e = _mm_const(_mm(c, d), _DR)
    f = _fsub(b, e)
    g = _fadd(b, e)
    t = _mm(_fadd(x1, y1), _fadd(x2, y2))
    u = _fsub(_fsub(t, c), d)
    v = _fsub(d, _mm_const(c, _AR))
    x3 = _mm(_mm(z1, f), u)
    y3 = _mm(_mm(z1, g), v)
    z3 = _mm(f, g)
    return (x3, y3, z3)


def _pdouble(p):
    """dbl-2008-bbjlp, 8 muls."""
    x, y, z = p
    xy = _fadd(x, y)
    b = _mm(xy, xy)
    c = _mm(x, x)
    d = _mm(y, y)
    h = _mm(z, z)
    e = _mm_const(c, _AR)
    f = _fadd(e, d)
    j = _fsub(_fsub(f, h), h)
    x3 = _mm(_fsub(_fsub(b, c), d), j)
    y3 = _mm(f, _fsub(e, d))
    z3 = _mm(f, j)
    return (x3, y3, z3)


def _digit(ref, jj):
    """4-bit window jj (0..63, LSB-first, int32 scalar) of a (16, S, 128)
    limb VMEM ref (dynamic ref indexing — Mosaic has no dynamic_slice on
    values)."""
    limb = ref[jj // 4]
    sh = jax.lax.convert_element_type((jj % 4) * 4, jnp.uint32)
    return (limb >> sh) & np.uint32(15)


def _masked_entry(tabs, d):
    """16-way masked-sum select: tabs = per-coord (16ent, 16, S, 128) (or
    broadcastable), d (S, 128) digit. Returns tuple of (16, S, 128)."""
    outs = []
    for tab in tabs:
        acc = None
        for dd in range(16):
            m = (d == np.uint32(dd)).astype(jnp.uint32)[None]
            v = m * tab[dd]
            acc = v if acc is None else acc + v
        outs.append(acc)
    return tuple(outs)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _kernel(s_ref, hm_ref, ax_ref, ay_ref, r8x_ref, r8y_ref, tab_ref,
            ok_ref, tax_ref, tay_ref, taz_ref):
    ax, ay = ax_ref[...], ay_ref[...]
    one = _one_like(ax)
    zero = jnp.zeros_like(ax)
    ident = (zero, one, one)

    # 16-entry table of d*A (projective) in VMEM scratch: T[0]=id,
    # T[1]=A, T[d]=T[d-1]+A — built by a fori_loop so the 14 adds don't
    # sit in one straight-line stack frame (scoped-vmem OOM otherwise)
    tax_ref[0], tay_ref[0], taz_ref[0] = zero, one, one
    tax_ref[1], tay_ref[1], taz_ref[1] = ax, ay, one

    def build(d, _):
        cur = _padd_affine((tax_ref[d - 1], tay_ref[d - 1],
                            taz_ref[d - 1]), (ax, ay))
        tax_ref[d], tay_ref[d], taz_ref[d] = cur
        return 0

    jax.lax.fori_loop(2, 16, build, 0)

    def body(k, carry):
        var, fix = carry
        jj = 63 - k
        # variable-base Horner step: var = 16*var + d_hm * A
        # (doublings in a sub-loop: Mosaic stack-allocates per straight-
        # line body, so 4 unrolled pdoubles would 4x the frame)
        var = jax.lax.fori_loop(0, 4, lambda _, p: _pdouble(p), var)
        var = _padd(var, _masked_entry(
            (tax_ref, tay_ref, taz_ref), _digit(hm_ref, jj)))
        # fixed-base comb step: fix += TAB[jj][d_s]  (affine entries)
        tab_j = tab_ref[jj]  # (16ent, 2, 16, 1, 1)
        px, py = _masked_entry((tab_j[:, 0], tab_j[:, 1]),
                               _digit(s_ref, jj))
        fix = _padd_affine(fix, (px, py))
        return (var, fix)

    var, fix = jax.lax.fori_loop(
        0, 64, body, (ident, ident))

    # fix == R8 + var, checked projectively (R8 affine)
    rhs = _padd_affine(var, (r8x_ref[...], r8y_ref[...]))
    fx, fy, fz = fix
    rx, ry, rz = rhs
    ok = (_feq(_mm(fx, rz), _mm(rx, fz))
          & _feq(_mm(fy, rz), _mm(ry, fz)))
    ok_ref[...] = ok.astype(jnp.uint32)


@lru_cache(maxsize=None)
def _np_comb_table() -> np.ndarray:
    """(64, 16, 2, 16, 1, 1): TAB[j][d] = d * 16^j * B8 affine Montgomery
    (d=0 row = affine identity (0, 1)); reuses the host table from
    ops/babyjubjub.py."""
    from .babyjubjub import _base8_window_table
    return _base8_window_table().reshape(64, 16, 2, N_LIMBS, 1, 1)


@lru_cache(maxsize=None)
def _compiled(s: int, nb: int, interpret: bool):
    tab = _np_comb_table()
    spec = pl.BlockSpec((N_LIMBS, s, LANES), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec(tab.shape, lambda i: (0,) * 6,
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((s, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((16, N_LIMBS, s, LANES), jnp.uint32)] * 3
    call = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[spec] * 6 + [tspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((nb * s, LANES), jnp.uint32),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda *a: call(*a, tab))


def eddsa_ok_mont(ax_m, ay_m, s, r8x_m, r8y_m, hm, *,
                  interpret: bool = False):
    """Fused check S*B8 == R8 + hm*A. Coords Montgomery affine, s/hm
    canonical; all (16, *batch). Returns (batch,) bool."""
    bshape = ax_m.shape[1:]
    b = int(np.prod(bshape)) if bshape else 1
    su, nb = _block_shape(b)
    bp = nb * su * LANES

    def prep(x):
        x = jnp.broadcast_to(x, (N_LIMBS,) + bshape).reshape(N_LIMBS, b)
        if bp != b:
            x = jnp.pad(x, ((0, 0), (0, bp - b)))
        return x.reshape(N_LIMBS, nb * su, LANES)

    ok = _compiled(su, nb, interpret)(
        prep(s), prep(hm), prep(ax_m), prep(ay_m), prep(r8x_m),
        prep(r8y_m))
    return ok.reshape(bp)[:b].reshape(bshape).astype(jnp.bool_)
