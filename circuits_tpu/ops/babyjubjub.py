"""Batched BabyJubJub point arithmetic + EdDSA-Poseidon verification.

Replicates circomlib's in-circuit gadgets (`EdDSAPoseidonVerifier`,
`Bits2Point_Strict`; reference usage /root/reference/src/rollup-tx.circom:2,
src/lib/utils-bjj.circom:2) as batched TPU kernels.

Points are projective (X:Y:Z) with coordinates in Montgomery form, shape
(16, *batch) each. The unified twisted-Edwards addition is complete on
BabyJubJub (a square, d non-square), so masked double-and-add ladders never
hit exceptional cases.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import fr
from ..field.scalar import P, R as MONT_R, N_LIMBS, to_limbs
from ..builder.babyjub import (A as BJJ_A, D as BJJ_D, BASE8, IDENTITY,
                               add_point)
from .poseidon import poseidon


def _mont_np(x: int) -> np.ndarray:
    return np.array(to_limbs((x * MONT_R) % P), dtype=np.uint32)


def _mc(x: int, ndim: int) -> jnp.ndarray:
    """Montgomery-form constant broadcast over batch dims."""
    return jnp.asarray(_mont_np(x).reshape((N_LIMBS,) + (1,) * (ndim - 1)))


def identity(bshape):
    """Projective identity (0 : 1 : 1), Montgomery form."""
    zero = fr.zeros(bshape)
    one = jnp.broadcast_to(
        jnp.asarray(_mont_np(1).reshape((N_LIMBS,) + (1,) * len(bshape))),
        (N_LIMBS,) + tuple(bshape))
    return (zero, one, one)


def from_affine_mont(x_m, y_m):
    one = jnp.broadcast_to(
        jnp.asarray(_mont_np(1).reshape((N_LIMBS,) + (1,) * (x_m.ndim - 1))),
        x_m.shape)
    return (x_m, y_m, one)


def _mm_batch(pairs):
    """One mont_mul over the concatenated batch of several independent
    (a, b) multiplies — curve-add bodies inline into the scalar-mul loop
    bodies, so fewer+wider multiplies cut both compile time and per-lane
    launch overhead."""
    n = len(pairs)
    bshape = jnp.broadcast_shapes(
        *[p[i].shape[1:] for p in pairs for i in (0, 1)])
    shape = (pairs[0][0].shape[0],) + bshape
    a = jnp.concatenate(
        [jnp.broadcast_to(p[0], shape).reshape(shape[0], -1)
         for p in pairs], axis=-1)
    b = jnp.concatenate(
        [jnp.broadcast_to(p[1], shape).reshape(shape[0], -1)
         for p in pairs], axis=-1)
    r = fr.mont_mul(a, b)
    sz = r.shape[-1] // n
    return [r[:, i * sz:(i + 1) * sz].reshape(shape) for i in range(n)]


def padd(p1, p2):
    """Unified projective twisted-Edwards addition (add-2008-bbjlp),
    restructured into 5 batched mont_mul stages (4+2+2+3+2 lanes)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    a, c, d, t = _mm_batch([(z1, z2), (x1, x2), (y1, y2),
                            (fr.add(x1, y1), fr.add(x2, y2))])
    bb, cd = _mm_batch([(a, a), (c, d)])
    e, ac = _mm_batch([(_mc(BJJ_D, x1.ndim), cd),
                       (_mc(BJJ_A, x1.ndim), c)])
    f = fr.sub(bb, e)
    g = fr.add(bb, e)
    u = fr.sub(fr.sub(t, c), d)
    v = fr.sub(d, ac)
    af, ag, z3 = _mm_batch([(a, f), (a, g), (f, g)])
    x3, y3 = _mm_batch([(af, u), (ag, v)])
    return (x3, y3, z3)


def pdouble(p):
    return padd(p, p)


def pselect(cond, p1, p2):
    return tuple(fr.select(cond, u, v) for u, v in zip(p1, p2))


_WINDOW = 4
_NDIGITS = 256 // _WINDOW


def _digits(bits):
    """bits (nbits, *batch) 0/1 LSB-first -> (64, *batch) int32 radix-16
    digits, least-significant digit first."""
    nbits = bits.shape[0]
    bshape = bits.shape[1:]
    b = bits.astype(jnp.int32)
    if nbits < 256:
        b = jnp.concatenate(
            [b, jnp.zeros((256 - nbits,) + bshape, jnp.int32)], axis=0)
    grouped = b.reshape((_NDIGITS, _WINDOW) + bshape)
    weights = jnp.asarray(
        (1 << np.arange(_WINDOW, dtype=np.int32))
        .reshape((1, _WINDOW) + (1,) * len(bshape)))
    return jnp.sum(grouped * weights, axis=1)


def scalar_mul_var(bits, point):
    """Variable-base scalar multiply: bits (nbits, *batch) 0/1 LSB-first,
    point projective Montgomery. Windowed (w=4): build the 16-entry
    multiples table at runtime (15 adds), then scan 64 digits MSB-first
    with 4 doublings + 1 table-gather add per digit — ~1.6x fewer curve
    adds than a bit-serial ladder, and every lane always does identical
    work (no divergence to mask)."""
    bshape = bits.shape[1:]
    digits = _digits(bits)  # (64, *batch), LSB-first

    # runtime table T[d] = d * point (d = 0..15), built with a scan so the
    # add compiles once
    def tab_body(prev, _):
        nxt = padd(prev, point)
        return nxt, prev

    _, rows = jax.lax.scan(tab_body, identity(bshape), None, length=16)
    # rows[c]: (16entries, 16limbs, *batch) -> (16limbs, 16entries, *batch)
    tab = tuple(jnp.moveaxis(rows[c], 0, 1) for c in range(3))

    def gather(digit):
        idx = digit[None, None]  # (1, 1, *batch)
        return tuple(
            jnp.take_along_axis(tc, idx, axis=1)[:, 0] for tc in tab)

    def body(acc, digit):
        for _ in range(_WINDOW):
            acc = pdouble(acc)
        acc = padd(acc, gather(digit))
        return acc, None

    acc, _ = jax.lax.scan(body, identity(bshape),
                          jnp.flip(digits, axis=0))
    return acc


_BASE8_WTABLE: np.ndarray | None = None


def _base8_window_table() -> np.ndarray:
    """Host-precomputed affine table: TAB[j][d] = d * 16^j * BASE8,
    Montgomery form, shape (64, 16, 2, 16limbs). d=0 row stores the
    affine identity (0, 1)."""
    global _BASE8_WTABLE
    if _BASE8_WTABLE is None:
        tab = np.zeros((_NDIGITS, 16, 2, N_LIMBS), dtype=np.uint32)
        base = BASE8
        for j in range(_NDIGITS):
            pt = IDENTITY
            for d in range(16):
                tab[j, d, 0] = _mont_np(pt[0])
                tab[j, d, 1] = _mont_np(pt[1])
                pt = add_point(pt, base)
            for _ in range(_WINDOW):
                base = add_point(base, base)
        _BASE8_WTABLE = tab
    return _BASE8_WTABLE


def scalar_mul_base8(bits):
    """Fixed-base multiply by BASE8: host-precomputed comb table (one
    16-entry window per radix-16 digit), 64 mixed additions total — no
    doublings at all on device."""
    bshape = bits.shape[1:]
    digits = _digits(bits)  # (64, *batch) LSB-first
    tab = jnp.asarray(_base8_window_table())  # (64, 16, 2, 16)

    def body(acc, xs):
        tab_j, digit = xs  # (16, 2, 16limbs), (*batch,)
        pt = jnp.take(tab_j, digit, axis=0)  # (*batch, 2, 16limbs)
        px = jnp.moveaxis(pt[..., 0, :], -1, 0)  # (16, *batch)
        py = jnp.moveaxis(pt[..., 1, :], -1, 0)
        acc = padd(acc, from_affine_mont(px, py))
        return acc, None

    acc, _ = jax.lax.scan(body, identity(bshape), (tab, digits))
    return acc


def points_equal(p1, p2):
    """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1; (batch,) bool."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    ex = fr.eq(fr.mont_mul(x1, z2), fr.mont_mul(x2, z1))
    ey = fr.eq(fr.mont_mul(y1, z2), fr.mont_mul(y2, z1))
    return ex & ey


def ay_sign_to_ax(ay, sign):
    """Batched `AySign2Ax` (src/lib/utils-bjj.circom:37-58 →
    circomlib Bits2Point_Strict): recover x from y and the sign bit.

    Returns (ax, on_curve): ax canonical; on_curve False marks invalid
    compressed points (a constraint failure in the reference circuit).
    sign convention: sign=1 <=> x > (p-1)/2 (circomlib packPoint).
    """
    one = fr.const(1, ay.shape[1:])
    y2 = fr.mul(ay, ay)
    num = fr.sub(jnp.broadcast_to(one, ay.shape), y2)
    a_c = fr.const(BJJ_A, ay.shape[1:])
    d_c = fr.const(BJJ_D, ay.shape[1:])
    den = fr.sub(jnp.broadcast_to(a_c, ay.shape), fr.mul(d_c, y2))
    x2 = fr.mul(num, fr.inv(den))
    root, ok = fr.sqrt(x2)  # minimal root
    big = fr.neg(root)
    ax = fr.select(sign, big, root)
    den_zero = fr.is_zero(den)
    return ax, ok & ~den_zero


def eddsa_poseidon_verify(enabled, ax, ay, s, r8x, r8y, msg):
    """Batched circomlib `EdDSAPoseidonVerifier`:
    checks S*B8 == R8 + Poseidon(R8x,R8y,Ax,Ay,M)*A when enabled.

    All field inputs canonical (16, *batch); enabled (batch,) bool/0-1.
    Returns ok (batch,) bool (True wherever disabled)."""
    hm = poseidon([r8x, r8y, ax, ay, msg])
    s_bits = fr.bits_le(s, 253)
    hm_bits = fr.bits_le(hm, 254)
    left = scalar_mul_base8(s_bits)
    a_pt = from_affine_mont(fr.to_mont(ax), fr.to_mont(ay))
    right2 = scalar_mul_var(hm_bits, a_pt)
    r8_pt = from_affine_mont(fr.to_mont(r8x), fr.to_mont(r8y))
    right = padd(r8_pt, right2)
    okp = points_equal(left, right)
    return okp | ~enabled.astype(jnp.bool_)


jscalar_mul_base8 = jax.jit(scalar_mul_base8)
jscalar_mul_var = jax.jit(scalar_mul_var)
jay_sign_to_ax = jax.jit(ay_sign_to_ax)
jeddsa_poseidon_verify = jax.jit(eddsa_poseidon_verify)
