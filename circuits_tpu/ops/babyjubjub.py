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
from ..builder.babyjub import A as BJJ_A, D as BJJ_D, BASE8, add_point
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


def padd(p1, p2):
    """Unified projective twisted-Edwards addition (add-2008-bbjlp)."""
    x1, y1, z1 = p1
    x2, y2, z2 = p2
    mm = fr.mont_mul
    a = mm(z1, z2)
    b = mm(a, a)
    c = mm(x1, x2)
    d = mm(y1, y2)
    e = mm(_mc(BJJ_D, x1.ndim), mm(c, d))
    f = fr.sub(b, e)
    g = fr.add(b, e)
    t = mm(fr.add(x1, y1), fr.add(x2, y2))
    x3 = mm(mm(a, f), fr.sub(fr.sub(t, c), d))
    y3 = mm(mm(a, g), fr.sub(d, mm(_mc(BJJ_A, x1.ndim), c)))
    z3 = mm(f, g)
    return (x3, y3, z3)


def pdouble(p):
    return padd(p, p)


def pselect(cond, p1, p2):
    return tuple(fr.select(cond, u, v) for u, v in zip(p1, p2))


def scalar_mul_var(bits, point):
    """Variable-base scalar multiply: bits (nbits, *batch) 0/1 LSB-first,
    point projective Montgomery. Masked double-and-add ladder."""
    nbits = bits.shape[0]
    acc = identity(bits.shape[1:])
    bits_dev = bits.astype(jnp.uint32)

    def body(i, carry):
        acc, base = carry
        bit = bits_dev[i]
        added = padd(acc, base)
        acc = pselect(bit, added, acc)
        base = pdouble(base)
        return (acc, base)

    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc, point))
    return acc


def scalar_mul_base8(bits):
    """Fixed-base multiply by BASE8 using host-precomputed 2^i*B8 affine
    points (mixed addition via scan over bit rows)."""
    nbits = bits.shape[0]
    tab = _base8_table(nbits)  # numpy (nbits, 2, 16)
    bshape = bits.shape[1:]
    acc = identity(bshape)
    xs = (bits.astype(jnp.uint32),
          jnp.asarray(tab[:, 0].reshape(nbits, N_LIMBS, *([1] * len(bshape)))),
          jnp.asarray(tab[:, 1].reshape(nbits, N_LIMBS, *([1] * len(bshape)))))

    def body(acc, x):
        bit, px, py = x
        added = padd(acc, from_affine_mont(
            jnp.broadcast_to(px, (N_LIMBS,) + bshape),
            jnp.broadcast_to(py, (N_LIMBS,) + bshape)))
        acc = pselect(bit, added, acc)
        return acc, None

    acc, _ = jax.lax.scan(body, acc, xs)
    return acc


_BASE8_TABLES: dict[int, np.ndarray] = {}


def _base8_table(nbits: int) -> np.ndarray:
    if nbits not in _BASE8_TABLES:
        tab = np.zeros((nbits, 2, N_LIMBS), dtype=np.uint32)
        pt = BASE8
        for i in range(nbits):
            tab[i, 0] = _mont_np(pt[0])
            tab[i, 1] = _mont_np(pt[1])
            pt = add_point(pt, pt)
        _BASE8_TABLES[nbits] = tab
    return _BASE8_TABLES[nbits]


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
