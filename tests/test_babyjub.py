"""BabyJubJub host + device tests: circomlib vectors, EdDSA end-to-end."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P
from circuits_tpu.builder import babyjub as bjj
from circuits_tpu.ops import babyjubjub as dev

rng = random.Random(31337)


def test_host_prv2pub_circomlib_vector():
    prv = bytes.fromhex(
        "0001020304050607080900010203040506070809000102030405060708090001")
    pub = bjj.prv2pub(prv)
    assert pub[0] == 13277427435165878497778222415993513565335242147425444199013288855685581939618
    assert pub[1] == 13622229784656158136036771217484571176836296686641868549125388198837476602820


def test_host_curve_basics():
    assert bjj.in_curve(bjj.BASE8)
    assert bjj.mul_point(bjj.SUB_ORDER, bjj.BASE8) == bjj.IDENTITY
    p1 = bjj.mul_point(7, bjj.BASE8)
    p2 = bjj.mul_point(11, bjj.BASE8)
    assert bjj.add_point(p1, p2) == bjj.mul_point(18, bjj.BASE8)
    for k in (1, 5, 1234567):
        pt = bjj.mul_point(k, bjj.BASE8)
        assert bjj.unpack_point(bjj.pack_point(pt)) == pt


def test_host_sign_verify():
    prv = b"\x42" * 32
    pub = bjj.prv2pub(prv)
    msg = 987654321987654321
    sig = bjj.sign_poseidon(prv, msg)
    assert bjj.verify_poseidon(msg, sig, pub)
    assert not bjj.verify_poseidon(msg + 1, sig, pub)
    bad = dict(sig)
    bad["S"] = (sig["S"] + 1) % bjj.SUB_ORDER
    assert not bjj.verify_poseidon(msg, bad, pub)


def test_device_scalar_mul():
    ks = [rng.randint(0, bjj.SUB_ORDER - 1) for _ in range(4)] + [0, 1]
    bits = fr.bits_le(fr.pack(ks), 253)
    acc = dev.jscalar_mul_base8(bits)
    # compare against host: affine via x/z
    zinv = fr.jinv(fr.from_mont(acc[2]))
    gx = fr.unpack_np(fr.jmul(fr.from_mont(acc[0]), zinv))
    gy = fr.unpack_np(fr.jmul(fr.from_mont(acc[1]), zinv))
    for k, x, y in zip(ks, gx, gy):
        want = bjj.mul_point(k, bjj.BASE8)
        assert (int(x), int(y)) == want, k


def test_device_var_mul_matches_base8():
    ks = [rng.randint(0, bjj.SUB_ORDER - 1) for _ in range(3)]
    bits = fr.bits_le(fr.pack(ks), 253)
    b8 = dev.from_affine_mont(
        fr.to_mont(fr.pack([bjj.BASE8[0]] * 3)),
        fr.to_mont(fr.pack([bjj.BASE8[1]] * 3)))
    got = dev.jscalar_mul_var(bits, b8)
    want = dev.jscalar_mul_base8(bits)
    assert bool(np.all(np.asarray(dev.points_equal(got, want))))


def test_device_ay_sign_to_ax():
    pts = [bjj.mul_point(rng.randint(1, bjj.SUB_ORDER - 1), bjj.BASE8)
           for _ in range(6)]
    ays = [pt[1] for pt in pts]
    signs = [1 if pt[0] > (P - 1) // 2 else 0 for pt in pts]
    # include the (0,0) "disabled signature" input rollup-tx feeds in
    ays.append(0)
    signs.append(0)
    ax, ok = dev.jay_sign_to_ax(
        fr.pack(ays), jnp.asarray(np.array(signs, np.uint32)))
    ax = fr.unpack_np(ax)
    assert all(np.asarray(ok))
    for pt, x in zip(pts, ax[:-1]):
        assert int(x) == pt[0]


def test_device_eddsa_verify():
    B = 4
    prvs = [bytes([i + 1]) * 32 for i in range(B)]
    pubs = [bjj.prv2pub(p) for p in prvs]
    msgs = [rng.randint(0, P - 1) for _ in range(B)]
    sigs = [bjj.sign_poseidon(p, m) for p, m in zip(prvs, msgs)]
    enabled = jnp.asarray(np.ones(B, np.uint32))
    ok = dev.jeddsa_poseidon_verify(
        enabled,
        fr.pack([p[0] for p in pubs]), fr.pack([p[1] for p in pubs]),
        fr.pack([s["S"] for s in sigs]),
        fr.pack([s["R8"][0] for s in sigs]),
        fr.pack([s["R8"][1] for s in sigs]),
        fr.pack(msgs))
    assert all(np.asarray(ok))
    # tamper one message -> that lane fails; disable it -> passes again
    msgs2 = list(msgs)
    msgs2[2] = (msgs2[2] + 1) % P
    ok2 = dev.jeddsa_poseidon_verify(
        enabled,
        fr.pack([p[0] for p in pubs]), fr.pack([p[1] for p in pubs]),
        fr.pack([s["S"] for s in sigs]),
        fr.pack([s["R8"][0] for s in sigs]),
        fr.pack([s["R8"][1] for s in sigs]),
        fr.pack(msgs2))
    assert list(np.asarray(ok2)) == [True, True, False, True]
    enabled3 = jnp.asarray(np.array([1, 1, 0, 1], np.uint32))
    ok3 = dev.jeddsa_poseidon_verify(
        enabled3,
        fr.pack([p[0] for p in pubs]), fr.pack([p[1] for p in pubs]),
        fr.pack([s["S"] for s in sigs]),
        fr.pack([s["R8"][0] for s in sigs]),
        fr.pack([s["R8"][1] for s in sigs]),
        fr.pack(msgs2))
    assert all(np.asarray(ok3))
