"""Off-chip regression tests of the ACTUAL Pallas kernel-body code.

Interpret mode is unusable on this host (minutes of compile per width),
so these tests execute the kernel bodies directly as jnp programs on
XLA:CPU — the bodies are ref-agnostic (reads are plain [...] / [i]
indexing), so the exact hot-kernel arithmetic that runs on the TPU runs
here against independent big-int oracles. A kernel-body edit that
changes results fails `pytest tests/` on this box, not just
`tests/tpu_checks.py` on the chip (VERDICT r4 task #8).

Covered bodies:
  * pallas_poseidon.permute_opt_body   (the sparse t=3 permutation)
  * pallas_smt.chain_body              (the fused dual-SMT level chain)
  * pallas_eddsa curve formulas + the Horner double-base flow
"""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from circuits_tpu.field.scalar import P, R as MONT_R, to_limbs, from_limbs
from circuits_tpu.ops.poseidon_constants import poseidon_py
from circuits_tpu.ops import pallas_poseidon as pp
from circuits_tpu.ops import pallas_smt as ps
from circuits_tpu.ops import pallas_eddsa as pe
from circuits_tpu.r1cs.witness_check import smt_chains_py

rng = random.Random(42)
LANES = pp.LANES  # 128
S = 1
B = S * LANES


def pack_lane(vals, mont=False):
    """list of B ints -> (16, S, 128) uint32."""
    assert len(vals) == B
    arr = np.zeros((16, B), dtype=np.uint32)
    for j, v in enumerate(vals):
        if mont:
            v = v * MONT_R % P
        arr[:, j] = to_limbs(v)
    return jnp.asarray(arr.reshape(16, S, LANES))


def unpack_lane(arr):
    a = np.asarray(arr).reshape(16, B)
    return [from_limbs(a[:, j]) for j in range(B)]


def test_poseidon_sparse_body_bit_exact():
    """permute_opt_body (the code inside the pallas poseidon/SMT kernels)
    vs the host big-int Poseidon on random t=3 inputs."""
    import jax
    consts = pp._np_opt_constants(3)
    a = [rng.randrange(P) for _ in range(B)]
    b = [rng.randrange(P) for _ in range(B)]
    state = jnp.stack([pack_lane([0] * B, mont=True),
                       pack_lane(a, mont=True),
                       pack_lane(b, mont=True)])

    @jax.jit
    def run(state, *cs):
        out = pp.permute_opt_body(state, *cs, t=3)
        return pe._mm_const(out[0], to_limbs(1))

    got = unpack_lane(run(state, *[jnp.asarray(c) for c in consts]))
    want = [poseidon_py([x, y]) for x, y in zip(a, b)]
    assert got == want


def _state_machine(siblings, old_key, new_key, is_old0, fnc0, fnc1, n):
    """Per-lane SM masks (the XLA-side prep of ops/smt.processor_chains)."""
    isz = [s == 0 for s in siblings]
    lev_ins, suffix = [], True
    for i in range(n - 1, -1, -1):
        suffix = suffix and isz[i]
        lev_ins.append(suffix and (i == 0 or not isz[i - 1]))
    lev_ins.reverse()
    f_ins_like = (fnc0 and not fnc1) or (fnc0 and fnc1)
    f_update = fnc1 and not fnc0
    xors = [((old_key >> i) ^ (new_key >> i)) & 1 for i in range(n)]
    st = []
    prev_top, prev_bot = True, False
    for i in range(n):
        li = lev_ins[i]
        top = prev_top and not li
        old0 = prev_top and li and is_old0 and f_ins_like
        bot = ((prev_top and li and not is_old0 and f_ins_like
                and not xors[i]) or (prev_bot and not xors[i]))
        new1 = ((prev_top and li and not is_old0 and f_ins_like
                 and xors[i]) or (prev_bot and xors[i]))
        upd = prev_top and li and f_update
        st.append((top, old0, bot, new1, upd))
        prev_top, prev_bot = top, bot
    return st


def test_smt_chain_body_vs_host():
    """chain_body (the fused dual-SMT VMEM kernel body) vs the host
    big-int mirror over NOP/UPDATE/INSERT/DELETE lanes."""
    n = 8
    cases = []
    for j in range(B):
        kind = j % 4
        old_key = rng.randrange(1 << n)
        new_key = old_key if kind in (1, 3) else rng.randrange(1 << n)
        is_old0 = kind == 0 and (j // 4) % 2 == 0
        depth = rng.randrange(1, n)
        sib = [rng.randrange(P) if i < depth else 0 for i in range(n)]
        fnc0, fnc1 = [(1, 0), (0, 1), (0, 0), (1, 1)][kind]
        cases.append(dict(
            siblings=sib, old_key=old_key,
            old_value=rng.randrange(P), is_old0=is_old0,
            new_key=new_key, new_value=rng.randrange(P),
            fnc0=fnc0, fnc1=fnc1))

    # kernel-layout inputs (bottom-up flipped, as processor_chain preps)
    sib_np = np.zeros((n, 16, B), dtype=np.uint32)
    bits_np = np.zeros((n, B), dtype=np.uint32)
    masks_np = np.zeros((n, 5, B), dtype=np.uint32)
    old1, new1 = [], []
    for j, cs in enumerate(cases):
        st = _state_machine(cs["siblings"], cs["old_key"], cs["new_key"],
                            cs["is_old0"], cs["fnc0"], cs["fnc1"], n)
        for i in range(n):
            sib_np[n - 1 - i, :, j] = to_limbs(cs["siblings"][i])
            bits_np[n - 1 - i, j] = (cs["new_key"] >> i) & 1
            masks_np[n - 1 - i, :, j] = [int(v) for v in st[i]]
        old1.append(poseidon_py([cs["old_key"], cs["old_value"], 1]))
        new1.append(poseidon_py([cs["new_key"], cs["new_value"], 1]))

    import jax
    from functools import partial as _partial
    _, _, rf, rp = pp._np_constants(3)
    consts = [jnp.asarray(c) for c in pp._np_opt_constants(3)]
    run = jax.jit(_partial(
        lambda sib, bits, masks, o1, n1, *cs: ps.chain_body(
            sib, bits, masks, o1, n1, cs, n=n, t=3, rf=rf, rp=rp,
            sparse=True)))
    oldc, newc = run(
        jnp.asarray(sib_np.reshape(n, 16, S, LANES)),
        jnp.asarray(bits_np.reshape(n, S, LANES)),
        jnp.asarray(masks_np.reshape(n, 5, S, LANES)),
        pack_lane(old1), pack_lane(new1), *consts)
    got_old = unpack_lane(oldc)
    got_new = unpack_lane(newc)

    for j, cs in enumerate(cases):
        co, cn, _ = smt_chains_py(
            cs["siblings"], cs["old_key"], cs["old_value"],
            cs["is_old0"], cs["new_key"], cs["new_value"],
            cs["fnc0"], cs["fnc1"])
        # smt_chains_py returns post-DELETE-swap values; chain_body
        # returns the raw chains (the caller swaps)
        if cs["fnc0"] and cs["fnc1"]:
            co, cn = cn, co
        assert got_old[j] == co, f"lane {j} old chain"
        assert got_new[j] == cn, f"lane {j} new chain"


import jax
from functools import partial


@partial(jax.jit, static_argnums=())
def _horner_fn(s_l, hm_l, axm, aym, r8xm, r8ym, tab):
    """The EdDSA kernel's double-base Horner flow, rebuilt from the SAME
    helper functions and loop structure the kernel body uses (digit
    select, projective add/double, comb table, projective equality)."""
    one = pe._one_like(axm)
    zero = jnp.zeros_like(axm)
    ident = (zero, one, one)

    # 16-entry variable-base table (the kernel's scratch-ref build loop)
    entries = [ident, (axm, aym, one)]
    for _ in range(14):
        entries.append(pe._padd_affine(entries[-1], (axm, aym)))
    tax = jnp.stack([e[0] for e in entries])
    tay = jnp.stack([e[1] for e in entries])
    taz = jnp.stack([e[2] for e in entries])

    def body(k, carry):
        var, fix = carry
        jj = 63 - k
        var = jax.lax.fori_loop(0, 4, lambda _, p: pe._pdouble(p), var)
        var = pe._padd(var, pe._masked_entry(
            (tax, tay, taz), pe._digit(hm_l, jj)))
        tab_j = tab[jj]
        px, py = pe._masked_entry((tab_j[:, 0], tab_j[:, 1]),
                                  pe._digit(s_l, jj))
        fix = pe._padd_affine(fix, (px, py))
        return (var, fix)

    var, fix = jax.lax.fori_loop(0, 64, body, (ident, ident))
    rhs = pe._padd_affine(var, (r8xm, r8ym))
    fx, fy, fz = fix
    rx, ry, rz = rhs
    return (pe._feq(pe._mm(fx, rz), pe._mm(rx, fz))
            & pe._feq(pe._mm(fy, rz), pe._mm(ry, fz)))


def _horner_check(s_val, hm, ax, ay, r8x, r8y):
    ok = _horner_fn(pack_lane([s_val] * B), pack_lane([hm] * B),
                    pack_lane([ax] * B, mont=True),
                    pack_lane([ay] * B, mont=True),
                    pack_lane([r8x] * B, mont=True),
                    pack_lane([r8y] * B, mont=True),
                    jnp.asarray(pe._np_comb_table()))
    return bool(np.asarray(ok).reshape(-1)[0])


@pytest.mark.slow
def test_eddsa_kernel_flow_vs_host():
    """Valid signature verifies; a tampered scalar fails — through the
    kernel's own curve formulas and table lookups."""
    from circuits_tpu.builder import babyjub as bj

    prv = bytes(rng.randrange(256) for _ in range(32))
    msg = rng.randrange(P)
    sig = bj.sign_poseidon(prv, msg)
    pub = bj.prv2pub(prv)
    hm = poseidon_py([sig["R8"][0], sig["R8"][1], pub[0], pub[1], msg])
    assert _horner_check(sig["S"], hm, pub[0], pub[1],
                         sig["R8"][0], sig["R8"][1])
    assert not _horner_check(sig["S"] + 1, hm, pub[0], pub[1],
                             sig["R8"][0], sig["R8"][1])


def test_eddsa_curve_formulas_vs_host():
    """_padd/_padd_affine/_pdouble (the kernel's Montgomery projective
    twisted-Edwards formulas) vs the host curve on random points."""
    from circuits_tpu.builder import babyjub as bj

    pts = [bj.mul_base8(rng.randrange(1 << 120)) for _ in range(4)]

    import jax

    def to_proj(pt):
        return (pack_lane([pt[0]] * B, mont=True),
                pack_lane([pt[1]] * B, mont=True),
                pe._one_like(pack_lane([1] * B)))

    def from_proj(p):
        x, y, z = (unpack_lane(pe._mm_const(c, to_limbs(1)))[0]
                   for c in p)
        zi = pow(z, -1, P)
        return (x * zi % P, y * zi % P)

    p0, p1 = pts[0], pts[1]
    padd = jax.jit(pe._padd)
    padd_affine = jax.jit(pe._padd_affine)
    pdouble = jax.jit(pe._pdouble)
    assert from_proj(padd(to_proj(p0), to_proj(p1))) == \
        bj.add_point(p0, p1)
    assert from_proj(padd_affine(
        to_proj(p0), (pack_lane([p1[0]] * B, mont=True),
                      pack_lane([p1[1]] * B, mont=True)))) == \
        bj.add_point(p0, p1)
    assert from_proj(pdouble(to_proj(pts[2]))) == \
        bj.add_point(pts[2], pts[2])
