"""Off-chip regression tests of the ACTUAL Pallas kernel-body code.

Interpret mode is unusable on this host and XLA:CPU's compile cost on
the full raw-limb kernel graphs is superlinear (a whole 65-round
permutation body costs >10 min to compile on 2 cores — measured), so the
always-on tests execute the kernel code at the granularity XLA:CPU
compiles in seconds:

  * the exact in-kernel Poseidon ROUND functions (opt_full_round /
    opt_partial_round — the same objects permute_opt_body loops over),
  * the exact SMT chain_body level machinery with the (separately
    validated) FFI Poseidon injected for the in-level hashes,
  * the exact EdDSA curve formulas, digit extraction, and comb table.

A kernel-body edit that changes results fails `pytest tests/` on this
box (VERDICT r4 task #8); the fully-fused compositions are additionally
validated bit-exact on the real chip by `python -m tests.tpu_checks`.
The full-body compositions can also run here by exporting
CTPU_HEAVY_KERNEL_TESTS=1 (budget >30 min of XLA:CPU compile).
"""

import os
import random
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from circuits_tpu.field.scalar import P, R as MONT_R, to_limbs, from_limbs
from circuits_tpu.ops.poseidon_constants import (poseidon_py,
                                                 optimized_constants)
from circuits_tpu.ops import pallas_poseidon as pp
from circuits_tpu.ops import pallas_smt as ps
from circuits_tpu.ops import pallas_eddsa as pe
from circuits_tpu.r1cs.witness_check import smt_chains_py

heavy = pytest.mark.skipif(
    os.environ.get("CTPU_HEAVY_KERNEL_TESTS", "0") != "1",
    reason="full-body XLA:CPU compile >10 min; bodies covered at round/"
           "level granularity here and fully on-chip by tests.tpu_checks")

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


def unpack_lane(arr, mont=False):
    a = np.asarray(arr).reshape(16, B)
    inv = pow(MONT_R, -1, P)
    return [from_limbs(a[:, j]) * (inv if mont else 1) % P
            for j in range(B)]


# ---------------------------------------------------------------------------
# Poseidon: the exact round functions of the in-kernel sparse schedule
# ---------------------------------------------------------------------------

def _mat_vec(m, v):
    t = len(v)
    return [sum(m[i][j] * v[j] for j in range(t)) % P for i in range(t)]


def test_poseidon_round_bodies_bit_exact():
    """opt_full_round / opt_partial_round (the code permute_opt_body
    loops over inside every Poseidon/SMT kernel) vs a big-int mirror."""
    t = 3
    CF, D, E, Mc, PS, SR, SC = [jnp.asarray(c)
                                for c in pp._np_opt_constants(t)]
    oc = optimized_constants(t)
    state_i = [[rng.randrange(P) for _ in range(B)] for _ in range(t)]
    state = jnp.stack([pack_lane(row, mont=True) for row in state_i])

    # one full round (r = 0) — EAGER on purpose: XLA:CPU's compile cost
    # on raw-limb graphs is superlinear (one round ≈ minutes); eager
    # dispatch of the same ops runs in seconds
    out = pp.opt_full_round(state, CF[0], Mc, t=t)
    for lane in range(0, B, 37):
        s = [state_i[i][lane] for i in range(t)]
        s = [(x + oc["full_c"][0][i]) % P for i, x in enumerate(s)]
        s = [pow(x, 5, P) for x in s]
        s = _mat_vec(oc["m"], s)
        got = [unpack_lane(out[i], mont=True)[lane] for i in range(t)]
        assert got == s, f"full round lane {lane}"

    # one sparse partial round (r = 0), eager likewise
    out = pp.opt_partial_round(state, E[0], SR[0], SC[0], t=t)
    for lane in range(0, B, 37):
        s = [state_i[i][lane] for i in range(t)]
        s0 = (pow(s[0], 5, P) + oc["e"][0]) % P
        row0 = sum(oc["sparse_row"][0][j] * ([s0] + s[1:])[j]
                   for j in range(t)) % P
        tail = [(s[j] + oc["sparse_col"][0][j - 1] * s0) % P
                for j in range(1, t)]
        want = [row0] + tail
        got = [unpack_lane(out[i], mont=True)[lane] for i in range(t)]
        assert got == want, f"partial round lane {lane}"


@heavy
def test_poseidon_full_body_bit_exact():
    """The complete permute_opt_body vs the host Poseidon."""
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


# ---------------------------------------------------------------------------
# SMT: the exact chain_body level machinery (FFI Poseidon injected)
# ---------------------------------------------------------------------------

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


def _smt_cases(n):
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
    return cases


def _run_chain_body(cases, n, permute):
    sib_np = np.zeros((n, 16, B), dtype=np.uint32)
    bits_np = np.zeros((n, B), dtype=np.uint32)
    masks_np = np.zeros((n, 5, B), dtype=np.uint32)
    old1, new1, new1h = [], [], []
    for j, cs in enumerate(cases):
        st = _state_machine(cs["siblings"], cs["old_key"], cs["new_key"],
                            cs["is_old0"], cs["fnc0"], cs["fnc1"], n)
        for i in range(n):
            sib_np[n - 1 - i, :, j] = to_limbs(cs["siblings"][i])
            bits_np[n - 1 - i, j] = (cs["new_key"] >> i) & 1
            masks_np[n - 1 - i, :, j] = [int(v) for v in st[i]]
        o1 = poseidon_py([cs["old_key"], cs["old_value"], 1])
        n1 = poseidon_py([cs["new_key"], cs["new_value"], 1])
        old1.append(o1)
        new1.append(n1)
        # hoisted branch-level pair hash (bit at the new1 level)
        b1 = 0
        for i in range(n):
            if st[i][3]:
                b1 = (cs["new_key"] >> i) & 1
        new1h.append(poseidon_py([n1, o1] if b1 == 0 else [o1, n1]))

    _, _, rf, rp = pp._np_constants(3)
    if permute is None:
        consts = [jnp.asarray(c) for c in pp._np_opt_constants(3)]
        sparse = True
    else:
        consts = ()
        sparse = False
    # eager-level call: lax.fori_loop still compiles the (small) level
    # body, but no monolithic jit graph is built
    run = lambda sib, bits, masks, o1, n1, n1h: ps.chain_body(  # noqa: E731
        sib, bits, masks, o1, n1, n1h, consts, n=n, t=3, rf=rf, rp=rp,
        sparse=sparse, permute=permute)
    oldc, newc = run(
        jnp.asarray(sib_np.reshape(n, 16, S, LANES)),
        jnp.asarray(bits_np.reshape(n, S, LANES)),
        jnp.asarray(masks_np.reshape(n, 5, S, LANES)),
        pack_lane(old1), pack_lane(new1), pack_lane(new1h))
    return unpack_lane(oldc), unpack_lane(newc)


def _assert_chains(cases, got_old, got_new):
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


def test_smt_chain_body_vs_host():
    """chain_body (the fused dual-SMT kernel's level/select machinery)
    over NOP/UPDATE/INSERT/DELETE lanes vs the host big-int mirror. The
    in-level Poseidon is the FFI-backed permutation (bit-exactness of
    the in-kernel permutation is covered at round granularity above and
    on-chip by tpu_checks)."""
    from circuits_tpu.ops.poseidon import permute_mont

    def ffi_permute(state):  # kernel layout (t,16,S,128) -> same
        t_, _, s_, l_ = state.shape
        flat = jnp.moveaxis(state, 1, 0).reshape(16, t_, s_ * l_)
        out = permute_mont(flat)
        return jnp.moveaxis(out.reshape(16, t_, s_, l_), 0, 1)

    n = 8
    cases = _smt_cases(n)
    got_old, got_new = _run_chain_body(cases, n, ffi_permute)
    _assert_chains(cases, got_old, got_new)


@heavy
def test_smt_chain_body_sparse_permute_vs_host():
    """chain_body with its real in-kernel sparse permutation."""
    n = 8
    cases = _smt_cases(n)
    got_old, got_new = _run_chain_body(cases, n, None)
    _assert_chains(cases, got_old, got_new)


# ---------------------------------------------------------------------------
# EdDSA: curve formulas, digit select, comb table, (heavy) Horner flow
# ---------------------------------------------------------------------------

def _to_proj(pt):
    return (pack_lane([pt[0]] * B, mont=True),
            pack_lane([pt[1]] * B, mont=True),
            pe._one_like(pack_lane([1] * B)))


def _from_proj(p):
    x, y, z = (unpack_lane(pe._mm_const(c, to_limbs(1)))[0] for c in p)
    zi = pow(z, -1, P)
    return (x * zi % P, y * zi % P)


def test_eddsa_curve_formulas_vs_host():
    """_padd/_padd_affine/_pdouble (the kernel's Montgomery projective
    twisted-Edwards formulas) vs the host curve on random points."""
    from circuits_tpu.builder import babyjub as bj

    pts = [bj.mul_base8(rng.randrange(1 << 120)) for _ in range(3)]
    p0, p1 = pts[0], pts[1]
    # eager (see the round-bodies test for why)
    assert _from_proj(pe._padd(_to_proj(p0), _to_proj(p1))) == \
        bj.add_point(p0, p1)
    assert _from_proj(pe._padd_affine(
        _to_proj(p0), (pack_lane([p1[0]] * B, mont=True),
                       pack_lane([p1[1]] * B, mont=True)))) == \
        bj.add_point(p0, p1)
    assert _from_proj(pe._pdouble(_to_proj(pts[2]))) == \
        bj.add_point(pts[2], pts[2])


def test_eddsa_digit_and_comb_table():
    """_digit (4-bit window extraction) vs plain shifts, and the kernel
    comb table entries vs host d * 16^j * B8."""
    from circuits_tpu.builder import babyjub as bj

    vals = [rng.randrange(P) for _ in range(B)]
    packed = pack_lane(vals)
    dig = jax.jit(lambda x, jj: pe._digit(x, jj))
    for jj in (0, 1, 17, 63):
        got = [int(v) for v in np.asarray(dig(packed, jj)).reshape(-1)]
        want = [(v >> (4 * jj)) & 15 for v in vals]
        assert got == want, f"window {jj}"

    tab = pe._np_comb_table()  # (64, 16, 2, 16, 1, 1)
    inv = pow(MONT_R, -1, P)
    for jj in (0, 5, 63):
        for d in (0, 1, 7, 15):
            x = from_limbs(tab[jj, d, 0, :, 0, 0]) * inv % P
            y = from_limbs(tab[jj, d, 1, :, 0, 0]) * inv % P
            want = bj.mul_base8(d * (16 ** jj)) if d else (0, 1)
            assert (x, y) == want, f"table[{jj}][{d}]"


@heavy
def test_eddsa_horner_flow_vs_host():
    """The kernel's full double-base Horner flow (valid signature
    verifies, tampered scalar fails) rebuilt from the same helpers."""
    from circuits_tpu.builder import babyjub as bj

    @jax.jit
    def horner(s_l, hm_l, axm, aym, r8xm, r8ym, tab):
        one = pe._one_like(axm)
        zero = jnp.zeros_like(axm)
        ident = (zero, one, one)
        entries = [ident, (axm, aym, one)]
        for _ in range(14):
            entries.append(pe._padd_affine(entries[-1], (axm, aym)))
        tax = jnp.stack([e[0] for e in entries])
        tay = jnp.stack([e[1] for e in entries])
        taz = jnp.stack([e[2] for e in entries])

        def body(k, carry):
            var, fix = carry
            jj = 63 - k
            var = jax.lax.fori_loop(0, 4, lambda _, p: pe._pdouble(p),
                                    var)
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

    prv = bytes(rng.randrange(256) for _ in range(32))
    msg = rng.randrange(P)
    sig = bj.sign_poseidon(prv, msg)
    pub = bj.prv2pub(prv)
    hm = poseidon_py([sig["R8"][0], sig["R8"][1], pub[0], pub[1], msg])
    tab = jnp.asarray(pe._np_comb_table())

    def check(s_val):
        ok = horner(pack_lane([s_val] * B), pack_lane([hm] * B),
                    pack_lane([pub[0]] * B, mont=True),
                    pack_lane([pub[1]] * B, mont=True),
                    pack_lane([sig["R8"][0]] * B, mont=True),
                    pack_lane([sig["R8"][1]] * B, mont=True), tab)
        return bool(np.asarray(ok).reshape(-1)[0])

    assert check(sig["S"])
    assert not check(sig["S"] + 1)
