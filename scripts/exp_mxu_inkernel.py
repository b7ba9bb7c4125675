"""In-Pallas MXU Montgomery mix — the round-5 prototype (VERDICT r4 #4).

Round 4's XLA-level MXU Poseidon lost 9x to HBM round-trips between the
matmuls and the carry-normalization scans (SCALING.md §4). This is the
prescribed follow-up: the SAME banded-matmul formulation (8-bit limbs,
bf16 dots with exact f32 accumulation) but INSIDE one Pallas kernel —
carries unrolled in VMEM registers, zero HBM traffic between rounds.

Two kernels run R consecutive Poseidon t=3 FULL rounds (ARK + x^5 + MDS
mix) on identical data:

  A (baseline) — the production VPU round (16x16-bit schoolbook CIOS,
                 opt_full_round, the code inside pallas_poseidon);
  B (MXU)      — ARK + x^5 on the VPU (16-bit), then the whole t x t
                 MDS mix + Montgomery reduction as three in-kernel bf16
                 dots (mix / q = lo*N' / q*p) + unrolled 8-bit carry
                 chains + a dot-based byte->16-bit repack.

Both checked bit-exact against a big-int mirror; per-round-per-lane
times decide the avenue.

Usage: python scripts/exp_mxu_inkernel.py [lanes=65536] [rounds=16]
"""

import os
import sys
import time
from functools import lru_cache, partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from circuits_tpu.field.scalar import P, R as MONT_R, N_LIMBS, to_limbs, \
    from_limbs
from circuits_tpu.ops.pallas_poseidon import (_add_c, _pow5, _np_constants,
                                              opt_full_round, LANES)
from circuits_tpu.ops.poseidon_constants import constants

T3 = 3
NL8 = 32
R256 = 1 << 256
N_PRIME = (-pow(P, -1, R256)) % R256

B_TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def _limbs8(x):
    return [(x >> (8 * i)) & 0xFF for i in range(NL8)]


@lru_cache(maxsize=None)
def _mxu_consts():
    """Constant matrices in the kernel's row layouts.

    Input rows  r_in  = j*32 + h*16 + i  (element j, h=0 lo / 1 hi byte
                of 16-bit limb i; byte position 2i+h)
    Mix output  r_out = e*64 + k         (element e, byte column k)
    """
    C, M = constants(T3)
    _, _, rf, rp = _np_constants(T3)

    Wm = np.zeros((T3 * 64, T3 * 32), np.float32)
    for e in range(T3):
        for j in range(T3):
            limbs = _limbs8((M[e][j] * MONT_R) % P)
            for h in range(2):
                for i in range(16):
                    pos = 2 * i + h
                    for b, cb in enumerate(limbs):
                        k = pos + b
                        if k < 64:
                            Wm[e * 64 + k, j * 32 + h * 16 + i] += cb

    # q = (lo * N') mod 2^256: in (32 byte cols) out (32 byte cols)
    Wn = np.zeros((NL8, NL8), np.float32)
    for i, nb in enumerate(_limbs8(N_PRIME)):
        for pos in range(NL8):
            k = pos + i
            if k < NL8:
                Wn[k, pos] += nb
    # q*p: in (32 byte cols) out (65 byte cols)
    Wp = np.zeros((65, NL8), np.float32)
    for i, pb in enumerate(_limbs8(P)):
        for pos in range(NL8):
            Wp[pos + i, pos] += pb
    # byte cols (32) -> 16-bit limbs (16): Pick[i, 2i]=1, Pick[i,2i+1]=256
    Pick = np.zeros((16, 32), np.float32)
    for i in range(16):
        Pick[i, 2 * i] = 1.0
        Pick[i, 2 * i + 1] = 256.0

    # block-diagonal variants: ONE dot per step for all t elements, so
    # the carry chains batch over the element axis (3x fewer sequential
    # VPU row-ops — the dominant cost of the first prototype)
    def blkdiag(w):
        o, i = w.shape
        W = np.zeros((T3 * o, T3 * i), np.float32)
        for e in range(T3):
            W[e * o:(e + 1) * o, e * i:(e + 1) * i] = w
        return W

    return (Wm, blkdiag(Wn), blkdiag(Wp), blkdiag(Pick), rf, rp)


_P16 = np.array(to_limbs(P), np.uint32)


def _dotk(w_ref, x):
    # Mosaic has no uint32 -> bf16 cast; route through int32
    xb = x.astype(jnp.int32).astype(jnp.bfloat16)
    return jax.lax.dot_general(
        w_ref[...].astype(jnp.bfloat16), xb,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _shift_up(x, k):
    """Move col i-k's value into col i along axis -2 (zero fill)."""
    pad = [(0, 0)] * x.ndim
    pad[-2] = (k, 0)
    return jnp.pad(x[..., :-k, :], pad)


def _carry8(cols, n):
    """EXACT base-256 carry normalization in LOG depth: 3 heuristic
    lo+carry passes shrink cols (< 2^23) to <= 256, then a Kogge-Stone
    generate/propagate prefix resolves the remaining ripple in 6
    doubling steps — ~35 dependent ops instead of `n` sequential adds
    (the carry-chain depth was the loss of the first two prototypes and
    of round 4's XLA formulation)."""
    c = cols
    for _ in range(3):
        c = (c & 255) + _shift_up(c >> 8, 1)
    # now 0 <= c <= 256: gen = carry out, prop = carries pass through
    gen = c >> 8                     # 1 iff c == 256
    prop = (c == 255).astype(jnp.int32)
    k = 1
    while k < n:
        gen = gen | (prop & _shift_up(gen, k))
        prop = prop & _shift_up(prop, k)
        k *= 2
    return (c + _shift_up(gen, 1)) & 255


def _sub_if_ge_16(x16):
    """x16 (..., 16, 128): one conditional subtract of p (16-bit limbs),
    element axis batched."""
    borrow = jnp.zeros_like(x16[..., 0, :].astype(jnp.int32))
    diff = []
    for i in range(N_LIMBS):
        d = x16[..., i, :].astype(jnp.int32) - np.int32(_P16[i]) - borrow
        borrow = (d >> 31) & 1
        diff.append(d & 0xFFFF)
    diff = jnp.stack(diff, axis=-2).astype(jnp.uint32)
    return jnp.where((borrow == 1)[..., None, :], x16, diff)


def _mxu_round_body(x, c_r, wm_ref, wn_ref, wp_ref, pick_ref, *,
                    n_sub: int):
    """One full round, MXU mix. x (3, 16, S, 128) 16-bit Montgomery."""
    s = _add_c(x, c_r)
    s = _pow5(s)                             # VPU S-box (16-bit CIOS)
    W = n_sub * LANES                        # all sublanes fold into N:
    # (3,16,S,128) bytes -> (96, S*128): ONE wide dot per matrix per
    # round instead of S latency-bound 128-col dots
    x8 = jnp.concatenate([s & 255, s >> 8], axis=1).reshape(T3 * NL8, W)
    T = _dotk(wm_ref, x8).astype(jnp.int32)           # (192, S*128)
    Tn = _carry8(T.reshape(T3, 64, W), 64)            # (3, 64, W)
    lo = Tn[:, :NL8].reshape(T3 * NL8, W)
    q = _carry8(_dotk(wn_ref, lo).astype(jnp.int32)
                .reshape(T3, NL8, W), NL8)
    S_ = jnp.concatenate(
        [Tn, jnp.zeros((T3, 1, W), jnp.int32)], axis=1) \
        + _dotk(wp_ref, q.reshape(T3 * NL8, W)).astype(
            jnp.int32).reshape(T3, 65, W)
    Sn = _carry8(S_, 65)
    hi = Sn[:, NL8:NL8 + 32].reshape(T3 * NL8, W)     # /2^256
    x16 = _dotk(pick_ref, hi).astype(jnp.int32).reshape(T3, N_LIMBS, W)
    out = _sub_if_ge_16(x16.astype(jnp.uint32))
    return out.reshape(T3, N_LIMBS, n_sub, LANES)


def _kernel_mxu(x_ref, cf_ref, wm_ref, wn_ref, wp_ref, pick_ref, o_ref,
                *, rounds, n_sub, rf):
    def body(r, s):
        return _mxu_round_body(s, cf_ref[r % rf], wm_ref, wn_ref, wp_ref,
                               pick_ref, n_sub=n_sub)

    o_ref[...] = jax.lax.fori_loop(0, rounds, body, x_ref[...])


def _kernel_vpu(x_ref, cf_ref, m_ref, o_ref, *, rounds, rf):
    Mc = m_ref[...]

    def body(r, s):
        return opt_full_round(s, cf_ref[r % rf], Mc, t=T3)

    o_ref[...] = jax.lax.fori_loop(0, rounds, body, x_ref[...])


def main():
    from circuits_tpu.ops.pallas_poseidon import _np_opt_constants, \
        _const_spec
    Wm, Wn, Wp, Pick, rf, rp = _mxu_consts()
    CFo, D, E, Mc, PS, SR, SC = _np_opt_constants(T3)
    S = 8
    nb = B_TOTAL // (LANES * S)

    lev = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * (len(shape) - 2) + (i, 0),
        memory_space=pltpu.VMEM)
    cspec = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                   memory_space=pltpu.VMEM)

    call_mxu = pl.pallas_call(
        partial(_kernel_mxu, rounds=ROUNDS, n_sub=S, rf=rf),
        grid=(nb,),
        in_specs=[lev((T3, N_LIMBS, S, LANES)), cspec(CFo), cspec(Wm),
                  cspec(Wn), cspec(Wp), cspec(Pick)],
        out_specs=lev((T3, N_LIMBS, S, LANES)),
        out_shape=jax.ShapeDtypeStruct((T3, N_LIMBS, nb * S, LANES),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    call_vpu = pl.pallas_call(
        partial(_kernel_vpu, rounds=ROUNDS, rf=rf),
        grid=(nb,),
        in_specs=[lev((T3, N_LIMBS, S, LANES)), cspec(CFo),
                  _const_spec(Mc)],
        out_specs=lev((T3, N_LIMBS, S, LANES)),
        out_shape=jax.ShapeDtypeStruct((T3, N_LIMBS, nb * S, LANES),
                                       jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))

    jm = jax.jit(lambda x: call_mxu(x, CFo, Wm, Wn, Wp, Pick))
    jv = jax.jit(lambda x: call_vpu(x, CFo, Mc))

    # data: Montgomery-domain random elements
    rng = np.random.default_rng(5)
    vals = [[int(rng.integers(0, 1 << 62)) * MONT_R % P
             for _ in range(B_TOTAL)] for _ in range(T3)]
    x_np = np.zeros((T3, N_LIMBS, nb * S, LANES), np.uint32)
    for e in range(T3):
        for l_ in range(B_TOTAL):
            x_np[e, :, l_ // LANES, l_ % LANES] = to_limbs(vals[e][l_])
    x = jnp.asarray(x_np)

    # bit-exactness: big-int mirror of ROUNDS optimized full rounds
    from circuits_tpu.ops.poseidon_constants import optimized_constants
    oc = optimized_constants(T3)
    inv = pow(MONT_R, -1, P)

    def host_rounds(sv):
        s = [v * inv % P for v in sv]
        for r in range(ROUNDS):
            s = [(x_ + oc["full_c"][r % len(oc["full_c"])][i]) % P
                 for i, x_ in enumerate(s)]
            s = [pow(v, 5, P) for v in s]
            s = [sum(oc["m"][i][j] * s[j] for j in range(T3)) % P
                 for i in range(T3)]
        return [v * MONT_R % P for v in s]

    for name, fn in (("VPU", jv), ("MXU", jm)):
        t0 = time.time()
        out = np.asarray(fn(x))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        for lane in (0, 777, B_TOTAL - 1):
            got = [from_limbs(out[e, :, lane // LANES, lane % LANES])
                   for e in range(T3)]
            want = host_rounds([vals[e][lane] for e in range(T3)])
            assert got == want, f"{name} lane {lane} mismatch"
        print(f"{name}: bit-exact ({ROUNDS} rounds) vs big-int mirror",
              flush=True)
        # timing: device_get barrier, RTT-subtracted
        ready = jnp.zeros((4,), jnp.uint32)
        np.asarray(ready)
        rtts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(ready[0])
            rtts.append(time.time() - t0)
        rtt = float(np.median(rtts))
        times = []
        for _ in range(7):
            t0 = time.time()
            o = fn(x)
            jax.block_until_ready(o)
            np.asarray(o[0, 0, 0, 0])
            times.append(max(time.time() - t0 - rtt, 1e-9))
        med = float(np.median(times))
        ns = med / ROUNDS / B_TOTAL * 1e9
        print(f"{name}: {med*1e3:.2f} ms for {ROUNDS} rounds x "
              f"{B_TOTAL} lanes -> {ns:.2f} ns/round/lane", flush=True)


if __name__ == "__main__":
    main()
