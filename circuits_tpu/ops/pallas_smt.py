"""Pallas TPU kernel for the SMT processor's bottom-up hashing chains.

The two SMTProcessor instances are ~1/3 of the per-tx device time
(reference: /root/reference/src/rollup-tx.circom:537-570): 33 levels x
4 Poseidon(2) instances each, which the XLA path runs as a lax.scan whose
carries spill to HBM between levels.  This kernel runs the ENTIRE level
chain VMEM-resident: per level, the four hash0 instances (old chain, new
chain, new1 pair, bot pair) fold into the SUBLANE axis (4S x 128 lanes)
of ONE in-kernel Poseidon t=3 permutation, followed by the state-machine
selects — no HBM traffic until the two roots come out.

The cheap per-lane parts (SMTLevIns, the top-down state machine, leaf
hashes) stay in XLA: they are (B,)-boolean work and one batched hash.
Layout/arith helpers are shared with pallas_poseidon (16x16-bit limb
Montgomery CIOS on the VPU).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.scalar import R2, N_LIMBS, to_limbs
from .pallas_poseidon import (LANES, _np_constants, _np_opt_constants,
                              _add_c, _pow5, _mix, _block_shape,
                              _const_spec, _use_sparse, permute_opt_body)
from .pallas_eddsa import _mm_const

_R2_LIMBS = to_limbs(R2)
_ONE_LIMBS = to_limbs(1)


def _sel(m, a, b):
    """m (S,128) 0/1 -> where over limb-stacked (16, S, 128) values."""
    return jnp.where((m != 0)[None], a, b)


def chain_body(sib_ref, bits_ref, masks_ref, old1_ref, new1_ref,
               new1h_ref, consts,
               *, n: int, t: int, rf: int, rp: int, sparse: bool,
               permute=None):
    """The SMT chain kernel body, ref-agnostic: every argument may be a
    pallas VMEM ref OR a plain jnp array (reads use only [...] / [i]
    indexing), so the CPU CI suite executes the EXACT hot-kernel code
    without a TPU (tests/test_kernel_bodies.py — VERDICT r4 task #8).
    `permute` overrides the in-kernel Poseidon permutation (the CPU suite
    injects the FFI-backed one to keep the XLA:CPU compile tractable —
    the in-kernel permutation rounds have their own round-level tests).
    Returns (old_child, new_child), each (16, S, 128)."""
    old1 = old1_ref[...]
    new1 = new1_ref[...]
    new1h = new1h_ref[...]   # hoisted new1-pair hash (one per lane)
    zero = jnp.zeros_like(old1)
    half = rf // 2
    s_sub = old1.shape[-2]

    if permute is not None:
        run_permute = permute
    elif sparse:
        cf_ref, d_ref, e_ref, m_ref, ps_ref, sr_ref, sc_ref = consts

        def run_permute(state):
            return permute_opt_body(state, cf_ref, d_ref, e_ref, m_ref,
                                    ps_ref, sr_ref, sc_ref, t=t)
    else:
        c_ref, m_ref = consts
        Mc = m_ref[...]

        def full_round(r, s):
            s = _add_c(s, c_ref[r])
            s = _pow5(s)
            return _mix(s, Mc, t)

        def partial_round(r, s):
            s = _add_c(s, c_ref[r])
            s0 = _pow5(s[0:1])
            s = jnp.concatenate([s0, s[1:]], axis=0)
            return _mix(s, Mc, t)

        def run_permute(state):
            state = jax.lax.fori_loop(0, half, full_round, state)
            state = jax.lax.fori_loop(half, half + rp, partial_round,
                                      state)
            return jax.lax.fori_loop(half + rp, rf + rp, full_round,
                                     state)

    def level(i, carry):
        oldc, newc = carry
        sib = sib_ref[i]            # (16, S, 128)
        bit = bits_ref[i]           # (S, 128) 0/1
        msk = masks_ref[i]          # (5, S, 128) top/old0/bot/new1/upd
        ol = _sel(bit, sib, oldc)
        orr = _sel(bit, oldc, sib)
        nl = _sel(bit, sib, newc)
        nr = _sel(bit, newc, sib)
        bl = _sel(bit, zero, newc)
        br = _sel(bit, newc, zero)
        # 3 hash0 instances fold into the sublane axis: (16, 3S, 128)
        # (the new1-pair hash applies at <= 1 level per lane and is
        # hoisted out of the chain as one batched pre-kernel call —
        # -25% Poseidon mass in the hottest kernel, round 5)
        ls = jnp.concatenate([ol, nl, bl], axis=-2)
        rs = jnp.concatenate([orr, nr, br], axis=-2)
        state = jnp.stack([jnp.zeros_like(ls),
                           _mm_const(ls, _R2_LIMBS),
                           _mm_const(rs, _R2_LIMBS)])  # mont domain
        state = run_permute(state)
        h = _mm_const(state[0], _ONE_LIMBS)  # canonical (16, 3S, 128)
        oh = h[:, 0 * s_sub:1 * s_sub]
        nh = h[:, 1 * s_sub:2 * s_sub]
        bh = h[:, 2 * s_sub:3 * s_sub]
        top, old0, bot, new1m, upd = (msk[j] for j in range(5))
        old_up = _sel(top, oh, zero)
        old_up = _sel(bot | new1m | upd, old1, old_up)
        new_up = _sel(top, nh, zero)
        new_up = _sel(bot, bh, new_up)
        new_up = _sel(new1m, new1h, new_up)
        new_up = _sel(old0 | upd, new1, new_up)
        return (old_up, new_up)

    return jax.lax.fori_loop(0, n, level, (zero, zero))


def _kernel(sib_ref, bits_ref, masks_ref, old1_ref, new1_ref, new1h_ref,
            *refs, n: int, t: int, rf: int, rp: int, sparse: bool):
    out_ref = refs[-1]
    oldc, newc = chain_body(sib_ref, bits_ref, masks_ref, old1_ref,
                            new1_ref, new1h_ref, refs[:-1], n=n, t=t,
                            rf=rf, rp=rp, sparse=sparse)
    out_ref[0] = oldc
    out_ref[1] = newc


@lru_cache(maxsize=None)
def _compiled(n: int, s: int, nb: int, interpret: bool):
    _, _, rf, rp = _np_constants(3)
    sparse = _use_sparse()
    consts = (_np_opt_constants(3) if sparse
              else _np_constants(3)[:2])
    lev = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * (len(shape) - 2)
                                     + (i, 0), memory_space=pltpu.VMEM)
    from functools import partial
    call = pl.pallas_call(
        partial(_kernel, n=n, t=3, rf=rf, rp=rp, sparse=sparse),
        grid=(nb,),
        in_specs=[lev((n, N_LIMBS, s, LANES)), lev((n, s, LANES)),
                  lev((n, 5, s, LANES)), lev((N_LIMBS, s, LANES)),
                  lev((N_LIMBS, s, LANES)), lev((N_LIMBS, s, LANES))] +
                 [_const_spec(c) for c in consts],
        out_specs=lev((2, N_LIMBS, s, LANES)),
        out_shape=jax.ShapeDtypeStruct((2, N_LIMBS, nb * s, LANES),
                                       jnp.uint32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    return jax.jit(lambda *a: call(*a, *consts))


def processor_chain(sib_f, bits_f, masks_f, old1leaf, new1leaf, new1h, *,
                    interpret: bool = False):
    """Bottom-up SMT hash chains, fused.

    sib_f (n, 16, B) canonical siblings, bits_f (n, B) 0/1, masks_f
    (n, 5, B) 0/1 state-machine masks — all already flipped bottom-up;
    old1leaf/new1leaf/new1h (16, B) canonical (new1h = the hoisted
    branch-level pair hash). Returns (old_child, new_child) each
    (16, B)."""
    n, _, b = sib_f.shape
    su, nb = _block_shape(b)
    bp = nb * su * LANES

    def prep(x):
        if bp != b:
            pad = [(0, 0)] * x.ndim
            pad[-1] = (0, bp - b)
            x = jnp.pad(x, pad)
        return x.reshape(x.shape[:-1] + (nb * su, LANES))

    out = _compiled(n, su, nb, interpret)(
        prep(sib_f), prep(bits_f.astype(jnp.uint32)),
        prep(masks_f.astype(jnp.uint32)), prep(old1leaf), prep(new1leaf),
        prep(new1h))
    out = out.reshape(2, N_LIMBS, bp)[:, :, :b]
    return out[0], out[1]
