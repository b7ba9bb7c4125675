"""Pallas TPU kernel for the SHA-256 block-compression chain.

HashInputs (reference src/hash-inputs.circom:111-177) ends every batch
with ONE SHA-256 over the concatenated data-availability bitstring —
~420k bits / ~823 blocks at the production shape. The chain is serial
(Merkle-Damgard), so the XLA `lax.scan` formulation in ops/sha256.py
runs 823 iterations of width-1 scalar uint32 ops and measured 62.6 ms
isolated at nTx=2048 (SCALING.md §3b) — pure per-iteration overhead, the
VPU is >99% idle.

TPU-first split implemented here:
  * the message schedule W[16..63] is block-INDEPENDENT, so it runs
    outside the kernel as wide XLA ops vectorized over all blocks
    (and witness lanes) at once;
  * only the irreducibly-serial part — 64 rounds x nblocks of uint32
    adds/rotates on the 8-word state — runs inside one Pallas kernel,
    VMEM-resident, with zero per-round dispatch or HBM traffic.

The kernel body is ref-agnostic (the pallas_smt.chain_body pattern) so
the CPU CI suite executes the exact round code in interpret mode
(tests/test_pallas_sha256.py) without a TPU.

Measured on the v5e chip at the production preimage (822 blocks), via an
in-jit 10x serial chain (the axon per-dispatch floor would otherwise
mask it): XLA scan 38.9 ms -> this kernel 1.06 ms per digest (37x),
bit-exact vs hashlib. A scalar-core formulation (per-block DMA of the W
row into SMEM + rank-0 uint32 rounds, avoiding the per-round dynamic
(1,1) VMEM loads here) was prototyped and REJECTED: Mosaic cannot
compile the dynamically-indexed VMEM->SMEM row DMA (`tpu.memref_slice`
with a dynamic block index fails in the backend), and at 1.06 ms the
vreg variant already leaves <1% of the full-batch step on the table.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sha256 import _K, _H0, _rotr


def schedule_w(warr: jnp.ndarray) -> jnp.ndarray:
    """Message schedule, vectorized over blocks (and any batch dims):
    (nblocks, 16, B) uint32 -> (nblocks, 64, B)."""
    w = [warr[:, i] for i in range(16)]
    for i in range(16, 64):
        s0 = (_rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18)
              ^ (w[i - 15] >> np.uint32(3)))
        s1 = (_rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19)
              ^ (w[i - 2] >> np.uint32(10)))
        w.append(w[i - 16] + s0 + w[i - 7] + s1)
    return jnp.stack(w, axis=1)


def rounds_body(w_ref, out_ref, *, nblocks: int):
    """One full compression chain. w_ref: (nblocks, 64) uint32 (VMEM ref
    or array), out_ref: (1, 8) uint32. State words are (1, 1) vregs; the
    only dynamic index is the block number (sublane dim of w_ref)."""

    def rotr(x, n):
        return (x >> np.uint32(n)) | (x << np.uint32(32 - n))

    def one(v):
        return jnp.full((1, 1), np.uint32(v), jnp.uint32)

    def block(b, h):
        a, bb, c, d, e, f, g, hh = h
        for i in range(64):
            wi = w_ref[pl.dslice(b, 1), i:i + 1]
            s1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
            ch = (e & f) ^ (~e & g)
            t1 = hh + s1 + ch + np.uint32(_K[i]) + wi
            s0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
            maj = (a & bb) ^ (a & c) ^ (bb & c)
            t2 = s0 + maj
            hh, g, f, e, d, c, bb, a = g, f, e, d + t1, c, bb, a, t1 + t2
        return tuple(x + y for x, y in
                     zip(h, (a, bb, c, d, e, f, g, hh)))

    hfin = jax.lax.fori_loop(
        0, nblocks, block, tuple(one(v) for v in _H0))
    for i in range(8):
        out_ref[0:1, i:i + 1] = hfin[i]


@lru_cache(maxsize=None)
def _compiled(B: int, nblocks: int, interpret: bool):
    fn = pl.pallas_call(
        partial(rounds_body, nblocks=nblocks),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, nblocks, 64),
                               lambda b: (b, 0, 0))],
        out_specs=pl.BlockSpec((None, 1, 8), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, 8), jnp.uint32),
        interpret=interpret,
    )
    return jax.jit(fn)


def sha256_chain(words: jnp.ndarray, nblocks: int,
                 interpret: bool = False) -> jnp.ndarray:
    """words: (nblocks*16, *batch) uint32 message words (already padded)
    -> (8, *batch) final hash state (same contract as the scan path)."""
    bshape = words.shape[1:]
    bflat = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    warr = words.reshape(nblocks, 16, bflat)
    wfull = schedule_w(warr)                       # (nblocks, 64, Bflat)
    wt = jnp.transpose(wfull, (2, 0, 1))           # (Bflat, nblocks, 64)
    out = _compiled(bflat, nblocks, interpret)(wt)
    h = jnp.transpose(out[:, 0, :], (1, 0))        # (8, Bflat)
    return h.reshape((8,) + bshape)
