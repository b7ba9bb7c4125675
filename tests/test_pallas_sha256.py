"""The pallas SHA-256 rounds kernel vs hashlib, off-chip.

Runs the EXACT kernel body in pallas interpret mode (small shapes, so
the XLA:CPU compile is cheap) and also checks the out-of-kernel message
schedule against the scan path — a kernel-body edit that changes results
fails here, not only in tests/tpu_checks.py on the chip."""

import hashlib

import numpy as np
import jax.numpy as jnp

from circuits_tpu.ops import sha256 as sha_mod
from circuits_tpu.ops.pallas_sha256 import schedule_w, sha256_chain


def _ref_digest_bits(msg_bits):
    """hashlib digest of an MSB-first bit list -> MSB-first bit array."""
    nbits = len(msg_bits)
    assert nbits % 8 == 0
    msg = bytes(
        int("".join(map(str, msg_bits[i:i + 8])), 2)
        for i in range(0, nbits, 8))
    d = hashlib.sha256(msg).digest()
    return np.array([(byte >> (7 - j)) & 1 for byte in d for j in
                     range(8)], dtype=np.uint32)


def _words(bits_col, nbits):
    """Reproduce sha256_bits' padding+packing for one (nbits,1) column,
    returning (nblocks*16, 1) words and nblocks."""
    nblocks = (nbits + 65 + 511) // 512
    total = nblocks * 512
    allbits = np.zeros((total, 1), dtype=np.uint32)
    allbits[:nbits] = bits_col
    allbits[nbits] = 1
    for i in range(64):
        allbits[total - 64 + i] = (nbits >> (63 - i)) & 1
    words = np.zeros((total // 32, 1), dtype=np.uint32)
    for w in range(total // 32):
        v = 0
        for j in range(32):
            v = (v << 1) | int(allbits[w * 32 + j, 0])
        words[w, 0] = v
    return words, nblocks


def test_rounds_kernel_interpret_vs_hashlib():
    rng = np.random.default_rng(7)
    for nbits in (8, 512, 1000):  # 1, 2 and 3 block chains
        bits = rng.integers(0, 2, size=(nbits, 1)).astype(np.uint32)
        words, nblocks = _words(bits, nbits)
        h = np.asarray(sha256_chain(jnp.asarray(words), nblocks,
                                    interpret=True))  # (8, 1)
        got = np.concatenate(
            [[(h[i, 0] >> (31 - j)) & 1 for j in range(32)]
             for i in range(8)]).astype(np.uint32)
        expect = _ref_digest_bits([int(b) for b in bits[:, 0]])
        assert np.array_equal(got, expect), nbits


def test_rounds_kernel_interpret_batched():
    rng = np.random.default_rng(11)
    nbits, B = 704, 3
    cols = [rng.integers(0, 2, size=(nbits, 1)).astype(np.uint32)
            for _ in range(B)]
    words = np.concatenate(
        [_words(c, nbits)[0] for c in cols], axis=1)
    nblocks = _words(cols[0], nbits)[1]
    h = np.asarray(sha256_chain(jnp.asarray(words), nblocks,
                                interpret=True))  # (8, B)
    for b in range(B):
        expect = _ref_digest_bits([int(x) for x in cols[b][:, 0]])
        got = np.concatenate(
            [[(h[i, b] >> (31 - j)) & 1 for j in range(32)]
             for i in range(8)]).astype(np.uint32)
        assert np.array_equal(got, expect), b


def test_schedule_matches_scan_path():
    """schedule_w must agree with the in-scan expansion: compare the
    full digest of the xla scan path against hashlib via sha256_bits
    (CPU FFI may shortcut it, so drive _compress_block directly)."""
    rng = np.random.default_rng(3)
    nbits = 600
    bits = rng.integers(0, 2, size=(nbits, 1)).astype(np.uint32)
    words, nblocks = _words(bits, nbits)
    warr = jnp.asarray(words).reshape(nblocks, 16, 1)
    wfull = np.asarray(schedule_w(warr))  # (nblocks, 64, 1)
    # re-derive rounds 16..63 with the scan path's formulas
    h = tuple(jnp.full((1,), v, jnp.uint32) for v in sha_mod._H0)
    for blk in range(nblocks):
        h = sha_mod._compress_block(h, jnp.asarray(words).reshape(
            nblocks, 16, 1)[blk])
    hstack = np.stack([np.asarray(x) for x in h])[:, 0]
    expect = _ref_digest_bits([int(b) for b in bits[:, 0]])
    got = np.concatenate(
        [[(hstack[i] >> (31 - j)) & 1 for j in range(32)]
         for i in range(8)]).astype(np.uint32)
    assert np.array_equal(got, expect)
    # and the schedule itself: w[16:] recomputed from w[:16]
    w = [np.asarray(warr[:, i, 0]) for i in range(16)]
    for i in range(16, 64):
        s0 = (np.right_shift(w[i-15], 7) | np.left_shift(w[i-15], 25)) \
            ^ (np.right_shift(w[i-15], 18) | np.left_shift(w[i-15], 14)) \
            ^ np.right_shift(w[i-15], 3)
        s1 = (np.right_shift(w[i-2], 17) | np.left_shift(w[i-2], 15)) \
            ^ (np.right_shift(w[i-2], 19) | np.left_shift(w[i-2], 13)) \
            ^ np.right_shift(w[i-2], 10)
        w.append((w[i-16] + s0 + w[i-7] + s1).astype(np.uint32))
    assert np.array_equal(np.stack(w, axis=1), wfull[:, :, 0])
