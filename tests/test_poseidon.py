"""Poseidon: circomlib-compatibility vectors + batched kernel vs oracle."""

import random

import numpy as np

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P
from circuits_tpu.ops.poseidon_constants import poseidon_py, constants
from circuits_tpu.ops.poseidon import jposeidon

rng = random.Random(7)

# Public circomlib/circomlibjs & go-iden3-crypto test vectors.
VECTORS = {
    (1,): 18586133768512220936620570745912940619677854269274689475585506675881198879027,
    (1, 2): 7853200120776062878684798364095072458815029376092732009249414926327459813530,
    (1, 2, 3, 4): 18821383157269793795438455681495246036402687001665670618754263018637548127333,
    (1, 2, 0, 0, 0): 1018317224307729531995786483840663576608797660851238720571059489595066344487,
    (1, 2, 3, 4, 5, 6): 20400040500897583745843009878988256314335038853985262692600694741116813247201,
}


def test_host_poseidon_vectors():
    for inp, want in VECTORS.items():
        assert poseidon_py(list(inp)) == want, f"t={len(inp)+1}"


def test_constants_shapes():
    for t in (3, 4, 5, 6, 7):
        c, m = constants(t)
        from circuits_tpu.ops.poseidon_constants import N_ROUNDS_F, N_ROUNDS_P
        assert len(c) == (N_ROUNDS_F + N_ROUNDS_P[t - 2]) * t
        assert len(m) == t and len(m[0]) == t
        assert all(0 < v < P for row in m for v in row)


def test_device_poseidon_vectors():
    for inp, want in VECTORS.items():
        arrs = [fr.pack([v]) for v in inp]
        got = fr.unpack_int(jposeidon(arrs))
        assert got == want, f"t={len(inp)+1}"


def test_device_poseidon_batch_random():
    # the widths the rollup circuits actually use: t=3,4,5,6,7
    for n in (2, 3, 4, 5, 6):
        B = 8
        cols = [[rng.randint(0, P - 1) for _ in range(B)] for _ in range(n)]
        arrs = [fr.pack(c) for c in cols]
        got = [int(v) for v in fr.unpack_np(jposeidon(arrs))]
        want = [poseidon_py([cols[i][b] for i in range(n)]) for b in range(B)]
        assert got == want, f"n={n}"
