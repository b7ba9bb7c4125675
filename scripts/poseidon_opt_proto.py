"""Prototype: Poseidon optimized partial-round schedule (pure Python).

Derives the sparse-matrix factorization that turns each partial round's
dense t*t MDS mix into a (2t-1)-mul sparse apply, and numerically pins
it bit-exact against the naive circomlib-order evaluation for t=2..7.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from circuits_tpu.field.scalar import P
from circuits_tpu.ops.poseidon_constants import (constants, N_ROUNDS_F,
                                                 N_ROUNDS_P, poseidon_py)
import random

rng = random.Random(5)


def mat_mul(A, B):
    t = len(A)
    return [[sum(A[i][k] * B[k][j] for k in range(t)) % P
             for j in range(t)] for i in range(t)]


def mat_vec(A, v):
    t = len(A)
    return [sum(A[i][k] * v[k] for k in range(t)) % P for i in range(t)]


def mat_inv(A):
    t = len(A)
    M = [[A[i][j] % P for j in range(t)] + [1 if i == j else 0
                                            for j in range(t)]
         for i in range(t)]
    for col in range(t):
        piv = next(r for r in range(col, t) if M[r][col] % P)
        M[col], M[piv] = M[piv], M[col]
        inv = pow(M[col][col], P - 2, P)
        M[col] = [(x * inv) % P for x in M[col]]
        for r in range(t):
            if r != col and M[r][col]:
                f = M[r][col]
                M[r] = [(M[r][j] - f * M[col][j]) % P for j in range(2 * t)]
    return [row[t:] for row in M]


def sbox(x):
    return pow(x, 5, P)


def naive_permute(t, state):
    C, M = constants(t)
    rf, rp = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    state = list(state)
    for r in range(rf + rp):
        state = [(state[i] + C[r * t + i]) % P for i in range(t)]
        full = r < rf // 2 or r >= rf // 2 + rp
        if full:
            state = [sbox(x) for x in state]
        else:
            state[0] = sbox(state[0])
        state = mat_vec(M, state)
    return state


def optimize(t):
    """Returns (cst, pre_sparse, sparse_list, M).
    cst: per-round equivalent constants (rf+rp vectors; partial-round
    vectors are lane-0-only). sparse_list[r]: (row0 (t,), col0tail (t-1,))."""
    C, Mfull = constants(t)
    rf, rp = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    half = rf // 2
    M = [list(r) for r in Mfull]
    Minv = mat_inv(M)
    cst = [[C[r * t + i] % P for i in range(t)] for r in range(rf + rp)]

    # ---- equivalent constants: move non-lane0 partial ARKs backward ----
    for i in range(half + rp - 1, half, -1):
        inv = mat_vec(Minv, cst[i])
        cst[i] = [inv[0]] + [0] * (t - 1)
        for j in range(1, t):
            cst[i - 1][j] = (cst[i - 1][j] + inv[j]) % P

    # ---- matrices: factor each partial-round mix N = S . M'' (column
    # convention: N x = S(M'' x)); the block part M'' = diag(1, B)
    # commutes left past the lane-0 sbox and the lane-0 post-sbox adds,
    # merging into the previous round's mix. Processing the last partial
    # round first: N_{r-1} = M''_r . M; after r=0 the residue becomes the
    # pre-sparse matrix of the last first-half full round, and the first
    # partial round's folded ARK vector D transforms to M''_0 . D. ----
    sparse = []
    N = [list(r) for r in M]
    for _ in range(rp):  # r = rp-1 ... 0
        B = [[N[i][j] for j in range(1, t)] for i in range(1, t)]
        Binv = mat_inv(B)
        # S row 0: [N00, N[0,1:] . B^{-1}]; col 0 tail: N[1:,0]
        v_s = [sum(N[0][k + 1] * Binv[k][j] for k in range(t - 1)) % P
               for j in range(t - 1)]
        sparse.append(([N[0][0]] + v_s, [N[i][0] for i in range(1, t)]))
        mpp = [[1 if (i == j == 0) else
                (0 if (i == 0 or j == 0) else B[i - 1][j - 1])
                for j in range(t)] for i in range(t)]
        N = mat_mul(mpp, M)
        last_B = B
    sparse.reverse()
    pre_sparse = N
    # D = cst[half] crosses M''_0 = diag(1, last_B): D <- M''_0 . D
    D = cst[half]
    cst[half] = [D[0]] + mat_vec(last_B, D[1:])
    return cst, pre_sparse, sparse, M


def sparse_apply(row0, col0tail, state):
    t = len(state)
    out0 = sum(row0[j] * state[j] for j in range(t)) % P
    return [out0] + [(state[i] + col0tail[i - 1] * state[0]) % P
                     for i in range(1, t)]


def opt_permute(t, state):
    cst, pre_sparse, sparse, M = optimize(t)
    rf, rp = N_ROUNDS_F, N_ROUNDS_P[t - 2]
    half = rf // 2
    state = list(state)
    # first half full rounds; the LAST one mixes with pre_sparse
    for r in range(half):
        state = [(state[i] + cst[r][i]) % P for i in range(t)]
        state = [sbox(x) for x in state]
        state = mat_vec(M if r < half - 1 else pre_sparse, state)
    # partial rounds: (first round: full folded ARK) -> sbox lane0 ->
    # post-sbox lane-0 constant -> sparse mix
    for r in range(rp):
        if r == 0:
            state = [(state[i] + cst[half][i]) % P for i in range(t)]
        state[0] = sbox(state[0])
        if r < rp - 1:
            state[0] = (state[0] + cst[half + 1 + r][0]) % P
        state = sparse_apply(*sparse[r], state)
    for r in range(half + rp, rf + rp):
        state = [(state[i] + cst[r][i]) % P for i in range(t)]
        state = [sbox(x) for x in state]
        state = mat_vec(M, state)
    return state


def main():
    for t in (2, 3, 4, 5, 6, 7):
        for trial in range(3):
            st = [rng.randrange(P) for _ in range(t)]
            want = naive_permute(t, st)
            got = opt_permute(t, st)
            status = "OK" if got == want else "MISMATCH"
            print(f"t={t} trial={trial}: {status}")
            if got != want:
                print("  want", want[:2])
                print("  got ", got[:2])
                return 1
    print("all bit-exact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
