"""On-TPU validation runner: `python -m tests.tpu_checks`.

The pytest suite runs on a virtual CPU mesh (conftest.py); this script
exercises the TPU-only fused kernels on the real chip and bit-compares
them against the portable XLA paths.
"""

import time

import numpy as np
import jax

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P
from circuits_tpu.ops import poseidon as pos


def main():
    assert jax.default_backend() == "tpu", (
        f"need a TPU, got {jax.default_backend()}")
    from circuits_tpu.ops.pallas_poseidon import permute_mont as pallas_pm

    rng = np.random.default_rng(0)

    def rnd():
        return (int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63))
                * int(rng.integers(0, 2**63))) % P

    for t, b in [(3, 5), (4, 130), (5, 300), (6, 1024), (7, 2049)]:
        st = fr.pack(np.array([[rnd() for _ in range(b)]
                               for _ in range(t)], dtype=object))
        stm = fr.to_mont(st)
        ref = np.asarray(jax.jit(pos.permute_mont_xla)(stm))
        got = np.asarray(pallas_pm(stm))
        assert np.array_equal(ref, got), f"poseidon t={t} B={b} mismatch"
        print(f"poseidon pallas t={t} B={b}: bit-exact vs XLA")

    # throughput spot check
    for t in (3, 5):
        B = 65536
        st = fr.pack(np.array([[rnd() for _ in range(64)] * (B // 64)
                               for _ in range(t)], dtype=object))
        stm = fr.to_mont(st)
        jax.block_until_ready(pallas_pm(stm))
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(pallas_pm(stm))
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"poseidon pallas t={t}: {B/best/1e6:.3f} Mhash/s")

    # fused SMT chain + EdDSA kernels vs the XLA paths (shared check
    # bodies with tests/test_pallas_kernels.py, which skips off-TPU)
    from tests.test_pallas_kernels import check_pallas_smt, check_pallas_eddsa

    check_pallas_smt()
    print("smt pallas chain: bit-exact vs XLA (insert/pushdown/update/nop)")
    check_pallas_eddsa()
    print("eddsa pallas: agrees with XLA (valid/tampered/disabled lanes)")

    from tests.test_sha256 import check_sha256_xla_path

    check_sha256_xla_path()
    print("sha256 XLA scan path: matches hashlib")

    # pallas SHA-256 rounds kernel at the production chain length
    import hashlib

    import jax.numpy as jnp

    from circuits_tpu.ops import sha256 as sha_mod

    nbits = 420752
    msg = rng.integers(0, 256, size=nbits // 8).astype(np.uint8)
    bits = jnp.asarray(np.unpackbits(msg)[:nbits]
                       .reshape(nbits, 1).astype(np.uint32))
    prev = sha_mod._BACKEND
    sha_mod._BACKEND = "pallas"
    try:
        out = np.asarray(jax.jit(
            lambda b: sha_mod.sha256_bits(b))(bits))[:, 0]
    finally:
        sha_mod._BACKEND = prev
    expect = np.unpackbits(np.frombuffer(
        hashlib.sha256(msg.tobytes()).digest(), dtype=np.uint8))
    assert np.array_equal(out, expect), "pallas sha256 mismatch"
    print(f"sha256 pallas rounds kernel ({(nbits + 65 + 511) // 512} "
          f"blocks): matches hashlib")

    print("ALL TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
