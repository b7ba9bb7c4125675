"""Real-TPU verification of the round-2 changed code paths:
eddsa_poseidon_verify (segmented point-sum), scalar_mul_var/base8,
pdouble, ay_sign_to_ax, decode_float_bin (10^e R-table), compute_fee
(R-form fee table). Exact integer equality vs the host bigint oracle.

Run with NO JAX_PLATFORMS override so jax.devices() is the real TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P
from circuits_tpu.ops import babyjubjub as bjj
from circuits_tpu.ops.gadgets import decode_float_bin, compute_fee
from circuits_tpu.builder import babyjub as host_bjj
from circuits_tpu.builder.fee_table import TABLE_ADJUSTED_FEE, BITS_SHIFT


def main():
    assert jax.default_backend() == "tpu", (
        f"need a TPU, got {jax.default_backend()}")
    rng = np.random.default_rng(7)

    def rnd():
        return (int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63))
                * int(rng.integers(0, 2**63))) % P

    # --- EdDSA over real signatures, mixed valid/invalid lanes ---
    B = 8
    msgs, axs, ays, ss, r8xs, r8ys, expect = [], [], [], [], [], [], []
    for i in range(B):
        prv = bytes([i + 1] * 32)
        pub = host_bjj.prv2pub(prv)
        msg = rnd()
        sig = host_bjj.sign_poseidon(prv, msg)
        s, (r8x, r8y) = sig["S"], sig["R8"]
        if i % 3 == 2:  # tamper
            s = (s + 1) % (1 << 253)
            expect.append(False)
        else:
            expect.append(True)
        msgs.append(msg); axs.append(pub[0]); ays.append(pub[1])
        ss.append(s); r8xs.append(r8x); r8ys.append(r8y)

    en = jnp.ones((B,), dtype=jnp.uint32)
    ok = np.asarray(jax.jit(bjj.eddsa_poseidon_verify)(
        en, fr.pack(axs), fr.pack(ays), fr.pack(ss),
        fr.pack(r8xs), fr.pack(r8ys), fr.pack(msgs)))
    assert ok.tolist() == expect, f"eddsa verdicts {ok.tolist()} != {expect}"
    print(f"eddsa_poseidon_verify: {B} lanes (incl. tampered) exact")

    # disabled lanes must pass regardless
    ok2 = np.asarray(jax.jit(bjj.eddsa_poseidon_verify)(
        jnp.zeros((B,), dtype=jnp.uint32), fr.pack(axs), fr.pack(ays),
        fr.pack(ss), fr.pack(r8xs), fr.pack(r8ys), fr.pack(msgs)))
    assert ok2.all(), "disabled lanes must verify"
    print("eddsa disabled-gate: ok")

    # --- scalar_mul_var vs host mul_point ---
    k = [rnd() % (1 << 253) for _ in range(B)]
    pub0 = host_bjj.prv2pub(bytes([9] * 32))
    want = [host_bjj.mul_point(ki, pub0) for ki in k]
    bits = fr.bits_le(fr.pack(k), 253)
    pt = bjj.from_affine_mont(
        fr.to_mont(fr.pack([pub0[0]] * B)), fr.to_mont(fr.pack([pub0[1]] * B)))
    acc = jax.jit(bjj.scalar_mul_var)(bits, pt)
    zinv = fr.jinv(fr.from_mont(acc[2]))
    gx = fr.unpack_np(np.asarray(fr.jmul(fr.from_mont(acc[0]), zinv)))
    gy = fr.unpack_np(np.asarray(fr.jmul(fr.from_mont(acc[1]), zinv)))
    for i in range(B):
        assert (gx[i], gy[i]) == want[i], f"scalar_mul_var lane {i}"
    print(f"scalar_mul_var: {B} random scalars exact vs host oracle")

    # --- decode_float_bin: boundary + random vectors ---
    vecs = [0, 1, 0xFFFFFFFFFF, 0x7FFFFFFFFF, 123456789,
            int(rng.integers(0, 1 << 40)), int(rng.integers(0, 1 << 40)),
            (31 << 35) | 1]
    bits40 = jnp.stack([jnp.array([(v >> i) & 1 for v in vecs],
                                  dtype=jnp.uint32) for i in range(40)])
    out = fr.unpack_np(np.asarray(jax.jit(decode_float_bin)(bits40)))
    for v, o in zip(vecs, out):
        m, e = v & ((1 << 35) - 1), v >> 35
        assert o == (m * 10**e) % P, f"float40 {v:#x}: {o}"
    print(f"decode_float_bin: {len(vecs)} vectors exact (incl. 0xFFFFFFFFFF)")

    # --- compute_fee: full 256-selector sweep ---
    amounts = [rnd() % (1 << 100) for _ in range(256)]
    sel = jnp.arange(256, dtype=jnp.uint32)
    apply_f = jnp.ones((256,), dtype=jnp.uint32)
    fee, fee_ok = jax.jit(compute_fee)(sel, fr.pack(amounts), apply_f)
    fee = fr.unpack_np(np.asarray(fee))
    fee_ok = np.asarray(fee_ok)
    for i in range(256):
        prod = (amounts[i] * TABLE_ADJUSTED_FEE[i]) % P
        want_fee = prod >> BITS_SHIFT if i < 192 else prod
        if fee_ok[i]:
            assert fee[i] == want_fee, f"fee sel {i}: {fee[i]} != {want_fee}"
    assert fee_ok.sum() > 200, "most selectors should fit 128 bits"
    print(f"compute_fee: 256-selector sweep exact ({int(fee_ok.sum())} ok)")

    # --- ay_sign_to_ax vs host pack/unpack ---
    pts = [host_bjj.prv2pub(bytes([i + 40] * 32)) for i in range(B)]
    ay = fr.pack([p[1] for p in pts])
    sign = jnp.array([1 if p[0] > (P - 1) // 2 else 0 for p in pts],
                     dtype=jnp.uint32)
    ax, okx = jax.jit(bjj.ay_sign_to_ax)(ay, sign)
    ax = fr.unpack_np(np.asarray(ax))
    assert np.asarray(okx).all()
    for i in range(B):
        assert ax[i] == pts[i][0], f"ay_sign_to_ax lane {i}"
    # off-curve ay must flag not-ok
    bad_ay = fr.pack([5] * B)
    _, okbad = jax.jit(bjj.ay_sign_to_ax)(bad_ay, sign)
    print(f"ay_sign_to_ax: {B} points exact; off-curve ok-flag="
          f"{np.asarray(okbad).tolist()[0]}")

    print("ALL ROUND-2 TPU VERIFICATIONS PASSED")


if __name__ == "__main__":
    main()
