"""float40 + compute-fee gadget tests (mirrors the reference's
test/lib/decode-float.test.js and test/compute-fee.test.js)."""

import random

import numpy as np
import jax.numpy as jnp

from circuits_tpu.field import fr
from circuits_tpu.builder import float40
from circuits_tpu.builder.fee_table import compute_fee as fee_py
from circuits_tpu.ops.gadgets import jdecode_float, jcompute_fee

rng = random.Random(12)

# test/lib/decode-float.test.js:28-38 vectors
FLOAT_VECTORS = [
    (6 * 0x800000000 + 123, 123000000),
    (2 * 0x800000000 + 4545, 454500),
    (30 * 0x800000000 + 10235, 10235000000000000000000000000000000),
    (0, 0),
    (0x800000000, 0),
    (0x0001, 1),
    (31 * 0x800000000, 0),
    (0x800000000 + 1, 10),
    (0xFFFFFFFFFF, 343597383670000000000000000000000000000000),
]


def test_host_float40():
    for fl, fix in FLOAT_VECTORS:
        assert float40.float2fix(fl) == fix
    assert float40.fix2float(123000000) == 123000000  # m-maximal encoding
    assert float40.float2fix(float40.fix2float(454500)) == 454500
    big = 343597383670000000000000000000000000000000
    assert float40.float2fix(float40.fix2float(big)) == big
    for _ in range(50):
        v = float40.round_fix(rng.randrange(2 ** 50))
        assert float40.float2fix(float40.fix2float(v)) == v
    assert float40.floor_fix2float(10 ** 10 + 1) <= 0xFFFFFFFFFF


def test_device_decode_float():
    fls = [v[0] for v in FLOAT_VECTORS]
    out, ok = jdecode_float(fr.pack(fls))
    assert all(np.asarray(ok))
    got = [int(v) for v in fr.unpack_np(out)]
    assert got == [v[1] for v in FLOAT_VECTORS]


def test_mux256_all_selectors():
    # reference test/lib/mux256.test.js: random 256-entry table, every
    # selector returns its entry
    from circuits_tpu.ops.gadgets import mux256
    import jax

    table_vals = [rng.randrange(2 ** 253) for _ in range(256)]
    table = jnp.asarray(fr.pack_np(table_vals).T)  # (256, 16) limb rows
    sel = jnp.asarray(np.arange(256, dtype=np.uint32))
    out = jax.jit(mux256)(sel, table)
    got = [int(v) for v in fr.unpack_np(np.asarray(out))]
    assert got == table_vals


def test_compute_fee_all_selectors():
    """Sweep all 256 fee selectors (test/compute-fee.test.js:33-91)."""
    amount = 10 ** 18
    sels = list(range(256))
    fee, ok = jcompute_fee(
        jnp.asarray(np.array(sels, np.uint32)),
        fr.pack([amount] * 256),
        jnp.ones(256, jnp.uint32))
    got = [int(v) for v in fr.unpack_np(fee)]
    want = [fee_py(amount, s) for s in sels]
    bad = [i for i in range(256) if got[i] != want[i]]
    assert not bad, bad[:5]
    assert all(np.asarray(ok))


def test_compute_fee_apply_fee_zero():
    fee, ok = jcompute_fee(
        jnp.asarray(np.array([176, 255], np.uint32)),
        fr.pack([10 ** 18, 10 ** 18]),
        jnp.zeros(2, jnp.uint32))
    assert [int(v) for v in fr.unpack_np(fee)] == [0, 0]
    assert all(np.asarray(ok))


def test_compute_fee_overflow():
    """Overflow >128 bits must flag (test/compute-fee.test.js:93-129
    fails at selector 208 with a huge amount)."""
    amount = (1 << 126) + 5
    fee, ok = jcompute_fee(
        jnp.asarray(np.array([208, 0], np.uint32)),
        fr.pack([amount, amount]),
        jnp.ones(2, jnp.uint32))
    assert list(np.asarray(ok)) == [False, True]
