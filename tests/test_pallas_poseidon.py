"""Pallas Poseidon kernel vs the portable XLA path (bit-exact).

The fused kernel is TPU-only; on the CPU test mesh these tests are
skipped (interpret mode takes minutes per permutation width — the
kernel is validated on real TPU by `python -m tests.tpu_checks` and by
the bench, and its algebra is identical to permute_mont_xla which the
whole CPU suite exercises).
"""

import numpy as np
import jax
import pytest

from circuits_tpu.field import fr
from circuits_tpu.field.scalar import P
from circuits_tpu.ops import poseidon as pos

tpu_only = pytest.mark.skipif(jax.default_backend() != "tpu",
                              reason="pallas kernel requires TPU")


def _rand_field(rng, shape):
    out = np.empty(shape, dtype=object)
    flat = out.reshape(-1)
    for i in range(flat.size):
        flat[i] = (int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63))
                   * int(rng.integers(0, 2**63))) % P
    return out


@tpu_only
@pytest.mark.parametrize("t,b", [(3, 5), (4, 130), (5, 300), (6, 128),
                                 (7, 1025)])
def test_pallas_matches_xla(t, b):
    from circuits_tpu.ops.pallas_poseidon import permute_mont as pallas_pm
    rng = np.random.default_rng(t * 1000 + b)
    st = fr.pack(_rand_field(rng, (t, b)))
    stm = fr.to_mont(st)
    ref = np.asarray(jax.jit(pos.permute_mont_xla)(stm))
    got = np.asarray(pallas_pm(stm))
    assert np.array_equal(ref, got)


@tpu_only
def test_pallas_poseidon_known_vector():
    # circomlib Poseidon([1,2]) — the canonical smoke vector
    from circuits_tpu.ops.pallas_poseidon import permute_mont  # noqa: F401
    import os
    os.environ["CTPU_POSEIDON"] = "pallas"
    pos._BACKEND = None
    try:
        out = fr.unpack_int(pos.poseidon([fr.const(1), fr.const(2)]))
        assert out == int(
            "7853200120776062878684798364095072458815029376092732009249414926"
            "327459813530")
    finally:
        os.environ.pop("CTPU_POSEIDON")
        pos._BACKEND = None
