"""XLA:CPU FFI backend for Fr field ops (native/fr_ffi.cpp).

On the CPU backend (unit tests, the driver's virtual-mesh multichip dry
run) every Montgomery multiply / modular add / sub lowers to ONE
custom-call instruction backed by a 4x64-limb __int128 CIOS kernel,
instead of the ~300-instruction inlined limb graph the TPU path uses.
This is a compile-time weapon first (XLA:CPU compile cost is superlinear
in HLO size) and a runtime win second.

The TPU path never touches this module's kernels: `enabled()` is True
only when the process' default backend is CPU. Selection override:
CTPU_FR_BACKEND=xla forces the pure-XLA limb path on CPU too (used by
the test suite to cross-check both backends).

Native equivalent of the reference's ffiasm field library
(reference: tools/helpers/actions.js:207-229).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "fr_ffi.cpp"
_SO = _ROOT / "native" / "libfr_ffi.so"

_SYMBOLS = {
    "fr_mont_mul": "FrMontMul",
    "fr_add": "FrAdd",
    "fr_sub": "FrSub",
    "fr_pow": "FrPow",
    "fr_poseidon": "FrPoseidon",
    "sha256_blocks": "Sha256Blocks",
}

# Targets whose every operand carries the batch dim on axis 0. fr_poseidon /
# sha256_blocks take broadcast constants operands (round constants, MDS)
# without a batch axis — marking those batch-partitionable would let an
# auto-SPMD partitioner slice the constants and silently corrupt results.
_BATCH_PARTITIONABLE = {"fr_mont_mul", "fr_add", "fr_sub", "fr_pow"}

available = False
_registered = False


build_error: str | None = None


def _build() -> bool:
    global build_error
    if not _SRC.exists():
        build_error = f"source missing: {_SRC}"
        return False
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    import jax.ffi

    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-I", jax.ffi.include_dir(), "-o", str(_SO), str(_SRC)],
            check=True, capture_output=True, timeout=300)
        return True
    except subprocess.CalledProcessError as e:  # keep the compiler output
        build_error = f"g++ failed: {e.stderr.decode(errors='replace')[-500:]}"
        return False
    except Exception as e:
        build_error = f"{type(e).__name__}: {e}"
        return False


def _register() -> None:
    global available, _registered
    if _registered:
        return
    _registered = True
    if not _build():
        return
    import jax.ffi

    try:
        lib = ctypes.CDLL(str(_SO))
        for name, sym in _SYMBOLS.items():
            jax.ffi.register_ffi_target(
                name, jax.ffi.pycapsule(getattr(lib, sym)), platform="cpu")
            if name in _BATCH_PARTITIONABLE:
                try:
                    jax.ffi.register_ffi_target_as_batch_partitionable(name)
                except Exception:
                    pass  # partitionability is an optimization, not required
        available = True
    except OSError:
        return


_enabled_cache: bool | None = None


def enabled() -> bool:
    """True iff Fr ops should lower to the FFI kernels in this process."""
    global _enabled_cache
    mode = os.environ.get("CTPU_FR_BACKEND", "auto")
    if mode == "xla":
        return False
    if _enabled_cache is None:
        import jax

        if jax.default_backend() != "cpu" and mode != "ffi":
            _enabled_cache = False
        else:
            _register()
            _enabled_cache = available
    return _enabled_cache


def _call(target: str, n_limbs: int, a, b):
    """Invoke a binary (N,16)-layout kernel on limb-major (16, *batch)
    operands, broadcasting batch dims."""
    import jax
    import jax.numpy as jnp

    bshape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    a = jnp.broadcast_to(a, (n_limbs,) + bshape)
    b = jnp.broadcast_to(b, (n_limbs,) + bshape)
    n = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    at = a.reshape(n_limbs, n).T
    bt = b.reshape(n_limbs, n).T
    out = jax.ffi.ffi_call(
        target, jax.ShapeDtypeStruct((n, n_limbs), jnp.uint32))(at, bt)
    return out.T.reshape((n_limbs,) + bshape)


def mont_mul(a, b):
    return _call("fr_mont_mul", a.shape[0], a, b)


def add(a, b):
    return _call("fr_add", a.shape[0], a, b)


def sub(a, b):
    return _call("fr_sub", a.shape[0], a, b)


def poseidon_permute_mont(state_m, c_flat: np.ndarray, m_flat: np.ndarray):
    """Whole Poseidon permutation as ONE custom call.

    state_m: (16, t, *batch) Montgomery limbs; c_flat ((RF+rp)*t, 16) and
    m_flat (t*t, 16) are host numpy Montgomery constants (t and rp are
    inferred by the handler from their sizes)."""
    import jax
    import jax.numpy as jnp

    n_limbs, t = state_m.shape[0], state_m.shape[1]
    bshape = state_m.shape[2:]
    n = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    # (16, t, B) -> (B, t, 16)
    st = jnp.transpose(state_m.reshape(n_limbs, t, n), (2, 1, 0))
    out = jax.ffi.ffi_call(
        "fr_poseidon", jax.ShapeDtypeStruct((n, t, n_limbs), jnp.uint32))(
        st, jnp.asarray(c_flat), jnp.asarray(m_flat))
    return jnp.transpose(out, (2, 1, 0)).reshape(state_m.shape)


def sha256_blocks(words):
    """SHA-256 digests as ONE custom call. words: (nwords, *batch) u32
    big-endian message words, pre-padded to whole 512-bit blocks
    (nwords % 16 == 0). Returns (8, *batch) digest words."""
    import jax
    import jax.numpy as jnp

    nwords = words.shape[0]
    bshape = words.shape[1:]
    n = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    wt = words.reshape(nwords, n).T  # (N, nwords)
    out = jax.ffi.ffi_call(
        "sha256_blocks", jax.ShapeDtypeStruct((n, 8), jnp.uint32))(wt)
    return out.T.reshape((8,) + bshape)


def pow_const_mont(a_mont, e: int):
    """a^e (Montgomery in/out) with a fixed exponent — one custom call
    replaces the 2-mul-per-bit fori ladder."""
    import jax
    import jax.numpy as jnp

    n_limbs = a_mont.shape[0]
    bshape = a_mont.shape[1:]
    n = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    ebits = jnp.asarray(
        np.array([(e >> i) & 1 for i in range(e.bit_length())],
                 dtype=np.uint32))
    at = a_mont.reshape(n_limbs, n).T
    out = jax.ffi.ffi_call(
        "fr_pow", jax.ShapeDtypeStruct((n, n_limbs), jnp.uint32))(at, ebits)
    return out.T.reshape((n_limbs,) + bshape)
