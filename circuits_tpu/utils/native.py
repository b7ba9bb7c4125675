"""ctypes loader for the native host library (native/fr_poseidon.cpp).

Builds the shared object on demand with g++ (cached by mtime), installs
the circomlib Poseidon constants (generated in Python, converted to
Montgomery form), and exposes `poseidon_native`. Falls back silently when
no compiler is available — `available` is False and callers keep using
the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

from ..field.scalar import P

_R = (1 << 256) % P

_ROOT = Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "fr_poseidon.cpp"
_SO = _ROOT / "native" / "libfr_poseidon.so"

available = False
_lib = None
_installed_t: set[int] = set()


def _build() -> bool:
    if not _SRC.exists():
        return False
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _to_limbs_bytes(x: int) -> bytes:
    return (x % P).to_bytes(32, "little")


def _from_limbs_bytes(b: bytes) -> int:
    return int.from_bytes(b, "little")


def _load():
    global _lib, available
    if _lib is not None:
        return
    if not _build():
        return
    try:
        _lib = ctypes.CDLL(str(_SO))
    except OSError:
        return
    _lib.poseidon_hash.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_char_p]
    _lib.poseidon_hash_batch.argtypes = [ctypes.c_int, ctypes.c_long,
                                         ctypes.c_char_p, ctypes.c_char_p]
    _lib.set_poseidon_params.argtypes = [ctypes.c_int, ctypes.c_int,
                                         ctypes.c_char_p, ctypes.c_char_p]
    available = True


def _install_constants(t: int):
    from ..ops.poseidon_constants import constants, N_ROUNDS_P

    if t in _installed_t:
        return
    C, M = constants(t)
    rp = N_ROUNDS_P[t - 2]
    cbuf = b"".join(_to_limbs_bytes((c * _R) % P) for c in C)
    mbuf = b"".join(_to_limbs_bytes((M[i][j] * _R) % P)
                    for i in range(t) for j in range(t))
    _lib.set_poseidon_params(t, rp, cbuf, mbuf)
    _installed_t.add(t)


def poseidon_native(inputs: list[int]) -> int:
    """Drop-in for poseidon_py (canonical int inputs/output)."""
    t = len(inputs) + 1
    _install_constants(t)
    ibuf = b"".join(_to_limbs_bytes(x) for x in inputs)
    obuf = ctypes.create_string_buffer(32)
    _lib.poseidon_hash(t, ibuf, obuf)
    return _from_limbs_bytes(obuf.raw)


def poseidon_native_batch(n_inputs: int, rows: list[list[int]]) -> list[int]:
    t = n_inputs + 1
    _install_constants(t)
    ibuf = b"".join(_to_limbs_bytes(x) for row in rows for x in row)
    obuf = ctypes.create_string_buffer(32 * len(rows))
    _lib.poseidon_hash_batch(t, len(rows), ibuf, obuf)
    return [_from_limbs_bytes(obuf.raw[32 * i:32 * i + 32])
            for i in range(len(rows))]


_load()
