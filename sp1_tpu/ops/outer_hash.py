"""ctypes binding for the native BN254 Poseidon2 batch hasher
(native/outer_hash.cpp) used by the wrap-stage Merkle TCS.

The permutation constants are injected from field/bn254.py at load so
the round-constant tables live in one place; a parity test pins the
native permutation against the pure-Python reference implementation.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

from ..field import bn254

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "outer_hash.cpp")

_lib = None


def _limbs(v: int, n: int = 4) -> list:
    return [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(n)]


def _int_of(arr) -> int:
    return sum(int(arr[i]) << (64 * i) for i in range(4))


def _lib_path() -> str:
    with open(_SRC, "rb") as fh:
        digest = hashlib.sha256(fh.read()).hexdigest()[:16]
    return os.path.join(_REPO, "native", "build", f"libsp1outerhash-{digest}.so")


def get_lib():
    global _lib
    if _lib is None:
        lib_path = _lib_path()
        if not os.path.exists(lib_path):
            os.makedirs(os.path.dirname(lib_path), exist_ok=True)
            tmp = lib_path + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", tmp, _SRC],
                check=True,
            )
            os.replace(tmp, lib_path)
        lib = ctypes.CDLL(lib_path)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.oh_init.argtypes = [u64p, u64p, ctypes.c_uint64, u64p,
                                ctypes.c_int, ctypes.c_int]
        lib.oh_permute.argtypes = [u64p]
        lib.oh_hash_rows.argtypes = [u32p, ctypes.c_uint64, ctypes.c_uint64, u64p]
        lib.oh_compress_layer.argtypes = [u64p, ctypes.c_uint64, u64p]
        lib.oh_grind.restype = ctypes.c_uint64
        lib.oh_grind.argtypes = [u64p, u32p, ctypes.c_uint64, ctypes.c_int]

        p = bn254.P
        r2 = (1 << 512) % p
        n0inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
        rc = np.array(
            [_limbs(c) for row in bn254.RC3 for c in row], np.uint64
        ).reshape(-1)
        p_l = np.array(_limbs(p), np.uint64)
        r2_l = np.array(_limbs(r2), np.uint64)
        lib.oh_init(
            p_l.ctypes.data_as(u64p),
            r2_l.ctypes.data_as(u64p),
            n0inv,
            rc.ctypes.data_as(u64p),
            bn254.ROUNDS_F,
            bn254.ROUNDS_P,
        )
        _lib = lib
    return _lib


def permute(state: list) -> list:
    """Native oh_permute on 3 canonical ints (parity hook)."""
    lib = get_lib()
    arr = np.array([_limbs(int(s) % bn254.P) for s in state], np.uint64).reshape(-1)
    lib.oh_permute(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    a = arr.reshape(3, 4)
    return [_int_of(a[i]) for i in range(3)]


def hash_rows(rows: np.ndarray) -> np.ndarray:
    """(H, W) canonical KoalaBear uint32 -> (H, 4) uint64 digest limbs."""
    rows = np.ascontiguousarray(rows, np.uint32)
    h, w = rows.shape
    out = np.zeros((h, 4), np.uint64)
    get_lib().oh_hash_rows(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out


def compress_layer(layer: np.ndarray) -> np.ndarray:
    """(2N, 4) digest limbs -> (N, 4) parent digest limbs."""
    layer = np.ascontiguousarray(layer, np.uint64)
    n = layer.shape[0] // 2
    out = np.zeros((n, 4), np.uint64)
    get_lib().oh_compress_layer(
        layer.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out


def grind(state: list, input_buffer: list, bits: int) -> int:
    """Native MultiField32 grind (iop/multifield.py:grind semantics)."""
    st = np.array([_limbs(int(s) % bn254.P) for s in state], np.uint64).reshape(-1)
    buf = np.asarray(input_buffer, np.uint32)
    return int(
        get_lib().oh_grind(
            st.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(buf),
            bits,
        )
    )


def digest_int(limbs: np.ndarray) -> int:
    return _int_of(limbs)


def digest_limbs(v: int) -> np.ndarray:
    return np.array(_limbs(int(v)), np.uint64)
