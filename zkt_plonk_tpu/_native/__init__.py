"""ctypes binding for the native host kernels (``native/zkt_native.cpp``).

Builds the shared library on first use (g++ -O3) and exposes batch field
ops + Poseidon hashing.  Everything degrades gracefully to the pure-Python
implementations when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "zkt_native.cpp",
)
_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libzkt_native.so")


def _build() -> Optional[str]:
    if os.path.exists(_OUT) and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC):
        return _OUT
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _OUT],
            check=True,
            capture_output=True,
        )
        return _OUT
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.zkt_fr_mul_batch.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
        lib.zkt_fr_add_batch.argtypes = [u64p, u64p, u64p, ctypes.c_size_t]
        lib.zkt_fr_inv_batch.argtypes = [u64p, u64p, ctypes.c_size_t]
        lib.zkt_poseidon_init.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u64p, u64p, u64p, ctypes.c_int,
        ]
        lib.zkt_poseidon_init.restype = ctypes.c_int
        lib.zkt_poseidon_hash_batch.argtypes = [ctypes.c_int, u64p, u64p, ctypes.c_size_t]
        lib.zkt_poseidon_hash_batch.restype = ctypes.c_int
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.zkt_g1_normalize_batch.argtypes = [u64p, u64p, u8p, ctypes.c_size_t]
        lib.zkt_g1_msm.argtypes = [u64p, u8p, u64p, u64p, ctypes.c_size_t]
        lib.zkt_g1_msm.restype = ctypes.c_int
        _lib = lib
        return _lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ints_to_u64(values, n=4) -> np.ndarray:
    buf = b"".join(int(v).to_bytes(8 * n, "little") for v in values)
    return np.frombuffer(buf, dtype="<u8").reshape(len(values), n).copy()


def u64_to_ints(arr: np.ndarray):
    raw = arr.astype("<u8").tobytes()
    w = arr.shape[-1] * 8
    return [int.from_bytes(raw[i * w : (i + 1) * w], "little") for i in range(arr.shape[0])]


_poseidon_inited = set()


def poseidon_init(constants) -> bool:
    """Register a PoseidonConstants instance with the native lib."""
    lib = get_lib()
    if lib is None:
        return False
    key = (constants.width, constants.round_constants[:2])
    if key in _poseidon_inited:
        return True
    w = constants.width
    mds_flat = [constants.mds[i][j] for i in range(w) for j in range(w)]
    mds = ints_to_u64(mds_flat)
    rcs = ints_to_u64(list(constants.round_constants))
    tag = ints_to_u64([constants.domain_tag])
    rc = lib.zkt_poseidon_init(
        w, constants.full_rounds, constants.partial_rounds,
        _ptr(tag), _ptr(mds), _ptr(rcs), len(constants.round_constants),
    )
    if rc == 0:
        _poseidon_inited.add(key)
        return True
    return False


def poseidon_hash_batch(constants, inputs_list) -> Optional[list]:
    """inputs_list: list of lists (arity ints). Returns list of hashes."""
    lib = get_lib()
    if lib is None or not poseidon_init(constants):
        return None
    w = constants.width
    n = len(inputs_list)
    flat = [x for row in inputs_list for x in row]
    arr = ints_to_u64(flat).reshape(n, w - 1, 4)
    out = np.zeros((n, 4), dtype="<u8")
    rc = lib.zkt_poseidon_hash_batch(w, _ptr(arr), _ptr(out), n)
    if rc != 0:
        return None
    return u64_to_ints(out)


def fr_inv_batch(values) -> Optional[list]:
    lib = get_lib()
    if lib is None:
        return None
    arr = ints_to_u64(list(values))
    out = np.zeros_like(arr)
    lib.zkt_fr_inv_batch(_ptr(arr), _ptr(out), len(values))
    return u64_to_ints(out)


def limbs16_to_u64(arr: np.ndarray) -> np.ndarray:
    """(..., 16) uint32 16-bit limbs -> (..., 4) uint64 (little-endian)."""
    a = np.ascontiguousarray(arr).astype(np.uint64).reshape(*arr.shape[:-1], 4, 4)
    return (
        a[..., 0] | (a[..., 1] << 16) | (a[..., 2] << 32) | (a[..., 3] << 48)
    )


def g1_normalize_batch(proj_u64: np.ndarray):
    """(n, 3, 4) u64 canonical projective -> ((n, 2, 4) affine, (n,) inf)."""
    lib = get_lib()
    if lib is None:
        return None
    n = proj_u64.shape[0]
    proj = np.ascontiguousarray(proj_u64, dtype="<u8")
    aff = np.zeros((n, 2, 4), dtype="<u8")
    inf = np.zeros((n,), dtype=np.uint8)
    lib.zkt_g1_normalize_batch(
        _ptr(proj), _ptr(aff), inf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n
    )
    return aff, inf


def g1_msm(aff: np.ndarray, inf: np.ndarray, scalars_u64: np.ndarray):
    """Pippenger MSM. Returns affine (x, y) ints or None for infinity.

    aff: (n, 2, 4) u64 canonical affine; inf: (n,) uint8; scalars: (n, 4).
    Raises RuntimeError when the native lib is unavailable (callers gate
    on ``get_lib()``).
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = aff.shape[0]
    out = np.zeros((2, 4), dtype="<u8")
    rc = lib.zkt_g1_msm(
        _ptr(np.ascontiguousarray(aff, dtype="<u8")),
        np.ascontiguousarray(inf, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        _ptr(np.ascontiguousarray(scalars_u64, dtype="<u8")),
        _ptr(out),
        n,
    )
    if rc == 1:
        return None
    x, y = u64_to_ints(out)
    return (x, y)
