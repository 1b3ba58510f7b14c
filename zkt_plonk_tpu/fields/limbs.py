"""Limb representation of prime-field elements for the TPU path.

A field element is an array of ``L`` 16-bit limbs, little-endian, stored in
``uint32`` lanes, in CANONICAL (non-Montgomery) form.

16-bit limbs are chosen because the TPU VPU has native 32-bit integer lanes:
a 16x16 product fits exactly in uint32 and column sums of partial products
stay far below 2^32.  Reduction is word-aligned Barrett (see
``fields/device.py``): three fully-parallel outer-product multiplies with no
sequential word recurrence — unlike Montgomery REDC, every step vectorizes
over both the batch and limb axes, which is what the VPU/MXU want.

This replaces arkworks' ``ark-ff`` Montgomery backend (+x86 ``asm`` feature,
reference ``plonk-core/Cargo.toml:65``).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Sequence

import numpy as np

from .params import FieldParams

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(v: int, n_limbs: int) -> np.ndarray:
    out = np.zeros(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = v & LIMB_MASK
        v >>= LIMB_BITS
    assert v == 0, "value does not fit in limbs"
    return out


def limbs_to_int(limbs) -> int:
    v = 0
    arr = np.asarray(limbs)
    for i in range(arr.shape[-1] - 1, -1, -1):
        v = (v << LIMB_BITS) | int(arr[..., i])
    return v


def ints_to_array(values: Sequence[int], n_limbs: int) -> np.ndarray:
    """Vector of ints -> (len, L) uint32 array (bytes fast path)."""
    nbytes = n_limbs * (LIMB_BITS // 8)
    buf = b"".join(v.to_bytes(nbytes, "little") for v in values)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(values), n_limbs)
    return u16.astype(np.uint32)


def array_to_ints(arr: np.ndarray) -> list:
    """(..., L) uint32 limb array -> list of ints (bytes fast path)."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1]).astype("<u2")
    nbytes = flat.shape[1] * 2
    raw = flat.tobytes()
    return [
        int.from_bytes(raw[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(flat.shape[0])
    ]


@dataclass(frozen=True, eq=False)
class FieldSpec:
    """Static per-field data for limb arithmetic. Hashable by identity."""

    params: FieldParams
    n_limbs: int
    modulus_limbs: np.ndarray  # (L,) uint32
    mu_limbs: np.ndarray  # (L+1,) floor(2^(32L) / p), Barrett constant

    @property
    def modulus(self) -> int:
        return self.params.modulus

    # -- host <-> device conversions (canonical form) ----------------------

    def encode(self, values: Sequence[int]) -> np.ndarray:
        """Canonical ints -> limb array (len, L)."""
        return ints_to_array(list(values), self.n_limbs)

    def decode(self, arr: np.ndarray) -> list:
        """Limb array -> canonical ints."""
        return array_to_ints(arr)

    def encode_scalar(self, v: int) -> np.ndarray:
        return int_to_limbs(v % self.modulus, self.n_limbs)

    def decode_scalar(self, arr: np.ndarray) -> int:
        return limbs_to_int(arr)

    # kept as an alias — scalars for MSM etc. are canonical already
    def encode_plain(self, values: Sequence[int]) -> np.ndarray:
        return ints_to_array(list(values), self.n_limbs)


@lru_cache(maxsize=None)
def make_spec(params: FieldParams) -> FieldSpec:
    p = params.modulus
    n_limbs = -(-p.bit_length() // LIMB_BITS)
    # word-aligned Barrett precondition: p uses the top limb
    assert p >= 1 << (LIMB_BITS * (n_limbs - 1))
    mu = (1 << (2 * LIMB_BITS * n_limbs)) // p
    return FieldSpec(
        params=params,
        n_limbs=n_limbs,
        modulus_limbs=int_to_limbs(p, n_limbs),
        mu_limbs=int_to_limbs(mu, n_limbs + 1),
    )
