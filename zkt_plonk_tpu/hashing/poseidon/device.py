"""Vectorized DEVICE Poseidon — B hashes in parallel on limb arrays.

The TPU-native "native side" of the hasher (SURVEY.md §2.5 item 5): the
same round schedule as ``spec.py`` (``plonk-hashing/src/hasher/poseidon/
spec.rs:267-310``) but over ``uint32[..., L]`` limb batches with the
``fields.device`` ops, so bulk hashing (Merkle tree construction, note
commitments, nullifier batches) runs on the VPU/pallas field kernels
instead of per-hash host loops.

Per the CLAUDE.md closure rule, all constant tables (round constants,
MDS, domain tag) are jit ARGUMENTS — build them once with
:func:`device_tables` and pass them to :func:`permute_batch`.

Bit-identical to the host schedule (the plain one: full round =
x -> (x + rc)^5, partial round adds all rcs then sboxes row 0, MDS matmul
every round; output = state row 1) — parity-tested in
``tests/test_poseidon.py``.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...fields import device as fd
from ...fields.limbs import FieldSpec, ints_to_array, make_spec
from .constants import PoseidonConstants


def device_tables(spec: FieldSpec, constants: PoseidonConstants) -> Dict:
    """Constant tables as arrays (pass as jit arguments, never close over).

    rc: (R, W, L) per-round constants; mds: (W*W, L) row-major matrix;
    tag: (L,) domain tag.
    """
    w = constants.width
    rcs = list(constants.round_constants)
    R = len(rcs) // w
    rc = ints_to_array(rcs, spec.n_limbs).reshape(R, w, spec.n_limbs)
    mds_flat = [constants.mds[i][j] for i in range(w) for j in range(w)]
    return {
        "rc": jnp.asarray(rc),
        "mds": jnp.asarray(ints_to_array(mds_flat, spec.n_limbs)),
        "tag": jnp.asarray(ints_to_array([constants.domain_tag], spec.n_limbs)[0]),
    }


def _sbox5(spec, x):
    sq = fd.mul(spec, x, x)
    quad = fd.mul(spec, sq, sq)
    return fd.mul(spec, quad, x)


def _mds_apply(spec, state, mds):
    """state (W, B, L) x mds (W*W, L) -> (W, B, L): out_j = sum_i s_i m_ij.

    One stacked multiply of all W*W products, then a log-depth add tree
    over i — the fused-kernel form of ``spec.rs:73-88``.
    """
    W = state.shape[0]
    lhs = jnp.repeat(state, W, axis=0)  # rows (i, j) = s_i
    prods = fd.mul(spec, lhs, mds[:, None, :])  # (W*W, B, L)
    acc = prods.reshape(W, W, *state.shape[1:])  # [i, j]
    k = W
    while k > 1:
        half = (k + 1) // 2
        lo = acc[:half]
        hi = acc[half:k]
        if hi.shape[0] < half:
            hi = jnp.concatenate(
                [hi, jnp.zeros_like(acc[:half - hi.shape[0]])], axis=0
            )
        acc = fd.add(spec, lo, hi)
        k = half
    return acc[0]  # (W, B, L) indexed by j


def permute_batch(
    spec: FieldSpec, rc: jnp.ndarray, mds: jnp.ndarray, state: jnp.ndarray,
    half_full: int, partial: int,
) -> jnp.ndarray:
    """Run the full Poseidon permutation on a batch: state (W, B, L).

    ``half_full``/``partial`` are STATIC round counts (fori bounds)."""

    def full_round(r, st):
        st = fd.add(spec, st, rc[r][:, None, :])
        st = _sbox5(spec, st)
        return _mds_apply(spec, st, mds)

    def partial_round(r, st):
        st = fd.add(spec, st, rc[r][:, None, :])
        row0 = _sbox5(spec, st[0])
        st = jnp.concatenate([row0[None], st[1:]], axis=0)
        return _mds_apply(spec, st, mds)

    st = jax.lax.fori_loop(0, half_full, full_round, state)
    st = jax.lax.fori_loop(half_full, half_full + partial, partial_round, st)
    st = jax.lax.fori_loop(
        half_full + partial, 2 * half_full + partial, full_round, st
    )
    return st


def hash_batch_device(
    constants: PoseidonConstants, rows: Sequence[Sequence[int]], params=None
) -> List[int]:
    """Hash B input rows (each up to arity ints, zero-padded) on device.

    Drop-in batched equivalent of ``Poseidon.hash_many_native``; output is
    permuted state row 1 (``spec.rs:309``).
    """
    from ...fields import BN254_FR

    spec = make_spec(params if params is not None else BN254_FR)
    t = device_tables(spec, constants)
    w = constants.width
    arity = w - 1
    B = len(rows)
    padded = [list(r) + [0] * (arity - len(r)) for r in rows]
    cols = [[padded[b][i] for b in range(B)] for i in range(arity)]
    state = np.stack(
        [np.tile(ints_to_array([constants.domain_tag], spec.n_limbs), (B, 1))]
        + [ints_to_array(c, spec.n_limbs) for c in cols]
    )  # (W, B, L)

    out = jax.jit(permute_batch, static_argnums=(0, 4, 5))(
        spec, t["rc"], t["mds"], jnp.asarray(state),
        constants.full_rounds // 2, constants.partial_rounds,
    )
    return spec.decode(np.asarray(out[1]))
