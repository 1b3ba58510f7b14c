"""Poseidon optimized path: factorization identities + schedule parity.

Mirrors the reference's mds.rs/preprocessing.rs test obligations:
M = M' x M'', sparse-apply == dense m_double_prime apply, and the
optimized schedule (compressed constants + pre-sparse + sparse rounds)
bit-identical to the plain schedule for the audited BN254 instances.
"""

import random

import pytest

from zkt_plonk_tpu.hashing import bn254_constants
from zkt_plonk_tpu.hashing.poseidon import optimized as opt


@pytest.mark.parametrize("width", [3, 4, 5])
def test_mds_factorization_identities(width):
    c = bn254_constants(width)
    p = c.p
    mds = [list(r) for r in c.mds]
    derived = opt.derive_mds_matrices(mds, p)

    # M^-1 * M = I
    assert opt.matmul(derived["m_inv"], mds, p) == opt.identity(width)
    # M = M' x M''  (mds.rs factorization invariant)
    assert opt.matmul(derived["m_prime"], derived["m_double_prime"], p) == mds

    # sparse apply == dense m_double_prime apply
    sm = opt.SparseMatrix(
        w_hat=tuple(row[0] for row in derived["m_double_prime"]),
        v_rest=tuple(derived["m_double_prime"][0][1:]),
    )
    assert sm.to_matrix() == derived["m_double_prime"]
    rng = random.Random(width)
    v = [rng.randrange(p) for _ in range(width)]
    assert sm.right_apply(v, p) == opt.right_apply(v, derived["m_double_prime"], p)


def _permute_plain(c, state):
    """The unoptimized schedule (mirrors spec.py: pre-add constants,
    s-box, dense MDS every round)."""
    p = c.p
    mds = [list(r) for r in c.mds]
    sbox = lambda x: pow(x, 5, p)
    off = 0
    for _ in range(c.half_full_rounds):
        state = [sbox((s + c.round_constants[off + i]) % p) for i, s in enumerate(state)]
        off += c.width
        state = opt.right_apply(state, mds, p)
    for _ in range(c.partial_rounds):
        state = [(s + c.round_constants[off + i]) % p for i, s in enumerate(state)]
        off += c.width
        state[0] = sbox(state[0])
        state = opt.right_apply(state, mds, p)
    for _ in range(c.half_full_rounds):
        state = [sbox((s + c.round_constants[off + i]) % p) for i, s in enumerate(state)]
        off += c.width
        state = opt.right_apply(state, mds, p)
    return state


@pytest.mark.parametrize("width", [3, 4, 5])
def test_optimized_schedule_matches_plain(width):
    c = bn254_constants(width)
    rng = random.Random(100 + width)
    for _ in range(3):
        state = [rng.randrange(c.p) for _ in range(width)]
        assert opt.permute_optimized(c, list(state)) == _permute_plain(c, state)


def test_optimized_matches_spec_hasher():
    """End-to-end: the optimized permutation reproduces the spec.py native
    hash output (state = [domain_tag] + inputs, output = state[1])."""
    from zkt_plonk_tpu.hashing import Poseidon

    c = bn254_constants(3)
    hasher = Poseidon(c, native=True)
    want = hasher.hash(None, [123, 456])
    state = [c.domain_tag, 123, 456]
    got = opt.permute_optimized(c, state)[1]
    assert got == want


def test_compressed_constant_count():
    for width in (3, 4, 5):
        c = bn254_constants(width)
        compressed, pre_sparse, sparse = opt.optimized_artifacts(c)
        assert len(compressed) == width * c.full_rounds + c.partial_rounds
        assert len(sparse) == c.partial_rounds
        assert len(pre_sparse) == width
