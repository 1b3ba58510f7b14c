"""Poseidon tests: parameter generation, MDS identities, native-vs-circuit
equivalence (the reference's sanity_test pattern, ``spec.rs:384-419``), and
round-number known answers (``round_numbers.rs:107-136``)."""

import random

import pytest

from zkt_plonk_tpu.fields import BN254_FR, BLS12_381_FR
from zkt_plonk_tpu.cs import LookupTable, lt
from zkt_plonk_tpu.cs.helper import test_gate_constraints as run_gate_constraints
from zkt_plonk_tpu.hashing import Poseidon, PoseidonConstants, bn254_constants


def test_round_numbers_known_answers():
    from zkt_plonk_tpu.hashing.poseidon.constants import calc_round_numbers

    cases = [(2, 55), (3, 55), (4, 56), (5, 56), (8, 57), (16, 59), (65, 61)]
    for t, rp_expected in cases:
        rf, rp = calc_round_numbers(t, True)
        assert rf == 8, t
        assert rp == rp_expected, t


def test_bn254_baked_constants_shape():
    for width in (3, 4, 5):
        c = bn254_constants(width)
        assert c.full_rounds == 8
        assert len(c.round_constants) >= (c.full_rounds + c.partial_rounds) * width
        assert len(c.mds) == width
        assert c.domain_tag == (1 << (width - 1)) - 1


def test_mds_is_cauchy_invertible():
    from zkt_plonk_tpu.hashing.poseidon.constants import generate_mds

    p = BLS12_381_FR.modulus
    mds = generate_mds(p, 5)
    for i in range(5):
        for j in range(5):
            assert mds[i][j] * (i + 5 + j) % p == 1


@pytest.mark.parametrize("width", [3, 4, 5])
def test_native_hash_deterministic(width):
    c = bn254_constants(width)
    h = Poseidon(c, native=True)
    out1 = h.hash(None, list(range(1, width)))
    out2 = Poseidon(c, native=True).hash(None, list(range(1, width)))
    assert out1 == out2
    assert 0 < out1 < c.p


def test_generated_constants_bls():
    c = PoseidonConstants.generate(BLS12_381_FR.modulus, 5, 255)
    assert c.full_rounds == 8 and c.partial_rounds == 56
    h = Poseidon(c, native=True).hash(None, [1, 2, 3, 4])
    assert 0 < h < c.p


@pytest.mark.parametrize("width", [3, 4])
def test_native_vs_circuit_equivalence(width):
    c = bn254_constants(width)
    p = c.p
    rng = random.Random(55)
    inputs = [rng.randrange(p) for _ in range(width - 1)]
    native_hash = Poseidon(c, native=True).hash(None, inputs)

    def process(cs):
        input_vars = [lt(cs.assign_variable(v)) for v in inputs]
        circuit_hash = Poseidon(c, native=False).hash(cs, input_vars)
        return [(circuit_hash, native_hash)]

    run_gate_constraints(p, process, [], LookupTable())


def test_full_buffer_rejected():
    from zkt_plonk_tpu.hashing.poseidon.spec import FullBufferError

    c = bn254_constants(3)
    h = Poseidon(c, native=True)
    h.input(1)
    h.input(2)
    with pytest.raises(FullBufferError):
        h.input(3)


def test_device_poseidon_matches_host():
    """Vectorized device Poseidon (``hashing/poseidon/device.py``) is
    bit-identical to the host schedule for a batch of hashes."""
    from zkt_plonk_tpu.hashing import Poseidon, bn254_constants
    from zkt_plonk_tpu.hashing.poseidon.device import hash_batch_device

    for width in (3, 4):
        c = bn254_constants(width)
        arity = width - 1
        rows = [
            [i * 17 + j + 1 for j in range(arity)] for i in range(6)
        ] + [[5]]  # one short (zero-padded) row
        want = Poseidon.hash_many_native(c, rows)
        got = hash_batch_device(c, rows)
        assert got == want, f"width {width}"
