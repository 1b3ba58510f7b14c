"""ark-serialize (0.3) compatible encodings: round-trips + golden fixtures.

Golden fixtures are self-generated regression anchors (no Rust toolchain
in this environment — see utils/arkserde.py provenance note); the format
rules are transcribed from ark-serialize 0.3 flags.rs / ark-ec 0.3
short_weierstrass_jacobian.rs.
"""

import random

import pytest

from zkt_plonk_tpu.curves import make_context, curve_host as ch
from zkt_plonk_tpu.utils import arkserde as aser

CURVES = ["bn254", "bls12_377", "bls12_381"]


@pytest.mark.parametrize("name", CURVES)
def test_fp_roundtrip_and_flags(name):
    ctx = make_context(name)
    p = ctx.curve.fq.modulus
    rng = random.Random(1)
    for _ in range(20):
        v = rng.randrange(p)
        assert aser.fp_from_bytes(aser.fp_to_bytes(v, p), p) == v
    v = rng.randrange(p)
    data = aser.fp_to_bytes(v, p, aser.SW_POSITIVE_Y)
    got, flags = aser.fp_from_bytes(data, p, with_flags=True)
    assert got == v and flags == aser.SW_POSITIVE_Y


@pytest.mark.parametrize("name", CURVES)
def test_sqrt_mod(name):
    ctx = make_context(name)
    p = ctx.curve.fq.modulus
    rng = random.Random(2)
    for _ in range(10):
        x = rng.randrange(1, p)
        r = aser.sqrt_mod(x * x % p, p)
        assert r is not None and r * r % p == x * x % p


@pytest.mark.parametrize("name", CURVES)
def test_g1_compressed_roundtrip(name):
    ctx = make_context(name)
    p = ctx.curve.fq.modulus
    b = ctx.curve.b
    rng = random.Random(3)
    pts = [None, (int(ctx.g1[0]), int(ctx.g1[1]))]
    for _ in range(6):
        q = ch.scalar_mul(ctx.g1, rng.randrange(2, 1 << 60))
        pts.append((int(q[0]), int(q[1])))
    for pt in pts:
        data = aser.g1_to_bytes_compressed(pt, p)
        assert len(data) == aser.field_byte_size(p)
        back = aser.g1_from_bytes_compressed(data, p, b)
        assert back == pt
        # uncompressed too
        data_u = aser.g1_to_bytes_uncompressed(pt, p)
        assert aser.g1_from_bytes_uncompressed(data_u, p) == pt


def test_golden_fixtures_bn254():
    """Self-generated anchors: BN254 generator (1, 2) and infinity."""
    ctx = make_context("bn254")
    p = ctx.curve.fq.modulus
    # y = 2 < p - 2 -> NegativeY -> no flag bits; x = 1 little-endian
    assert aser.g1_to_bytes_compressed((1, 2), p).hex() == "01" + "00" * 31
    # infinity: zero x with bit 6 of the last byte
    assert aser.g1_to_bytes_compressed(None, p).hex() == "00" * 31 + "40"
    # negated generator: y = p - 2 > p - y -> PositiveY (bit 7)
    data = aser.g1_to_bytes_compressed((1, p - 2), p)
    assert data.hex() == "01" + "00" * 30 + "80"
    assert aser.g1_from_bytes_compressed(data, p, ctx.curve.b) == (1, p - 2)


def test_proof_bytes_roundtrip():
    from zkt_plonk_tpu.proof_system.proof import Proof, ProofEvaluations

    ctx = make_context("bn254")
    fq = ctx.curve.fq.modulus
    fr = ctx.curve.fr.modulus
    rng = random.Random(4)

    def pt():
        q = ch.scalar_mul(ctx.g1, rng.randrange(2, 1 << 60))
        return (int(q[0]), int(q[1]))

    evals = ProofEvaluations(**{k: rng.randrange(fr) for k in aser._EVAL_ORDER})
    proof = Proof(
        **{name: pt() for name in aser._COMMIT_ORDER},
        aw_opening=pt(),
        saw_opening=pt(),
        evaluations=evals,
    )
    data = aser.proof_to_bytes(proof, fq, fr)
    # 11 commitments + 2 openings (+1 Option byte each) + 12 evals
    assert len(data) == 13 * 32 + 2 + 12 * 32
    back = aser.proof_from_bytes(data, fq, fr, ctx.curve.b)
    assert back == proof or all(
        getattr(back, n) == getattr(proof, n)
        for n in aser._COMMIT_ORDER + ["aw_opening", "saw_opening", "evaluations"]
    )
