"""End-to-end compile/prove/verify — the reference's TestCircuit
(``plonk-core/src/plonk.rs:146-218``):

  1) a + b = c
  2) d = a * c, d is a PI
  3) if (e) { f = a } else { f = b }, f is a PI
  4) c exists in the lookup table
"""

import random

import pytest

from zkt_plonk_tpu.commitment import kzg
from zkt_plonk_tpu.cs import LookupTable, lt
from zkt_plonk_tpu.curves import make_context
from zkt_plonk_tpu.plonk import ZKTPlonk
from zkt_plonk_tpu.proof_system.proof import VerificationError


class TestCircuitDef:
    __test__ = False

    def __init__(self, a=2, b=3, d=10, e=True):
        self.a, self.b, self.d, self.e = a, b, d, e

    def synthesize(self, cs):
        a = cs.assign_variable(self.a)
        b = cs.assign_variable(self.b)
        c = cs.add_gate(lt(a), lt(b))
        sels = cs.sels().with_mul(-1)
        cs.arith_constrain(a, c, -1, sels, pi=self.d)  # -1 == ZERO wire
        e = cs.assign_variable(int(self.e))
        eb = cs.boolean_gate(e)
        f = cs.conditional_select(eb, lt(a), lt(b))
        cs.set_variable_public(lt(f))
        cs.lookup_constrain(lt(c))


@pytest.fixture(scope="module")
def srs():
    ctx = make_context("bn254")
    # enough for circuit_bound (128) * 4
    ck, cvk = kzg.setup(ctx, max_degree=1 << 10, tau=987654321)
    return ck, cvk


def test_full_prove_verify(srs):
    ck, cvk = srs
    table = LookupTable([1, 2, 5], size=100)
    instance = ZKTPlonk(curve="bn254", table=table)

    compiled = instance.compile(TestCircuitDef(), ck, cvk)
    assert compiled.vk.n == 128

    rng = random.Random(7)
    proof = instance.prove(compiled, TestCircuitDef(a=2, b=3, d=10, e=True), rng)

    # PI order: positions ascending -> [d, f] = [10, 2]
    instance.verify(compiled, proof, [10, 2])

    # wrong public input must fail
    with pytest.raises((VerificationError, AssertionError)):
        instance.verify(compiled, proof, [11, 2])


def test_tampered_proof_fails(srs):
    ck, cvk = srs
    table = LookupTable([1, 2, 5], size=100)
    instance = ZKTPlonk(curve="bn254", table=table)
    compiled = instance.compile(TestCircuitDef(), ck, cvk)
    rng = random.Random(8)
    proof = instance.prove(compiled, TestCircuitDef(a=2, b=3, d=10, e=True), rng)

    # tamper with an evaluation
    proof.evaluations.a = (proof.evaluations.a + 1) % instance.p
    with pytest.raises(VerificationError):
        instance.verify(compiled, proof, [10, 2])


# ---------------------------------------------------------------------------
# PC-scheme and curve matrix (reference ``batch_test_kzg!``/``batch_test_ipa!``
# over Bn254/Bls12-381, ``plonk-core/src/test.rs:16-90`` + ``plonk.rs:220-254``)
# ---------------------------------------------------------------------------


class SmallCircuitDef:
    """Minimal circuit exercising arith + PI + lookup (fits n = 8)."""

    def __init__(self, a=2, b=3):
        self.a, self.b = a, b

    def synthesize(self, cs):
        a = cs.assign_variable(self.a)
        b = cs.assign_variable(self.b)
        c = cs.mul_gate(lt(a), lt(b))
        cs.set_variable_public(lt(c))
        cs.lookup_constrain(lt(a))


@pytest.mark.parametrize("curve,seed", [
    ("bn254", 11),
    ("bls12_381", 14),
    ("bls12_377", 15),
])
def test_full_prove_verify_ipa(curve, seed):
    """Full PLONK pipeline over the IPA commitment scheme, all 3 curves —
    completes the reference's 6-config matrix ({Bn254, Bls12-377,
    Bls12-381} x {KZG, IPA}, ``plonk.rs:220-254``)."""
    from zkt_plonk_tpu.commitment import ipa

    table = LookupTable([1, 2, 5], size=4)
    if curve == "bn254":
        instance = ZKTPlonk(curve=curve, table=table)
    else:
        from zkt_plonk_tpu.transcript.merlin import MerlinTranscript

        instance = ZKTPlonk(
            curve=curve,
            transcript_factory=lambda label: MerlinTranscript(label, coord_bytes=48),
            table=table,
        )
    ck, cvk = ipa.setup(curve, max_degree=32)

    compiled = instance.compile(SmallCircuitDef(), ck, cvk)
    proof = instance.prove(compiled, SmallCircuitDef(), random.Random(seed))
    instance.verify(compiled, proof, [6])

    with pytest.raises((VerificationError, AssertionError)):
        instance.verify(compiled, proof, [7])

    # tampering with the opening proof must fail
    proof.evaluations.a = (proof.evaluations.a + 1) % instance.p
    with pytest.raises(VerificationError):
        instance.verify(compiled, proof, [6])


@pytest.mark.parametrize("curve,tau,seed", [
    ("bls12_381", 24680, 12),
    ("bls12_377", 13579, 13),
])
def test_full_prove_verify_bls_curves(curve, tau, seed):
    """Full pipeline over the BLS curves + KZG + Merlin transcript
    (48-byte field coordinates in both cases)."""
    from zkt_plonk_tpu.transcript.merlin import MerlinTranscript

    table = LookupTable([1, 2, 5], size=4)
    instance = ZKTPlonk(
        curve=curve,
        transcript_factory=lambda label: MerlinTranscript(label, coord_bytes=48),
        table=table,
    )
    ctx = make_context(curve)
    ck, cvk = kzg.setup(ctx, max_degree=64, tau=tau)

    compiled = instance.compile(SmallCircuitDef(), ck, cvk)
    proof = instance.prove(compiled, SmallCircuitDef(), random.Random(seed))
    instance.verify(compiled, proof, [6])

    with pytest.raises((VerificationError, AssertionError)):
        instance.verify(compiled, proof, [7])


def test_merlin_transcript_e2e(srs):
    """The CLI-default combo: BN254 + KZG + MERLIN transcript (reference
    default features, ``bin/Cargo.toml``; transcript wiring
    ``instance.rs:17-20``)."""
    from zkt_plonk_tpu.config import transcript_factory

    ck, cvk = srs
    table = LookupTable([1, 2, 5], size=100)
    instance = ZKTPlonk(
        curve="bn254",
        transcript_factory=transcript_factory("merlin"),
        table=table,
    )
    compiled = instance.compile(TestCircuitDef(), ck, cvk)
    rng = random.Random(11)
    proof = instance.prove(compiled, TestCircuitDef(a=2, b=3, d=10, e=True), rng)
    instance.verify(compiled, proof, [10, 2])
    with pytest.raises((VerificationError, AssertionError)):
        instance.verify(compiled, proof, [11, 2])


def test_proof_bytes_golden_snapshot():
    """Frozen ark-serialize proof bytes for a fixed (circuit, SRS, seed).

    DETERMINISTIC-BLINDER MODE makes the proof a pure function of
    (keys, witness, seed) — this pins the whole pipeline (gate emission,
    sigma walk, 5 rounds, openings, serialization) against accidental
    drift.  If a DELIBERATE protocol/format change lands, regenerate with
    the snippet in the assertion message.
    """
    import hashlib
    import random

    from zkt_plonk_tpu.utils import arkserde

    table = LookupTable([1, 2, 5], size=63)
    inst = ZKTPlonk(curve="bn254", table=table)

    class TinyCircuit:
        def synthesize(self, cs):
            a = cs.assign_variable(2)
            b = cs.assign_variable(3)
            c = cs.mul_gate(lt(a), lt(b))
            d = cs.add_gate(lt(c), lt(a))
            cs.set_variable_public(lt(d))
            cs.lookup_constrain(lt(a))

    ck, cvk = kzg.setup(inst.ctx, max_degree=4 * 64, tau=123456789)
    compiled = inst.compile(TinyCircuit(), ck, cvk)
    proof = inst.prove(compiled, TinyCircuit(), rng=random.Random(9))
    inst.verify(compiled, proof, [8])
    blob = arkserde.proof_to_bytes(
        proof, inst.ctx.curve.fq.modulus, inst.ctx.curve.fr.modulus
    )
    assert len(blob) == 802
    digest = hashlib.sha256(blob).hexdigest()
    assert digest == (
        "504e1dbfaa28af3d1e9da112bbb4329374e06669416c39ec1fc8015df71d3cba"
    ), (
        "proof bytes drifted — if the change is deliberate, regenerate "
        "the digest: sha256 of arkserde.proof_to_bytes for TinyCircuit "
        f"(tau=123456789, seed=9); got {digest}"
    )
