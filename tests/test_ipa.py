"""IPA polynomial commitment tests.

Covers the reference's second HomomorphicCommitment instance
(`plonk-core/src/commitment.rs:49-86`): commit/open/check roundtrip,
soundness (wrong value/point rejected), homomorphism, and the
powers-of-eta batch aggregation (`commitment.rs:114-124`).
"""

import random

import pytest

from zkt_plonk_tpu.commitment import ipa
from zkt_plonk_tpu.curves import curve_host as ch
from zkt_plonk_tpu.curves import make_context


@pytest.fixture(scope="module")
def ck():
    ck, _ = ipa.setup("bn254", max_degree=31)
    return ck


def _rand_poly(rng, r, deg):
    return [rng.randrange(r) for _ in range(deg + 1)]


def test_generators_on_curve(ck):
    ctx = ck.ctx
    for g in ck.gens[:4] + [ck.u]:
        assert ch.is_on_curve(g, ctx.b)
    # deterministic + distinct
    ck2, _ = ipa.setup("bn254", max_degree=31)
    assert ipa._pt_eq(ck.gens[0], ck2.gens[0])
    assert not ipa._pt_eq(ck.gens[0], ck.gens[1])


def test_open_check_roundtrip(ck):
    rng = random.Random(7)
    r = ck.ctx.curve.fr.modulus
    poly = _rand_poly(rng, r, 17)
    c = ipa.commit(ck, poly)
    z = rng.randrange(r)
    v = ipa._eval_poly(poly, z, r)
    proof = ipa.open_poly(ck, poly, z, v)
    assert ipa.check(ck, c, z, v, proof)


def test_wrong_value_rejected(ck):
    rng = random.Random(8)
    r = ck.ctx.curve.fr.modulus
    poly = _rand_poly(rng, r, 9)
    c = ipa.commit(ck, poly)
    z = rng.randrange(r)
    v = ipa._eval_poly(poly, z, r)
    proof = ipa.open_poly(ck, poly, z, v)
    assert not ipa.check(ck, c, z, (v + 1) % r, proof)
    assert not ipa.check(ck, c, (z + 1) % r, v, proof)
    # tampered final scalar
    bad = ipa.IPAProof(proof.l_points, proof.r_points, (proof.a_final + 1) % r)
    assert not ipa.check(ck, c, z, v, bad)


def test_commit_homomorphic(ck):
    """commit(f) + k*commit(g) == commit(f + k*g) — the property the
    reference's multi_scalar_mul trait method exists for
    (commitment.rs:10-21)."""
    rng = random.Random(9)
    r = ck.ctx.curve.fr.modulus
    f = _rand_poly(rng, r, 12)
    g = _rand_poly(rng, r, 12)
    k = rng.randrange(r)
    cf, cg = ipa.commit(ck, f), ipa.commit(ck, g)
    lhs = ch.add(cf, ch.scalar_mul(cg, k))
    rhs = ipa.commit(ck, [(a + k * b) % r for a, b in zip(f, g)])
    assert ipa._pt_eq(lhs, rhs)


def test_batch_open_check(ck):
    rng = random.Random(10)
    r = ck.ctx.curve.fr.modulus
    polys = [_rand_poly(rng, r, d) for d in (5, 11, 17)]
    commits = [ipa.commit(ck, p) for p in polys]
    z = rng.randrange(r)
    eta = rng.randrange(r)
    proof, v = ipa.open_batch(ck, polys, z, eta)
    values = [ipa._eval_poly(p, z, r) for p in polys]
    assert ipa.check_batch(ck, commits, z, values, eta, proof)
    values[1] = (values[1] + 1) % r
    assert not ipa.check_batch(ck, commits, z, values, eta, proof)


def test_device_commit_matches_host(ck):
    rng = random.Random(11)
    r = ck.ctx.curve.fr.modulus
    poly = _rand_poly(rng, r, 15)
    host = ipa.commit(ck, poly)
    dev = ipa.commit(ck, poly, device=True)
    assert ipa._pt_eq(host, dev)
