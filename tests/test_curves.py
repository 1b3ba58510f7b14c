"""Host curve + pairing tests over the full reference curve matrix
(Bn254 / Bls12-381 / Bls12-377 — ``plonk-core/src/plonk.rs:220-254``)."""

import random

import pytest

from zkt_plonk_tpu.curves import make_context, curve_host as ch, pairing


@pytest.mark.parametrize("name", ["bn254", "bls12_381", "bls12_377"])
def test_generators_on_curve(name):
    ctx = make_context(name)
    assert ch.is_on_curve(ctx.g1, ctx.b)
    assert ch.is_on_curve(ctx.g2, ctx.b2)


@pytest.mark.parametrize("name", ["bn254", "bls12_381", "bls12_377"])
def test_group_order(name):
    ctx = make_context(name)
    r = ctx.curve.fr.modulus
    assert ch.scalar_mul(ctx.g1, r) is None
    assert ch.scalar_mul(ctx.g2, r) is None


def test_group_law():
    ctx = make_context("bn254")
    g = ctx.g1
    # 2G + 3G == 5G
    assert ch.add(ch.scalar_mul(g, 2), ch.scalar_mul(g, 3)) == ch.scalar_mul(g, 5)
    # G + (-G) == 0
    assert ch.add(g, ch.neg(g)) is None
    assert ch.add(g, None) == g


@pytest.mark.parametrize("name", ["bn254", "bls12_381", "bls12_377"])
def test_pairing_bilinearity(name):
    ctx = make_context(name)
    rng = random.Random(11)
    a = rng.randrange(1, 2**30)
    b = rng.randrange(1, 2**30)

    e_ab = pairing.pairing(ctx, ch.scalar_mul(ctx.g1, a), ch.scalar_mul(ctx.g2, b))
    e_base = pairing.pairing(ctx, ctx.g1, ctx.g2)
    assert not e_base.is_one()
    assert e_ab == e_base.pow(a * b)


@pytest.mark.parametrize("name", ["bn254", "bls12_381", "bls12_377"])
def test_pairing_product_check(name):
    # e(aG1, G2) * e(-G1, aG2) == 1
    ctx = make_context(name)
    a = 987654321
    p1 = ch.scalar_mul(ctx.g1, a)
    q1 = ctx.g2
    p2 = ch.neg(ctx.g1)
    q2 = ch.scalar_mul(ctx.g2, a)
    assert pairing.pairing_product_is_one(ctx, [(p1, q1), (p2, q2)])
