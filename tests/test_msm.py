"""Device EC ops + MSM vs host ground truth."""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkt_plonk_tpu.curves import make_context, curve_host as ch
from zkt_plonk_tpu.ops import ec, msm


@pytest.fixture(scope="module")
def bn254():
    return make_context("bn254")


def rand_points(ctx, k, rng):
    return [ch.scalar_mul(ctx.g1, rng.randrange(1, ctx.curve.fr.modulus)) for _ in range(k)]


def test_ec_add_matches_host(bn254):
    ctx = bn254
    rng = random.Random(20)
    spec = ctx.fq_spec
    b3 = ec.b3_const(spec, ctx.curve.b)
    pts_a = rand_points(ctx, 4, rng) + [None, ctx.g1, None]
    pts_b = rand_points(ctx, 4, rng) + [ctx.g1, ctx.g1, None]
    # include P + (-P)
    pts_a.append(ctx.g1)
    pts_b.append(ch.neg(ctx.g1))

    A = jnp.asarray(ec.from_affine_host(spec, pts_a))
    B = jnp.asarray(ec.from_affine_host(spec, pts_b))
    C = jax.jit(lambda a, b: ec.add(spec, b3, a, b))(A, B)
    got = ec.to_affine_host(spec, np.asarray(C))
    expect = [ch.add(p, q) for p, q in zip(pts_a, pts_b)]
    got_i = [g if g is None else (int(g[0]), int(g[1])) for g in got]
    exp_i = [e if e is None else (int(e[0]), int(e[1])) for e in expect]
    assert got_i == exp_i


@pytest.mark.parametrize("n", [8, 33])
def test_msm_matches_host(bn254, n):
    ctx = bn254
    rng = random.Random(21)
    spec = ctx.fq_spec
    fr = ctx.curve.fr
    b3 = ec.b3_const(spec, ctx.curve.b)

    pts = rand_points(ctx, n, rng)
    scalars = [rng.randrange(fr.modulus) for _ in range(n - 2)] + [0, 1]

    P = jnp.asarray(ec.from_affine_host(spec, pts))
    S = jnp.asarray(ctx.fr_spec.encode(scalars))
    R = jax.jit(
        lambda p, s: msm.msm(spec, b3, p, s, fr.modulus.bit_length(), c=4)
    )(P, S)
    got = ec.to_affine_host(spec, np.asarray(R))[0]
    expect = ch.msm(pts, scalars)
    if expect is None:
        assert got is None
    else:
        assert (int(got[0]), int(got[1])) == (int(expect[0]), int(expect[1]))


def test_msm_totals_host_fold(bn254):
    """Device window totals + host Horner fold == full device MSM == host."""
    ctx = bn254
    rng = random.Random(23)
    spec = ctx.fq_spec
    fr = ctx.curve.fr
    b3 = ec.b3_const(spec, ctx.curve.b)
    n = 40

    pts = rand_points(ctx, n, rng)
    scalars = [rng.randrange(fr.modulus) for _ in range(n)]
    P = jnp.asarray(ec.from_affine_host(spec, pts))
    S = jnp.asarray(ctx.fr_spec.encode(scalars))

    totals = jax.jit(
        lambda p, s: msm.msm_totals(spec, b3, p, s, fr.modulus.bit_length(), c=4)
    )(P, S)
    got = msm.fold_windows_host(spec, ctx.Fq, np.asarray(totals), 4)
    expect = ch.msm(pts, scalars)
    assert got == (int(expect[0]), int(expect[1]))


def test_fixed_base_msm(bn254):
    ctx = bn254
    rng = random.Random(22)
    spec = ctx.fq_spec
    fr = ctx.curve.fr
    b3 = ec.b3_const(spec, ctx.curve.b)

    tables = jnp.asarray(msm.fixed_base_tables(ctx, ctx.g1, c=8))
    scalars = [0, 1, 2, rng.randrange(fr.modulus), fr.modulus - 1]
    S = jnp.asarray(ctx.fr_spec.encode(scalars))
    R = jax.jit(
        lambda s: msm.fixed_base_msm(spec, b3, tables, s, fr.modulus.bit_length(), c=8)
    )(S)
    got = ec.to_affine_host(spec, np.asarray(R))
    for g, k in zip(got, scalars):
        e = ch.scalar_mul(ctx.g1, k)
        if e is None:
            assert g is None
        else:
            assert (int(g[0]), int(g[1])) == (int(e[0]), int(e[1]))


def test_signed_window_digits_reconstruct(bn254):
    """Signed recode must satisfy sum_w (+-mag_w) * 2^(c*w) == scalar."""
    import jax.numpy as jnp
    from zkt_plonk_tpu.fields.limbs import ints_to_array

    ctx = bn254
    fr = ctx.curve.fr.modulus
    fr_bits = fr.bit_length()
    import random as _r

    rng = _r.Random(5)
    scalars = [0, 1, fr - 1, fr // 2] + [rng.randrange(fr) for _ in range(32)]
    sc = jnp.asarray(ints_to_array(scalars, ctx.fr_spec.n_limbs))
    for c in (5, 6, 7, 8):
        mags, negs = msm.signed_window_digits(sc, c, fr_bits)
        m = np.asarray(mags).astype(np.int64)
        s = np.asarray(negs)
        half = 1 << (c - 1)
        assert m.max() <= half
        digits = np.where(s, -m, m)
        recon = [
            int(sum(int(digits[w, i]) << (c * w) for w in range(digits.shape[0])))
            for i in range(len(scalars))
        ]
        assert recon == scalars, f"c={c}"
