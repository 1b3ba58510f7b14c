"""Parity tests for the fused pallas EC-add kernel (interpret mode on CPU).

``ops/ec_pallas.add`` must agree point-for-point with the composed
``ops/ec.add`` (itself validated against host curve arithmetic in
``tests/test_curves.py`` / ``tests/test_msm.py``) for ALL complete-add
cases: generic, doubling, inverse pairs and the identity.
"""

import random

import numpy as np
import jax.numpy as jnp

from zkt_plonk_tpu.curves import make_context
from zkt_plonk_tpu.curves import curve_host as ch
from zkt_plonk_tpu.ops import ec, ec_pallas


def _random_points(ctx, rng, k):
    pts = []
    g = ctx.g1
    acc = g
    for _ in range(k):
        acc = ch.scalar_mul(g, rng.randrange(1, ctx.curve.fr.modulus))
        pts.append(acc)
    return pts


def test_ec_pallas_add_matches_composed():
    ctx = make_context("bn254")
    spec = ctx.fq_spec
    b3 = ec.b3_const(spec, ctx.curve.b)
    rng = random.Random(99)

    n = ec_pallas.BLOCK + 13  # exercises lane padding too
    pa = _random_points(ctx, rng, n - 4)
    pb = _random_points(ctx, rng, n - 4)
    # complete-add edge cases: identity+P, P+identity, P+P, P+(-P)
    pa = [None, pb[0], pa[0], pa[1]] + pa
    pb = [pb[0], None, pa[0], (pa[1][0], -pa[1][1])] + pb

    A = jnp.asarray(ec.from_affine_host(spec, pa))
    B = jnp.asarray(ec.from_affine_host(spec, pb))

    got = ec_pallas.add(spec, b3, A, B, interpret=True)
    want = ec.add(spec, b3, A, B)  # jnp composed path (CPU)
    assert np.array_equal(np.asarray(got), np.asarray(want))

    # and against host ground truth in affine
    got_aff = ec.to_affine_host(spec, np.asarray(got))
    for x, y, g in zip(pa, pb, got_aff):
        expect = ch.add(
            None if x is None else (ctx.Fq(x[0]), ctx.Fq(x[1])),
            None if y is None else (ctx.Fq(y[0]), ctx.Fq(y[1])),
        )
        if expect is None:
            assert g is None
        else:
            assert g == (int(expect[0]), int(expect[1]))


def test_ec_pallas_broadcast():
    """(1, k) against (m, 1) broadcasting — the bucket-loop shape."""
    ctx = make_context("bn254")
    spec = ctx.fq_spec
    b3 = ec.b3_const(spec, ctx.curve.b)
    rng = random.Random(3)
    pa = _random_points(ctx, rng, 4)
    pb = _random_points(ctx, rng, 3)
    A = jnp.asarray(ec.from_affine_host(spec, pa)).reshape(4, 1, 3, spec.n_limbs)
    B = jnp.asarray(ec.from_affine_host(spec, pb)).reshape(1, 3, 3, spec.n_limbs)
    got = ec_pallas.add(spec, b3, A, B, interpret=True)
    want = ec.add(spec, b3, A, B)
    assert got.shape == (4, 3, 3, spec.n_limbs)
    assert np.array_equal(np.asarray(got), np.asarray(want))
