"""NTT/iNTT/coset-NTT vs naive Python-int evaluation.

Covers the role of ark-poly's FFT in the reference
(``plonk-core/src/util.rs:63-140``).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.ops import ntt
from zkt_plonk_tpu.utils.domain import make_domain


def naive_eval(coeffs, points, p):
    out = []
    for x in points:
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % p
        out.append(acc)
    return out


@pytest.mark.parametrize("n", [8, 64])
def test_fft_ifft_roundtrip_and_values(n):
    rng = random.Random(7)
    dom = make_domain(BN254_FR, n)
    p = dom.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    C = jnp.asarray(dom.spec.encode(coeffs))

    evals = jax.jit(lambda pl, c: ntt.fft(dom.spec, pl, c))(dom.plan(), C)
    got = dom.spec.decode(np.asarray(evals))
    assert got == naive_eval(coeffs, dom.elements(), p)

    back = jax.jit(lambda pl, e: ntt.ifft(dom.spec, pl, e))(dom.plan(), evals)
    assert dom.spec.decode(np.asarray(back)) == coeffs


def test_coset_fft():
    rng = random.Random(8)
    n = 16
    dom = make_domain(BN254_FR, n)
    p = dom.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    C = jnp.asarray(dom.spec.encode(coeffs))

    evals = jax.jit(lambda pl, c: ntt.coset_fft(dom.spec, pl, c))(dom.plan(), C)
    g = dom.coset_gen
    pts = [g * w % p for w in dom.elements()]
    assert dom.spec.decode(np.asarray(evals)) == naive_eval(coeffs, pts, p)

    back = jax.jit(lambda pl, e: ntt.coset_ifft(dom.spec, pl, e))(dom.plan(), evals)
    assert dom.spec.decode(np.asarray(back)) == coeffs


def test_batched_fft():
    rng = random.Random(9)
    n = 16
    dom = make_domain(BN254_FR, n)
    p = dom.modulus
    polys = [[rng.randrange(p) for _ in range(n)] for _ in range(3)]
    C = jnp.stack([jnp.asarray(dom.spec.encode(c)) for c in polys])
    evals = jax.jit(lambda pl, c: ntt.fft(dom.spec, pl, c))(dom.plan(), C)
    for k in range(3):
        assert dom.spec.decode(np.asarray(evals[k])) == naive_eval(polys[k], dom.elements(), p)


def test_evaluate_poly_horner():
    rng = random.Random(10)
    n = 32
    dom = make_domain(BN254_FR, n)
    p = dom.modulus
    coeffs = [rng.randrange(p) for _ in range(n)]
    x = rng.randrange(p)
    C = jnp.asarray(dom.spec.encode(coeffs))
    X = jnp.asarray(dom.spec.encode_scalar(x))
    got = dom.spec.decode_scalar(
        np.asarray(jax.jit(lambda c, pt: ntt.evaluate_poly(dom.spec, c, pt))(C, X))
    )
    assert got == naive_eval(coeffs, [x], p)[0]
