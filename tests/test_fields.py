"""Field arithmetic tests: device limb ops vs Python-int ground truth.

Mirrors the role of arkworks' internally-tested ``ark-ff`` (reference relies
on it untested in-tree); exhaustive randomized cross-checks here.
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zkt_plonk_tpu.fields import (
    BN254_FQ,
    BN254_FR,
    BLS12_381_FQ,
    BLS12_381_FR,
    BLS12_377_FR,
    make_spec,
    array_to_ints,
    ints_to_array,
)
from zkt_plonk_tpu.fields import device as fd

PARAMS = [BN254_FR, BN254_FQ, BLS12_381_FR, BLS12_381_FQ]


def rand_elems(p, n, rng):
    special = [0, 1, 2, p - 1, p - 2, (p - 1) // 2]
    vals = special + [rng.randrange(p) for _ in range(n - len(special))]
    return vals[:n]


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_mont_roundtrip(params):
    rng = random.Random(0)
    spec = make_spec(params)
    vals = rand_elems(params.modulus, 32, rng)
    enc = spec.encode(vals)
    assert spec.decode(enc) == vals


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_add_sub_neg(params):
    rng = random.Random(1)
    p = params.modulus
    spec = make_spec(params)
    a = rand_elems(p, 64, rng)
    b = list(reversed(rand_elems(p, 64, rng)))
    A, B = jnp.asarray(spec.encode(a)), jnp.asarray(spec.encode(b))

    add_ = jax.jit(lambda x, y: fd.add(spec, x, y))
    sub_ = jax.jit(lambda x, y: fd.sub(spec, x, y))
    neg_ = jax.jit(lambda x: fd.neg(spec, x))
    assert spec.decode(np.asarray(add_(A, B))) == [(x + y) % p for x, y in zip(a, b)]
    assert spec.decode(np.asarray(sub_(A, B))) == [(x - y) % p for x, y in zip(a, b)]
    assert spec.decode(np.asarray(neg_(A))) == [(-x) % p for x in a]


@pytest.mark.parametrize("params", PARAMS, ids=lambda p: p.name)
def test_mul(params):
    rng = random.Random(2)
    p = params.modulus
    spec = make_spec(params)
    a = rand_elems(p, 64, rng)
    b = list(reversed(rand_elems(p, 64, rng)))
    A, B = jnp.asarray(spec.encode(a)), jnp.asarray(spec.encode(b))
    got = spec.decode(np.asarray(jax.jit(lambda x, y: fd.mul(spec, x, y))(A, B)))
    assert got == [x * y % p for x, y in zip(a, b)]


@pytest.mark.parametrize("params", [BN254_FR, BLS12_381_FR], ids=lambda p: p.name)
def test_pow_inv(params):
    rng = random.Random(3)
    p = params.modulus
    spec = make_spec(params)
    a = rand_elems(p, 8, rng)
    A = jnp.asarray(spec.encode(a))

    e = 12345
    got = spec.decode(np.asarray(jax.jit(lambda x: fd.pow_const(spec, x, e))(A)))
    assert got == [pow(x, e, p) for x in a]

    got_inv = spec.decode(np.asarray(jax.jit(lambda x: fd.inv(spec, x))(A)))
    expect = [0 if x == 0 else pow(x, -1, p) for x in a]
    assert got_inv == expect


@pytest.mark.parametrize("params", [BN254_FR], ids=lambda p: p.name)
def test_batch_inverse(params):
    rng = random.Random(4)
    p = params.modulus
    spec = make_spec(params)
    a = rand_elems(p, 33, rng)  # includes zeros
    A = jnp.asarray(spec.encode(a))
    got = spec.decode(np.asarray(jax.jit(lambda x: fd.batch_inverse(spec, x, axis=0))(A)))
    assert got == [0 if x == 0 else pow(x, -1, p) for x in a]


@pytest.mark.parametrize("params", PARAMS + [BLS12_377_FR], ids=lambda p: p.name)
def test_root_of_unity(params):
    # sanity of generator/two-adicity constants
    p = params.modulus
    assert (p - 1) % (1 << params.two_adicity) == 0
    assert ((p - 1) >> params.two_adicity) % 2 == 1
    w = params.root_of_unity(params.two_adicity)
    assert pow(w, 1 << params.two_adicity, p) == 1
    assert pow(w, 1 << (params.two_adicity - 1), p) == p - 1

    if params.two_adicity >= 2:
        w4 = params.root_of_unity(2)
        assert pow(w4, 4, p) == 1 and pow(w4, 2, p) != 1


def test_prefix_products():
    spec = make_spec(BN254_FR)
    rng = random.Random(5)
    p = spec.modulus
    vals = rand_elems(p, 24, rng)[6:]  # no zeros
    A = jnp.asarray(spec.encode(vals))
    got = spec.decode(np.asarray(jax.jit(lambda x: fd.prefix_products(spec, x))(A)))
    exp, acc = [], 1
    for v in vals:
        acc = acc * v % p
        exp.append(acc)
    assert got == exp


def test_mul_adversarial():
    # worst cases for Barrett qhat error
    spec = make_spec(BN254_FR)
    p = spec.modulus
    vals = [p - 1, p - 2, 1, 2, (p - 1) // 2, p - 1, 0, p - 1]
    other = [p - 1, p - 1, p - 1, p - 2, 2, 1, p - 1, 0]
    A, B = jnp.asarray(spec.encode(vals)), jnp.asarray(spec.encode(other))
    got = spec.decode(np.asarray(jax.jit(lambda x, y: fd.mul(spec, x, y))(A, B)))
    assert got == [x * y % p for x, y in zip(vals, other)]
