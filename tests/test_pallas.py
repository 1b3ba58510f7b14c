"""Parity tests for the pallas field kernels (interpret mode on CPU).

The kernels in ``fields/pallas.py`` are the TPU fast path for
``fields/device.py``'s mul/add/sub; on CPU they only run here, in
interpret mode, checked limb-for-limb against python ints.
"""

import random

import numpy as np
import pytest

from zkt_plonk_tpu.fields import BN254_FR, BLS12_381_FR, make_spec
from zkt_plonk_tpu.fields import pallas as fp
from zkt_plonk_tpu.fields.limbs import ints_to_array, array_to_ints

import jax.numpy as jnp


@pytest.mark.parametrize("params", [BN254_FR, BLS12_381_FR], ids=lambda p: p.name)
@pytest.mark.parametrize("op", ["mul", "add", "sub"])
def test_pallas_kernel_matches_ints(params, op):
    spec = make_spec(params)
    p = spec.modulus
    rng = random.Random(1234)
    n = fp.BLOCK  # one block
    edge = [0, 1, p - 1, p - 2, (p - 1) // 2]
    a_i = edge + [rng.randrange(p) for _ in range(n - len(edge))]
    b_i = list(reversed(edge)) + [rng.randrange(p) for _ in range(n - len(edge))]
    A = jnp.asarray(ints_to_array(a_i, spec.n_limbs))
    B = jnp.asarray(ints_to_array(b_i, spec.n_limbs))

    out = fp.binary_op(spec, op, A, B, interpret=True)
    got = array_to_ints(np.asarray(out))
    pyop = {
        "mul": lambda x, y: x * y % p,
        "add": lambda x, y: (x + y) % p,
        "sub": lambda x, y: (x - y) % p,
    }[op]
    want = [pyop(x, y) for x, y in zip(a_i, b_i)]
    assert got == want


@pytest.mark.parametrize("params", [BN254_FR, BLS12_381_FR], ids=lambda p: p.name)
def test_pallas_mul_adversarial(params):
    """Stress the truncated-Barrett floor-error budget (q-3 <= qhat <= q).

    Products engineered to land just above multiples of p (fractional part
    of t/p near 0/1 maximizes the chance a floor-error shows), extreme limb
    patterns, and power-of-two structure.
    """
    spec = make_spec(params)
    p = spec.modulus
    rng = random.Random(99)
    pairs = []
    # a*b == target mod p for targets at the reduction boundaries
    for tgt in [0, 1, 2, 3, p - 1, p - 2, p - 3]:
        for _ in range(32):
            a = rng.randrange(1, p)
            b = tgt * pow(a, -1, p) % p
            pairs.append((a, b))
    # extreme operands / limb patterns
    fixtures = [0, 1, 2, p - 1, p - 2, (p - 1) // 2, (p + 1) // 2]
    fixtures += [((1 << k) - 1) % p for k in range(16, 16 * spec.n_limbs + 1, 16)]
    fixtures += [(1 << k) % p for k in range(15, 16 * spec.n_limbs, 16)]
    for x in fixtures:
        for y in fixtures:
            pairs.append((x, y))
    while len(pairs) % fp.BLOCK:
        pairs.append((rng.randrange(p), rng.randrange(p)))

    a_i = [x for x, _ in pairs]
    b_i = [y for _, y in pairs]
    A = jnp.asarray(ints_to_array(a_i, spec.n_limbs))
    B = jnp.asarray(ints_to_array(b_i, spec.n_limbs))
    out = fp.binary_op(spec, "mul", A, B, interpret=True)
    got = array_to_ints(np.asarray(out))
    want = [x * y % p for x, y in zip(a_i, b_i)]
    assert got == want


def test_pallas_padding_and_batch_dims():
    """Non-multiple-of-block sizes and leading batch axes round-trip."""
    spec = make_spec(BN254_FR)
    p = spec.modulus
    rng = random.Random(7)
    n = fp.BLOCK + 37
    a_i = [rng.randrange(p) for _ in range(2 * n)]
    b_i = [rng.randrange(p) for _ in range(2 * n)]
    A = jnp.asarray(ints_to_array(a_i, spec.n_limbs)).reshape(2, n, spec.n_limbs)
    B = jnp.asarray(ints_to_array(b_i, spec.n_limbs)).reshape(2, n, spec.n_limbs)
    out = fp.binary_op(spec, "mul", A, B, interpret=True)
    assert out.shape == (2, n, spec.n_limbs)
    got = array_to_ints(np.asarray(out))
    want = [x * y % p for x, y in zip(a_i, b_i)]
    assert got == want


def test_dispatch_disabled_on_cpu():
    """On the CPU test backend fd.mul must stay on the jnp path."""
    assert not fp.use_pallas()


def test_mul2_fused_pair_matches_ints():
    """(a*b + c*d) mod p via the shared-reduction primitive."""
    spec = make_spec(BN254_FR)
    p = spec.modulus
    L = spec.n_limbs
    rng = random.Random(99)
    n = 128
    mk = lambda seed_edge: [seed_edge] + [rng.randrange(p) for _ in range(n - 1)]
    a_i, b_i = mk(p - 1), mk(p - 1)
    c_i, d_i = mk(p - 1), mk(p - 1)
    lm = lambda v: jnp.asarray(ints_to_array(v, L)).T  # (L, n) limb-major
    p_arr = jnp.asarray(np.asarray(spec.modulus_limbs, np.uint32)[:, None])
    fold = fp.fold_const(spec)
    out = fp._mul2_lm(lm(a_i), lm(b_i), lm(c_i), lm(d_i), p_arr, fold, L)
    got = array_to_ints(np.asarray(out).T)
    want = [(a * b + c * d) % p for a, b, c, d in zip(a_i, b_i, c_i, d_i)]
    assert got == want


@pytest.mark.parametrize("v", [1, 3, 9, 12, 15])
def test_small_mul_matches_ints(v):
    spec = make_spec(BN254_FR)
    p = spec.modulus
    L = spec.n_limbs
    rng = random.Random(7)
    vals = [0, 1, p - 1, (p - 1) // 3] + [rng.randrange(p) for _ in range(60)]
    lm = jnp.asarray(ints_to_array(vals, L)).T
    p_arr = jnp.asarray(np.asarray(spec.modulus_limbs, np.uint32)[:, None])
    fold = fp.fold_const(spec)
    out = fp._small_mul_lm(lm, v, p_arr, fold, L)
    got = array_to_ints(np.asarray(out).T)
    assert got == [x * v % p for x in vals]
