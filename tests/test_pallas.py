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
