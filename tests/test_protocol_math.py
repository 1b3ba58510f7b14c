"""Protocol-math functional-equation tests.

Mirrors the reference's dedicated protocol tests that the e2e suite only
covers implicitly:

* z1 checked against the permutation identity at EVERY root
  (``permutation/mod.rs:328-392``),
* z2 against the Plookup accumulator equation at every root
  (``lookup/mod.rs:101-164``),
* K1/K2 coset validity for the maximal two-adic domain
  (``permutation/constants.rs:36-50``),
* blinding preserves evaluations on the domain (``prove.rs:498-526``).

The z rounds run through the PROVER'S jitted device program (not a
reimplementation), then the identities are re-checked with independent
host bigint math.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from zkt_plonk_tpu.cs.composer import K1, K2
from zkt_plonk_tpu.cs.lookup import combine_split
from zkt_plonk_tpu.fields import BN254_FR, BLS12_377_FR, BLS12_381_FR
from zkt_plonk_tpu.fields.limbs import ints_to_array
from zkt_plonk_tpu.proof_system.prover import _blinders, _enc_vec


@pytest.fixture(scope="module")
def tiny():
    prover, args, _ = ge._build_tiny_prover()
    return prover, args


def _decode(prover, arr):
    return prover.spec.decode(np.asarray(arr))


def _poly_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def test_z1_z2_functional_equations(tiny):
    """Run the prover's z_round and re-check both grand-product
    identities at every root with host bigint math."""
    prover, args = tiny
    n, p = prover.n, prover.p
    spec = prover.spec
    rng = random.Random(7)

    # fixed challenges
    beta, gamma, delta, epsilon = (rng.randrange(2, p) for _ in range(4))
    eps_1pd = epsilon * (1 + delta) % p
    z_scalars = _enc_vec(
        spec,
        [beta, beta * K1 % p, beta * K2 % p, gamma, delta, eps_1pd,
         (1 + delta) % p, epsilon],
    )
    zero_blinders = _blinders(spec, random.Random(0), p, [0, 0])

    z_polys = prover._z_round(
        prover._plan, prover._tables, args["wires"], args["f"],
        args["t_evals"], args["h1"], args["h2"], z_scalars, zero_blinders,
    )  # (2, n+4, L) coefficient form, unblinded (zero blinders)

    roots = _decode(prover, prover._tables["roots"])
    a = _decode(prover, args["wires"][0])
    b = _decode(prover, args["wires"][1])
    c = _decode(prover, args["wires"][2])
    f = _decode(prover, args["f"])
    t = _decode(prover, args["t_evals"])
    h1 = _decode(prover, args["h1"])
    h2 = _decode(prover, args["h2"])
    s1, s2, s3 = (_decode(prover, prover._tables["sigma"][i]) for i in range(3))
    z1_coeffs = _decode(prover, z_polys[0])
    z2_coeffs = _decode(prover, z_polys[1])

    z1 = [_poly_eval(z1_coeffs, x, p) for x in roots]
    z2 = [_poly_eval(z2_coeffs, x, p) for x in roots]

    assert z1[0] == 1 and z2[0] == 1

    for i in range(n):
        j = (i + 1) % n
        x = roots[i]
        # permutation identity (permutation/mod.rs:328-392):
        # z1(wx) * prod (w_k + beta*sigma_k + gamma) =
        # z1(x)  * prod (w_k + beta*K_k*x + gamma)
        num = (
            (a[i] + beta * x + gamma)
            * (b[i] + beta * K1 * x + gamma)
            * (c[i] + beta * K2 * x + gamma)
        ) % p
        den = (
            (a[i] + beta * s1[i] + gamma)
            * (b[i] + beta * s2[i] + gamma)
            * (c[i] + beta * s3[i] + gamma)
        ) % p
        assert z1[j] * den % p == z1[i] * num % p, f"z1 identity fails at {i}"

        # Plookup identity (lookup/mod.rs:101-164):
        # z2(wx) * (eps(1+d) + h1 + d*h2) * (eps(1+d) + h2 + d*h1(wx)) =
        # z2(x) * (1+d) * (eps + f) * (eps(1+d) + t + d*t(wx))
        lhs = (
            z2[j]
            * ((eps_1pd + h1[i] + delta * h2[i]) % p)
            * ((eps_1pd + h2[i] + delta * h1[j]) % p)
        ) % p
        rhs = (
            z2[i]
            * ((1 + delta) % p)
            * ((epsilon + f[i]) % p)
            * ((eps_1pd + t[i] + delta * t[j]) % p)
        ) % p
        assert lhs == rhs, f"z2 identity fails at {i}"


@pytest.mark.parametrize("params", [BN254_FR, BLS12_377_FR, BLS12_381_FR])
def test_k1_k2_coset_validity(params):
    """K1, K2 generate distinct cosets of the MAXIMAL two-adic subgroup
    (``permutation/constants.rs:36-50``): k^(2^adicity) != 1 and
    (K2/K1)^(2^adicity) != 1."""
    p = params.modulus
    n = 1 << params.two_adicity
    assert pow(K1, n, p) != 1
    assert pow(K2, n, p) != 1
    assert pow(K2 * pow(K1, -1, p) % p, n, p) != 1


def test_blinders_preserve_evaluations(tiny):
    """Wraparound blinding adds b(X)*(X^n - 1): evaluations at every root
    are unchanged (``prove.rs:498-526``)."""
    prover, args = tiny
    n, p = prover.n, prover.p
    spec = prover.spec
    rng = random.Random(9)

    evals_int = [rng.randrange(p) for _ in range(n)]
    evals = jnp.asarray(ints_to_array(evals_int, spec.n_limbs))[None]
    blinders = _blinders(spec, rng, p, [3])
    polys = prover._commit_batch(prover._plan, evals, blinders)  # (1, n+4, L)
    coeffs = _decode(prover, polys[0])
    # blinders actually landed (degree > n-1)
    assert any(c != 0 for c in coeffs[n:])
    roots = _decode(prover, prover._tables["roots"])
    for i, x in enumerate(roots):
        assert _poly_eval(coeffs, x, p) == evals_int[i], f"eval changed at {i}"
