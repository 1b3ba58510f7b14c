"""KZG commit/open/check end-to-end (small degrees, deterministic tau)."""

import random

import numpy as np
import jax
import jax.numpy as jnp

from zkt_plonk_tpu.curves import make_context
from zkt_plonk_tpu.commitment import kzg
from zkt_plonk_tpu.fields import device as fd
from zkt_plonk_tpu.fields.limbs import ints_to_array


def test_kzg_commit_open_check():
    ctx = make_context("bn254")
    r = ctx.curve.fr.modulus
    rng = random.Random(42)
    ck, cvk = kzg.setup(ctx, max_degree=16, tau=123456789, rng=rng)

    n = 8
    polys = [[rng.randrange(r) for _ in range(n)] for _ in range(3)]
    fr_spec = ctx.fr_spec

    commits = []
    for coeffs in polys:
        C = kzg.commit_device(ck, jnp.asarray(ints_to_array(coeffs, fr_spec.n_limbs)), c=4)
        commits.append(kzg.commitment_to_host(ck, C))

    xi = rng.randrange(1, r)
    eta = rng.randrange(1, r)

    # fold polys with eta on host (small) and divide on device
    folded = [0] * n
    power = 1
    for coeffs in polys:
        for i, cf in enumerate(coeffs):
            folded[i] = (folded[i] + power * cf) % r
        power = power * eta % r

    values = [sum(cf * pow(xi, j, r) for j, cf in enumerate(coeffs)) % r for coeffs in polys]

    xi_powers = [pow(xi, j, r) for j in range(n)]
    xi_inv = pow(xi, -1, r)
    xi_inv_powers = [pow(xi_inv, j + 1, r) for j in range(n)]

    F = jnp.asarray(ints_to_array(folded, fr_spec.n_limbs))
    XP = jnp.asarray(ints_to_array(xi_powers, fr_spec.n_limbs))
    XIP = jnp.asarray(ints_to_array(xi_inv_powers, fr_spec.n_limbs))
    q = jax.jit(lambda f, xp, xip: kzg.divide_by_linear(fr_spec, f, xp, xip))(F, XP, XIP)

    # sanity: q * (X - xi) + folded(xi) == folded
    q_ints = fr_spec.decode(np.asarray(q))
    v_fold = sum(cf * pow(xi, j, r) for j, cf in enumerate(folded)) % r
    recon = [0] * n
    for i, qi in enumerate(q_ints[:-1]):
        recon[i + 1] = (recon[i + 1] + qi) % r
        recon[i] = (recon[i] - qi * xi) % r
    recon[0] = (recon[0] + v_fold) % r
    assert recon == folded

    W = kzg.commitment_to_host(ck, kzg.commit_device(ck, q, c=4))

    assert kzg.check(cvk, commits, xi, values, W, eta)
    # wrong value must fail
    bad = list(values)
    bad[0] = (bad[0] + 1) % r
    assert not kzg.check(cvk, commits, xi, bad, W, eta)
