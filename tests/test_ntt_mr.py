"""Mixed-radix multi-pass NTT (ops/ntt_mr.py) vs the reference jnp NTT.

The jnp column path validates the full index algebra + tables at real
sizes on CPU; the pallas kernel itself is checked in interpret mode.
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields.limbs import ints_to_array
from zkt_plonk_tpu.ops import ntt, ntt_mr
from zkt_plonk_tpu.utils.domain import make_domain

SPEC = make_spec(BN254_FR)
P = SPEC.modulus


def _rand(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(P) for _ in range(n)]


def _enc(vals):
    return jnp.asarray(ints_to_array(vals, SPEC.n_limbs))


def _ref_plan(dom):
    # reference plan WITHOUT the mr member (forces the old jnp path)
    return dom.plan()._replace(mr=None)


@pytest.mark.parametrize("logn", [12, 13])
@pytest.mark.parametrize("direction", ["fwd", "inv", "coset_fwd", "coset_inv"])
def test_mr_matches_reference_jnp(logn, direction):
    n = 1 << logn
    dom = make_domain(BN254_FR, n)
    x = _enc(_rand(n, seed=logn))
    ref_plan = _ref_plan(dom)
    mr_set = ntt_mr.build_plan_set(dom)

    ref_fn = {
        "fwd": ntt.fft,
        "inv": ntt.ifft,
        "coset_fwd": ntt.coset_fft,
        "coset_inv": ntt.coset_ifft,
    }[direction]
    mr_plan = getattr(mr_set, direction.replace("fwd", "fwd").replace("inv", "inv"))
    want = np.asarray(ref_fn(SPEC, ref_plan, x))
    got = np.asarray(ntt_mr.transform(SPEC, mr_plan, x, use_kernel=False))
    assert (got == want).all(), f"{direction} mismatch at 2^{logn}"


def test_mr_batch_dims():
    n = 1 << 12
    dom = make_domain(BN254_FR, n)
    vals = _rand(3 * n, seed=99)
    x = _enc(vals).reshape(3, n, SPEC.n_limbs)
    ref_plan = _ref_plan(dom)
    mr_set = ntt_mr.build_plan_set(dom)
    want = np.asarray(ntt.fft(SPEC, ref_plan, x))
    got = np.asarray(ntt_mr.transform(SPEC, mr_set.fwd, x, use_kernel=False))
    assert got.shape == want.shape
    assert (got == want).all()


def test_mr_roundtrip_large():
    """fft o ifft == id at a 3-pass size (2^17, D=3) — jnp path."""
    n = 1 << 17
    dom = make_domain(BN254_FR, n)
    x = _enc(_rand(n, seed=5))
    mr_set = ntt_mr.build_plan_set(dom)
    evals = ntt_mr.transform(SPEC, mr_set.fwd, x, use_kernel=False)
    back = np.asarray(ntt_mr.transform(SPEC, mr_set.inv, evals, use_kernel=False))
    assert (back == np.asarray(x)).all()


def test_mr_kernel_interpret_parity():
    """The pallas kernel (interpret mode) == the jnp column path."""
    n = 1 << 12
    dom = make_domain(BN254_FR, n)
    x = _enc(_rand(n, seed=7))
    mr_set = ntt_mr.build_plan_set(dom)
    for plan in (mr_set.fwd, mr_set.coset_inv):
        want = np.asarray(ntt_mr.transform(SPEC, plan, x, use_kernel=False))
        got = np.asarray(
            ntt_mr.transform(SPEC, plan, x, use_kernel=True, interpret=True)
        )
        assert (got == want).all()


def test_plan_dispatch_via_domain():
    """Domain.plan() carries mr plans at >= 2^12 and the public ntt API
    still takes the old path on CPU (use_pallas False)."""
    dom = make_domain(BN254_FR, 1 << 12)
    plan = dom.plan()
    assert plan.mr is not None
    small = make_domain(BN254_FR, 1 << 8).plan()
    assert small.mr is None
    x = _enc(_rand(1 << 12, seed=1))
    want = np.asarray(ntt.fft(SPEC, plan._replace(mr=None), x))
    got = np.asarray(ntt.fft(SPEC, plan, x))  # CPU: mr ignored
    assert (got == want).all()
