"""Radix-2 NTT / iNTT / coset-NTT over limb arrays — the core device primitive.

Replaces ark-poly's radix-2 FFT used everywhere in the reference
(``plonk-core/src/util.rs:63-140``).  Design notes (TPU-first):

* iterative DIT with per-stage dense butterflies: each stage is a reshape +
  one vectorized Montgomery multiply of half the array + add/sub — no
  data-dependent gathers except a single static bit-reversal permutation;
* static shapes and a Python loop over log2(n) stages → XLA sees a flat
  chain of fused elementwise stages it can tile over lanes;
* multi-chip: see ``parallel/ntt.py`` (domain-sharded stages with
  all_to_all transpose between local halves).

Layout: polynomials are ``uint32[..., n, L]`` Montgomery limb arrays; the
polynomial axis is -2.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from ..fields import device as fd
from ..fields.limbs import FieldSpec
from ..utils.domain import Domain


def _butterfly_stages(spec: FieldSpec, x: jnp.ndarray, tw_flat: jnp.ndarray) -> jnp.ndarray:
    """All log2(n) DIT butterfly stages under ONE fori_loop body.

    Stage structure is derived arithmetically from the index vector (partner
    = i XOR half, twiddle exponent = (i & (half-1)) * n/m), so a single
    compiled butterfly serves every stage — XLA compile time is O(1) in n,
    and the per-stage work is one gather + one mul + add/sub + select.

    ``tw_flat``: (n/2, L) powers [w^0 .. w^(n/2-1)] of the domain generator
    (or its inverse for the iNTT).
    """
    import jax

    *batch, n, L = x.shape
    if n == 1:
        return x
    log_n = n.bit_length() - 1
    i = jnp.arange(n, dtype=jnp.int32)

    def body(s, x):
        half = jnp.int32(1) << s
        partner = i ^ half
        is_u = (i & half) == 0
        j = i & (half - 1)
        tw_idx = j * (jnp.int32(n) >> (s + 1))
        tw = jnp.take(tw_flat, tw_idx, axis=0)  # (n, L)
        xp = jnp.take(x, partner, axis=-2)
        operand = jnp.where(is_u[:, None], xp, x)
        m1 = fd.mul(spec, tw, operand)
        return jnp.where(
            is_u[:, None], fd.add(spec, x, m1), fd.sub(spec, xp, m1)
        )

    return jax.lax.fori_loop(0, log_n, body, x)


def fft(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations at [1, w, w^2, ...] (natural order)."""
    spec = domain.spec
    x = jnp.take(coeffs, jnp.asarray(domain.bit_reversal_perm()), axis=-2)
    tw = jnp.asarray(domain.powers_array(domain.group_gen, max(1, domain.size // 2)))
    return _butterfly_stages(spec, x, tw)


def ifft(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    """Evaluations -> coefficients."""
    spec = domain.spec
    x = jnp.take(evals, jnp.asarray(domain.bit_reversal_perm()), axis=-2)
    tw = jnp.asarray(
        domain.powers_array(domain.group_gen_inv, max(1, domain.size // 2))
    )
    x = _butterfly_stages(spec, x, tw)
    n_inv = jnp.asarray(domain.spec.encode([domain.size_inv])[0], jnp.uint32)
    return fd.mul(spec, x, n_inv)


def _scale_by_powers(domain: Domain, x: jnp.ndarray, base: int) -> jnp.ndarray:
    powers = jnp.asarray(domain.powers_array(base, domain.size), jnp.uint32)
    return fd.mul(domain.spec, x, powers)


def coset_fft(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluations over the coset g*H (arkworks ``coset_fft`` semantics)."""
    return fft(domain, _scale_by_powers(domain, coeffs, domain.coset_gen))


def coset_ifft(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    return _scale_by_powers(domain, ifft(domain, evals), domain.coset_gen_inv)


def evaluate_poly(domain_spec: FieldSpec, coeffs: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial(s) at a single point via Horner (device).

    coeffs: (..., n, L); point: (L,). Returns (..., L).
    Used for the 11 openings at xi / omega*xi
    (reference ``linearization_poly.rs:55-75``).
    """
    import jax

    n = coeffs.shape[-2]

    def body(i, acc):
        c = jax.lax.dynamic_index_in_dim(coeffs, n - 1 - i, axis=-2, keepdims=False)
        return fd.add(domain_spec, fd.mul(domain_spec, acc, point), c)

    init = fd.zeros(domain_spec, coeffs.shape[:-2])
    return jax.lax.fori_loop(0, n, body, init)
