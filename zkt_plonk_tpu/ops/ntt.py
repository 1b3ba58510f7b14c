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


def _butterfly_stages(spec: FieldSpec, x: jnp.ndarray, twiddles: List) -> jnp.ndarray:
    *batch, n, L = x.shape
    for s, w in enumerate(twiddles):
        m = 2 << s
        half = m >> 1
        xr = x.reshape(*batch, n // m, m, L)
        lo = xr[..., :half, :]
        hi = xr[..., half:, :]
        t = fd.mul(spec, hi, jnp.asarray(w, jnp.uint32))
        x = jnp.concatenate([fd.add(spec, lo, t), fd.sub(spec, lo, t)], axis=-2)
        x = x.reshape(*batch, n, L)
    return x


def fft(domain: Domain, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations at [1, w, w^2, ...] (natural order)."""
    spec = domain.spec
    x = jnp.take(coeffs, jnp.asarray(domain.bit_reversal_perm()), axis=-2)
    return _butterfly_stages(spec, x, domain.stage_twiddles(inverse=False))


def ifft(domain: Domain, evals: jnp.ndarray) -> jnp.ndarray:
    """Evaluations -> coefficients."""
    spec = domain.spec
    x = jnp.take(evals, jnp.asarray(domain.bit_reversal_perm()), axis=-2)
    x = _butterfly_stages(spec, x, domain.stage_twiddles(inverse=True))
    n_inv = jnp.asarray(
        domain.spec.encode([domain.size_inv])[0], jnp.uint32
    )
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
