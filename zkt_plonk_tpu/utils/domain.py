"""Radix-2 evaluation domains (host-side metadata + twiddle tables).

Equivalent of ark-poly ``Radix2EvaluationDomain`` usage in the reference
(``plonk-core/src/util.rs:63-140``): sizes are powers of two, the group
generator follows the arkworks convention (``fields/params.py``), and the
coset offset is the field's multiplicative GENERATOR (like arkworks'
``coset_fft``).

The twiddle tables are precomputed host-side once per (field, size) and live
on device as Montgomery limb arrays consumed by ``ops/ntt.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List

import numpy as np

from ..fields.limbs import FieldSpec, make_spec, ints_to_array
from ..fields.params import FieldParams


@dataclass(frozen=True, eq=False)
class Domain:
    spec: FieldSpec
    size: int
    log_size: int
    group_gen: int  # omega, order == size
    group_gen_inv: int
    size_inv: int  # 1/n mod p
    coset_gen: int  # multiplicative generator g for coset FFTs
    coset_gen_inv: int

    @property
    def modulus(self) -> int:
        return self.spec.modulus

    def element(self, i: int) -> int:
        return pow(self.group_gen, i, self.modulus)

    def elements(self) -> List[int]:
        p = self.modulus
        out = [1]
        for _ in range(self.size - 1):
            out.append(out[-1] * self.group_gen % p)
        return out

    def evaluate_vanishing(self, x: int) -> int:
        """zh(x) = x^n - 1."""
        return (pow(x, self.size, self.modulus) - 1) % self.modulus

    # -- precomputed tables (limb arrays) ----------------------------------

    def plan(self):
        """Device-resident NTT tables as a pytree (see ``ops/ntt.NttPlan``).

        IMPORTANT: always pass the plan as an ARGUMENT to jitted programs —
        closed-over arrays become XLA constants, and constant operands in
        the limb outer-product multiply trigger catastrophic constant
        folding (minutes of compile, 1000x runtime).
        """
        key = (self.spec.params.name, self.log_size)
        cached = _plan_cache.get(key)
        if cached is not None:
            return cached
        from ..ops.ntt import MR_MIN_LOG, NttPlan

        # numpy leaves: safe to build anywhere (never traced), valid jit args
        half = max(1, self.size // 2)
        mr = None
        if self.log_size >= MR_MIN_LOG:
            from ..ops import ntt_mr

            mr = ntt_mr.build_plan_set(self)
        plan = NttPlan(
            bitrev=self.bit_reversal_perm(),
            tw=self.powers_array(self.group_gen, half),
            tw_inv=self.powers_array(self.group_gen_inv, half),
            n_inv=self.spec.encode([self.size_inv])[0],
            coset_pow=self.powers_array(self.coset_gen, self.size),
            coset_ipow=self.powers_array(self.coset_gen_inv, self.size),
            mr=mr,
        )
        _plan_cache[key] = plan
        return plan

    def plan_device(self):
        """Device-resident plan (device_put once, cached). Do NOT call while
        tracing."""
        key = (self.spec.params.name, self.log_size, "device")
        cached = _plan_cache.get(key)
        if cached is None:
            import jax

            cached = jax.device_put(self.plan())
            _plan_cache[key] = cached
        return cached

    def quarter_plan(self):
        """Tables for the INTERLEAVED 4n-coset transform (ops/ntt.coset4_*).

        The 4n coset g*H_4n splits into 4 interleaved n-subdomains
        {g * w4n^j * H_n} (j = 0..3, global index i = 4k + j), so a 4n
        coset FFT = 4 batched n-size NTTs with per-subdomain coset
        scalings — no 4n working set, and the prover's "next" (+4) taps
        become +1 rolls inside each subdomain.  Replaces the reference's
        monolithic 4n coset domain (``quotient_poly.rs:52-96``).
        """
        key = (self.spec.params.name, self.log_size, "q4")
        cached = _plan_cache.get(key)
        if cached is not None:
            return cached
        from ..ops.ntt import Coset4Plan

        p, n = self.modulus, self.size
        w4n = self.spec.params.root_of_unity(self.log_size + 2)
        g = self.coset_gen
        i4 = pow(w4n, n, p)  # primitive 4th root of unity
        gj = [g * pow(w4n, j, p) % p for j in range(4)]
        L = self.spec.n_limbs
        pow4 = np.stack([self.powers_array(x, n) for x in gj])
        ipow4 = np.stack([self.powers_array(pow(x, -1, p), n) for x in gj])
        gn4 = ints_to_array([pow(x, n, p) for x in gj], L)
        inv4 = pow(4, -1, p)
        i4_inv = pow(i4, -1, p)
        g_inv_n = pow(g, -n, p)
        mix_vals = [
            pow(i4_inv, j * t, p) * pow(g_inv_n, t, p) % p * inv4 % p
            for t in range(4)
            for j in range(4)
        ]
        mix = ints_to_array(mix_vals, L).reshape(4, 4, L)
        plan = Coset4Plan(pow4=pow4, ipow4=ipow4, gn4=gn4, mix=mix)
        _plan_cache[key] = plan
        return plan

    def quarter_plan_device(self):
        key = (self.spec.params.name, self.log_size, "q4", "device")
        cached = _plan_cache.get(key)
        if cached is None:
            import jax

            cached = jax.device_put(self.quarter_plan())
            _plan_cache[key] = cached
        return cached

    def bit_reversal_perm(self) -> np.ndarray:
        return _bitrev_cached(self.log_size)

    def powers_array(self, base: int, count: int) -> np.ndarray:
        """Limb array of [1, base, base^2, ...] (cached)."""
        key = (self.spec.params.name, base, count)
        cached = _powers_cache.get(key)
        if cached is not None:
            return cached
        p = self.modulus
        vals = [1] * count
        for i in range(1, count):
            vals[i] = vals[i - 1] * base % p
        arr = ints_to_array(vals, self.spec.n_limbs)
        _powers_cache[key] = arr
        return arr


@lru_cache(maxsize=64)
def _bitrev_cached(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev.astype(np.int32)


_powers_cache = {}
_plan_cache = {}


@lru_cache(maxsize=None)
def make_domain(params: FieldParams, size: int) -> Domain:
    assert size >= 1 and (size & (size - 1)) == 0, "domain size must be a power of two"
    log_size = size.bit_length() - 1
    assert log_size <= params.two_adicity, "field lacks required two-adicity"
    p = params.modulus
    omega = params.root_of_unity(log_size)
    g = params.generator
    return Domain(
        spec=make_spec(params),
        size=size,
        log_size=log_size,
        group_gen=omega,
        group_gen_inv=pow(omega, -1, p) if size > 1 else 1,
        size_inv=pow(size, -1, p),
        coset_gen=g,
        coset_gen_inv=pow(g, -1, p),
    )
