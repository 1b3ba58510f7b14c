"""Prover/verifier key structures (device-array-first).

Rebuild of ``plonk-core/src/proof_system/keys/mod.rs``: the ProverKey holds
coefficient-form polynomials, the ExtendedProverKey precomputed 4n coset
evaluation tables (so the quotient pass is one fused elementwise kernel),
and the VerifierKey the 10 commitments + PI roots.

TPU-first deltas vs the reference:
  * all PK/EPK polynomials live on device as stacked uint32 limb arrays;
  * the EPK stores the INVERSE of zh on the coset (division by the
    vanishing polynomial becomes a multiply — ``keys/mod.rs:114-116`` note);
  * q_lookup's n evaluations are kept host-side too (witness-side query
    vector f is built during synthesis, ``prove.rs:157-161``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

POLY_ORDER = [
    "q_m",
    "q_l",
    "q_r",
    "q_o",
    "q_c",
    "sigma1",
    "sigma2",
    "sigma3",
    "q_lookup",
    "q_table",
]


@dataclass(eq=False)
class ProverKey:
    """Coefficient-form selector/sigma/table polys: dict name -> (n, L)."""

    n: int
    polys: Dict[str, jnp.ndarray]

    def stacked(self, names) -> jnp.ndarray:
        return jnp.stack([self.polys[k] for k in names])


@dataclass(eq=False)
class ExtendedProverKey:
    """Precomputed 4n-coset tables (INTERLEAVED layout) + n-domain evals.

    Coset tables are (4, n, L): entry [j][k] = value at the coset point
    g*w4n^j*w_n^k (global 4n index 4k+j) — see ``ops/ntt.coset4_fft``.
    This keeps every device array n-sized on its poly axis (domain
    shardable with no resharding) and turns the prover's "next" (+4)
    coset taps into +1 rolls inside each subdomain.
    """

    n: int
    coset: Dict[str, jnp.ndarray]  # name -> (4, n, L) interleaved coset evals
    x_coset: jnp.ndarray  # (4, n, L)
    zh_coset_inv: jnp.ndarray  # (4, L) — zh on the coset depends only on j
    l1_coset: jnp.ndarray  # (4, n, L)
    sigma_evals: jnp.ndarray  # (3, n, L) evaluation-form sigmas
    roots: jnp.ndarray  # (n, L) domain elements
    q_lookup_evals_host: List[int]  # n ints (0/1)


@dataclass(eq=False)
class VerifierKey:
    """Host-side circuit description for the verifier + transcript seeding."""

    n: int
    pi_pos: List[int]
    commitments: Dict[str, Optional[Tuple[int, int]]]  # name -> affine/None
    domain_gen: int

    def pi_roots(self, p: int) -> List[int]:
        return [pow(self.domain_gen, i, p) for i in self.pi_pos]

    def seed_transcript(self, transcript):
        transcript.append_u64("circuit_size", self.n)
        for name in POLY_ORDER:
            transcript.append_commitment(f"{name}_commit", self.commitments[name])
