"""Circuit preprocessing: setup-mode CS -> (ProverKey, ExtendedProverKey,
VerifierKey).

Rebuild of ``plonk-core/src/proof_system/setup.rs:42-166``:
selector/sigma/table evaluation columns are batch-iNTT'd into coefficient
form, batch-committed (10 device MSMs), and optionally extended into 4n
coset tables.  Host work is limited to the sigma permutation walk and array
staging; NTTs and MSMs run on device.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..commitment import kzg
from ..commitment import scheme as scheme_mod
from ..cs.composer import SetupComposer, K1, K2
from ..cs.lookup import LookupTable
from ..fields import device as fd
from ..fields.limbs import ints_to_array
from ..ops import ntt
from ..utils.domain import Domain, make_domain
from .keys import POLY_ORDER, ExtendedProverKey, ProverKey, VerifierKey

MIN_CIRCUIT_SIZE = 8  # quotient split needs 3n+6 <= 4n


def setup(
    ck,  # kzg.CommitterKey | ipa.CommitterKeyIPA (scheme-dispatched)
    composer: SetupComposer,
    lookup_table: LookupTable,
    circuit_bound: int,
    extend: bool = True,
) -> Tuple[ProverKey, Optional[ExtendedProverKey], VerifierKey]:
    ctx = ck.ctx
    p = ctx.curve.fr.modulus
    n = max(circuit_bound, MIN_CIRCUIT_SIZE)
    domain = make_domain(ctx.curve.fr, n)
    spec = domain.spec

    composer.pad_to(n)

    # sigma permutation walk (host) — ``permutation/mod.rs:103-177``
    roots = domain.elements()
    sigma_evals = composer.perm.compute_all_sigma_evals(n, roots, p)

    q_table = lookup_table.masks(n)

    eval_columns = [
        composer.q_m,
        composer.q_l,
        composer.q_r,
        composer.q_o,
        composer.q_c,
        sigma_evals[0],
        sigma_evals[1],
        sigma_evals[2],
        composer.q_lookup,
        q_table,
    ]
    from ..ops import ntt_host

    if n <= ntt_host.HOST_NTT_MAX:
        # tiny circuits: host-int NTTs beat the device dispatch floor and
        # cost zero XLA compile time (dryrun / unit-test path)
        polys_arr = jnp.asarray(
            np.stack(
                [
                    ints_to_array(ntt_host.ifft_ints(col, domain.group_gen, p), spec.n_limbs)
                    for col in eval_columns
                ]
            )
        )
    else:
        evals_arr = jnp.asarray(
            np.stack([ints_to_array(col, spec.n_limbs) for col in eval_columns])
        )  # (10, n, L)
        polys_arr = jax.jit(lambda pl, e: ntt.ifft(spec, pl, e))(
            domain.plan(), evals_arr
        )

    # batch-commit the 10 polynomials (``setup.rs:104-121``); commit at
    # n+4 coefficients — the same padded shape the prover uses for witness
    # polynomials — so one compiled MSM serves the whole pipeline
    padded = jnp.pad(polys_arr, ((0, 0), (0, 4), (0, 0)))
    committer = scheme_mod.for_key(ck).committer(ck)
    commit_points = committer.commit_many(padded)
    commits = {name: commit_points[i] for i, name in enumerate(POLY_ORDER)}

    pk = ProverKey(n=n, polys={name: polys_arr[i] for i, name in enumerate(POLY_ORDER)})
    vk = VerifierKey(
        n=n,
        pi_pos=list(composer.pp),
        commitments=commits,
        domain_gen=domain.group_gen,
    )

    epk = extend_prover_key(ctx, domain, pk, sigma_evals, composer.q_lookup) if extend else None
    return pk, epk, vk




def extend_prover_key_from_pk(ck, pk: ProverKey) -> ExtendedProverKey:
    """Rebuild the EPK from PK polynomials by FFT — NO circuit re-synthesis.

    Mirrors the reference's on-demand extension when the serialized EPK is
    absent (``plonk-core/src/proof_system/prove.rs:88-102``): sigma and
    q_lookup evaluation columns are recovered by forward FFT of the PK
    coefficient polynomials, then fed to ``extend_prover_key``.
    """
    from ..fields.limbs import array_to_ints
    from ..ops import ntt_host

    ctx = ck.ctx
    p = ctx.curve.fr.modulus
    n = pk.n
    domain = make_domain(ctx.curve.fr, n)
    spec = domain.spec
    names = ["sigma1", "sigma2", "sigma3", "q_lookup"]
    if n <= ntt_host.HOST_NTT_MAX:
        evals = [
            ntt_host.fft_ints(
                array_to_ints(np.asarray(pk.polys[nm])), domain.group_gen, p
            )
            for nm in names
        ]
    else:
        out = jax.jit(lambda pl, c: ntt.fft(spec, pl, c))(
            domain.plan(), pk.stacked(names)
        )
        arr = np.asarray(out)
        evals = [array_to_ints(arr[i]) for i in range(4)]
    return extend_prover_key(ctx, domain, pk, evals[:3], evals[3])


def extend_prover_key(
    ctx, domain: Domain, pk: ProverKey, sigma_evals, q_lookup_evals
) -> ExtendedProverKey:
    """Interleaved 4n-coset tables + vanishing/lagrange precomputation
    (``keys/mod.rs:78-146``).

    All coset tables use the INTERLEAVED layout (4, n, L): entry [j][k]
    is the value at the 4n-coset point g*w4n^j*w_n^k (global index 4k+j)
    — see ``ops/ntt.coset4_fft``.  zh on the coset depends only on j, so
    its inverse shrinks to 4 scalars.
    """
    n = domain.size
    p = domain.modulus
    spec = domain.spec
    domain4 = make_domain(ctx.curve.fr, 4 * n)

    stacked = pk.stacked(POLY_ORDER)  # (10, n, L)

    # zh on the coset has only 4 distinct values: (g w4n^i)^n = g^n * i4^i
    g_n = pow(domain.coset_gen, n, p)
    i4 = pow(domain4.group_gen, n, p)  # primitive 4th root of unity
    zh_vals = [(g_n * pow(i4, j, p) - 1) % p for j in range(4)]
    zh_inv_vals = [pow(v, -1, p) for v in zh_vals]
    zh_coset_inv = ints_to_array(zh_inv_vals, spec.n_limbs)  # (4, L)

    roots_host = domain.elements()
    gj = [domain.coset_gen * pow(domain4.group_gen, j, p) % p for j in range(4)]
    x_coset_host = [[gjv * r % p for r in roots_host] for gjv in gj]
    x_coset = np.stack(
        [ints_to_array(row, spec.n_limbs) for row in x_coset_host]
    )  # (4, n, L)

    # L1 on the coset: zh(x) / (n (x - 1))
    l1_denoms = [n * (x - 1) % p for row in x_coset_host for x in row]
    from ..fields.host import batch_inverse_ints

    l1_inv = batch_inverse_ints(l1_denoms, p)
    l1_vals = [
        zh_vals[i // n] * l1_inv[i] % p for i in range(4 * n)
    ]
    l1_coset = ints_to_array(l1_vals, spec.n_limbs).reshape(4, n, spec.n_limbs)

    from ..ops import ntt_host

    if n <= ntt_host.HOST_NTT_MAX:
        # host-int interleaved coset tables (see ``ops/ntt_host``): entry
        # [i][j][k] = poly_i at g*w4n^j*w_n^k — same layout as coset4_fft
        from ..fields.limbs import array_to_ints

        coeff_ints = [array_to_ints(np.asarray(stacked[i])) for i in range(10)]
        rows = []
        for ci in coeff_ints:
            per_j = [
                ntt_host.coset_fft_ints(ci, gj_, domain.group_gen, p)
                for gj_ in gj
            ]
            rows.append(
                np.stack([ints_to_array(ev, spec.n_limbs) for ev in per_j])
            )
        coset_tables = jnp.asarray(np.stack(rows))  # (10, 4, n, L)
    else:

        @jax.jit
        def _cosets(plan, q4, polys):
            return ntt.coset4_fft(spec, plan, q4, polys)

        coset_tables = _cosets(domain.plan(), domain.quarter_plan(), stacked)
        # (10, 4, n, L)

    return ExtendedProverKey(
        n=n,
        coset={name: coset_tables[i] for i, name in enumerate(POLY_ORDER)},
        x_coset=jnp.asarray(x_coset),
        zh_coset_inv=jnp.asarray(zh_coset_inv),
        l1_coset=jnp.asarray(l1_coset),
        sigma_evals=jnp.asarray(
            np.stack([ints_to_array(s, spec.n_limbs) for s in sigma_evals])
        ),
        roots=jnp.asarray(ints_to_array(roots_host, spec.n_limbs)),
        q_lookup_evals_host=list(q_lookup_evals),
    )
