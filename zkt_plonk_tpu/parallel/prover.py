"""Multi-chip prover core: rounds 1-4 under ONE shard_map program.

Domain sharding (the workload's "sequence parallelism", SURVEY.md §5):
every polynomial/point array is split in contiguous blocks of the n axis
over a 1-D ``poly`` mesh axis; NTT stage exchanges, grand-product scans,
rolls and MSM reductions are explicit collectives from ``parallel.ops``.
Because the program is a shard_map (not GSPMD auto-partitioning), XLA
compiles a per-device program of shard size — compile cost tracks n/D,
not a partitioning search over the limb graphs (the r2 dryrun's 4m52s
GSPMD compile is replaced by this).

The round formulas mirror ``proof_system/prover.py`` (z_round /
quotient_round / fused_core) exactly — bit-parity is enforced by
``tests/test_multichip.py::test_sharded_fused_core_parity``.

Committed polynomials are carried as (body, tail) pairs: the n-coefficient
body is sharded, the 4-coefficient blinding tail is replicated (wraparound
blinding adds b(X)*(X^n - 1): +b at rows n..n+3, -b at rows 0..3).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields import device as fd
from ..fields.limbs import ints_to_array
from ..ops import msm as msm_mod
from ..ops import ntt
from . import ops as pops

AXIS = "poly"


def _bcast0(x, axis_name):
    """Replicate device 0's value of a (tiny) shard-local array."""
    return lax.all_gather(x, axis_name)[0]


def _patch_rows(x, values, rows, on_device, axis_name):
    """Set local rows ``rows`` (slice) to ``values`` on one device only."""
    d = lax.axis_index(axis_name)
    return jnp.where(d == on_device, x.at[rows].set(values), x)


def _pifft_body_tail(spec, st, evals, blinders, axis_name):
    """Sharded ifft + wraparound blinding -> (body shard, replicated tail).

    evals: (B, m, L) shard; blinders: (B, 4, L) replicated.
    Mirrors ``prover.commit_batch``/``blind``.
    """
    coeffs = pops.pifft(spec, st, evals, axis_name)  # (B, m, L)
    head = fd.sub(spec, coeffs[:, :4, :], blinders)
    coeffs = _patch_rows(coeffs, head, (slice(None), slice(0, 4)), 0, axis_name)
    return coeffs, blinders


def _z_evals_sharded(
    spec, tables, wires, f, t_evals, h1, h2, z_scalars, axis_name
):
    """Sharded z1/z2 grand-product EVALUATIONS (mirrors prover.z_round)."""
    one = fd.one(spec)
    a, b, c = wires[0], wires[1], wires[2]
    roots = tables["roots"]
    s1, s2, s3 = (tables["sigma"][i] for i in range(3))
    beta, bk1, bk2, gamma, delta, eps_1pd, one_pd, epsilon = (
        z_scalars[i] for i in range(8)
    )
    t_next = pops.proll(t_evals, -1, axis_name, axis=0)
    h1_next = pops.proll(h1, -1, axis_name, axis=0)

    sh = roots.shape[:-1]
    _bc = lambda s: jnp.broadcast_to(s, (*sh, spec.n_limbs))
    lhs1 = jnp.stack([roots, roots, roots, s1, s2, s3, t_next, h2, h1_next])
    rhs1 = jnp.stack(
        [_bc(s) for s in (beta, bk1, bk2, beta, beta, beta, delta, delta, delta)]
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
    t2f = ad(ad(dtn, eps_1pd), t_evals)
    epf = ad(_bc(epsilon), f)
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
        jnp.stack([num3, den3, _bc(one_pd)]),
    )
    z1_num, z1_den, z2_num = p3[0], p3[1], p3[2]
    z2_den = p2[3]

    dens = jnp.stack([z1_den, z2_den])  # (2, m, L)
    dens_inv = pops.pbatch_inverse(spec, dens, axis=1, axis_name=axis_name)
    ratios = fd.mul(spec, jnp.stack([z1_num, z2_num]), dens_inv)
    shifted = pops.proll(ratios, 1, axis_name, axis=1)
    shifted = _patch_rows(
        shifted,
        jnp.broadcast_to(one, (2, 1, spec.n_limbs)),
        (slice(None), slice(0, 1)),
        0,
        axis_name,
    )
    return pops.pprefix_products(spec, shifted, axis=1, axis_name=axis_name)


def _quotient_sharded(
    spec, st, q4, tables, nine_body, nine_tail, q_scalars, q_weights,
    qblinders, axis_name,
):
    """Sharded round-4 quotient (mirrors prover.quotient_round).

    nine_body: (9, m, L) coefficient shards [a,b,c,z1,z2,t,h1,h2,pi];
    nine_tail: (9, 4, L) replicated blinding tails.
    Returns (q_body (3, m, L), q_tail (3, 4, L)).
    """
    one = fd.one(spec)
    m = nine_body.shape[-2]
    ad = lambda x, y: fd.add(spec, x, y)
    c4 = tables["coset"]

    # coset4_fft with the tail fold applied on device 0 (global rows 0..3)
    head4 = jnp.broadcast_to(
        nine_body[:, None, :, :], (9, 4, m, spec.n_limbs)
    )
    t4 = fd.mul(spec, q4.gn4[:, None, :], nine_tail[:, None, :, :])  # (9,4,4,L)
    folded = fd.add(spec, head4[:, :, :4, :], t4)
    head4 = _patch_rows(
        head4, folded, (slice(None), slice(None), slice(0, 4)), 0, axis_name
    )
    h = fd.mul(spec, head4, tables["pow4"])
    cs = pops.pfft(spec, st, h, axis_name)  # (9, 4, m, L)

    a4, b4, cc4, z1, z2, t4e, h14, h24, pi4 = (cs[i] for i in range(9))
    z1n = pops.proll(z1, -1, axis_name, axis=-2)
    z2n = pops.proll(z2, -1, axis_name, axis=-2)
    tn = pops.proll(t4e, -1, axis_name, axis=-2)
    h1n = pops.proll(h14, -1, axis_name, axis=-2)

    sb = lambda x, y: fd.sub(spec, x, y)
    beta, bk1, bk2, gamma, delta, epsilon, eps_1pd = (q_scalars[i] for i in range(7))
    sh4 = a4.shape[:-1]
    bc4 = lambda s: jnp.broadcast_to(s, (*sh4, spec.n_limbs))

    lhs1 = jnp.stack(
        [a4, tables["x_coset"], tables["x_coset"], tables["x_coset"],
         c4["sigma1"], c4["sigma2"], c4["sigma3"],
         c4["q_lookup"], tn, h24, h1n]
    )
    rhs1 = jnp.stack(
        [b4, bc4(beta), bc4(bk1), bc4(bk2),
         bc4(beta), bc4(beta), bc4(beta), cc4, bc4(delta), bc4(delta), bc4(delta)]
    )
    p1 = fd.mul(spec, lhs1, rhs1)
    ab, bx, bx1, bx2, bs1, bs2, bs3, qlc, dtn, dh2, dh1n = (p1[i] for i in range(11))

    lhs2 = jnp.stack(
        [ab, a4, b4, cc4,
         ad(ad(bx, a4), gamma), ad(ad(bs1, a4), gamma),
         ad(ad(eps_1pd, t4e), dtn), ad(ad(eps_1pd, h14), dh2),
         c4["q_table"], sb(z1, one), sb(z2, one)]
    )
    rhs2 = jnp.stack(
        [c4["q_m"], c4["q_l"], c4["q_r"], c4["q_o"],
         ad(ad(bx1, b4), gamma), ad(ad(bs2, b4), gamma),
         ad(bc4(epsilon), qlc), ad(ad(eps_1pd, h24), dh1n),
         t4e, tables["l1"], tables["l1"]]
    )
    p2 = fd.mul(spec, lhs2, rhs2)
    abqm, aql, bqr, cqo, p1a, p2a, tq, hh, qtt, l1z1, l1z2 = (
        p2[i] for i in range(11)
    )

    p3 = fd.mul(
        spec,
        jnp.stack([p1a, p2a]),
        jnp.stack([ad(ad(bx2, cc4), gamma), ad(ad(bs3, cc4), gamma)]),
    )
    p4 = fd.mul(
        spec,
        jnp.stack([z1, z1n, z2, z2n]),
        jnp.stack([p3[0], p3[1], tq, hh]),
    )
    p5 = fd.mul(
        spec,
        jnp.stack([p4[0], p4[1], p4[2], p4[3], l1z1, l1z2, qtt]),
        q_weights[:, None, None, :],
    )

    arith = ad(ad(ad(abqm, aql), ad(bqr, cqo)), ad(c4["q_c"], pi4))
    perm = ad(sb(p5[0], p5[1]), p5[4])
    lookup = ad(ad(sb(p5[2], p5[3]), p5[5]), p5[6])

    q_evals = fd.mul(
        spec, ad(ad(arith, perm), lookup), tables["zh_inv"][:, None, :]
    )

    # interleaved coset ifft (mirrors ntt.coset4_ifft, sharded)
    u = pops.pifft(spec, st, q_evals, axis_name)
    v = fd.mul(spec, u, tables["ipow4"])
    terms = fd.mul(spec, v[None, :, :, :], q4.mix[:, :, None, :])
    qrows = fd.add(
        spec, fd.add(spec, terms[:, 0], terms[:, 1]), fd.add(spec, terms[:, 2], terms[:, 3])
    )  # (4, m, L): row t = shard of q[tn:(t+1)n]
    q0, q1, q2, q3 = (qrows[i] for i in range(4))

    # --- quotient splits (bodies sharded, tails replicated) -------------
    b0, b1 = qblinders[0], qblinders[1]
    zrow = jnp.zeros_like(b0)[None]
    q1_first4 = _bcast0(q1[:4], axis_name)  # (4, L) global q[n:n+4]
    q2_first4 = _bcast0(q2[:4], axis_name)
    q3_first8 = _bcast0(q3[:8], axis_name)

    lo_body = q0
    lo_tail = jnp.concatenate([q1_first4[:2], b0[None], zrow])

    mid_body = pops.proll(q1, -2, axis_name, axis=0)
    mid_body = _patch_rows(
        mid_body, q2_first4[:2], slice(m - 2, m), lax.axis_size(axis_name) - 1,
        axis_name,
    )
    mid0 = fd.sub(spec, mid_body[0], b0)
    mid_body = _patch_rows(mid_body, mid0[None], slice(0, 1), 0, axis_name)
    mid_tail = jnp.concatenate([q2_first4[2:4], b1[None], zrow])

    hi_body = pops.proll(q2, -4, axis_name, axis=0)
    hi_body = _patch_rows(
        hi_body, q3_first8[:4], slice(m - 4, m), lax.axis_size(axis_name) - 1,
        axis_name,
    )
    hi0 = fd.sub(spec, hi_body[0], b1)
    hi_body = _patch_rows(hi_body, hi0[None], slice(0, 1), 0, axis_name)
    hi_tail = q3_first8[4:8]

    q_body = jnp.stack([lo_body, mid_body, hi_body])  # (3, m, L)
    q_tail = jnp.stack([lo_tail, mid_tail, hi_tail])  # (3, 4, L)
    return q_body, q_tail


def _commit_totals_batch(
    fq_spec, b3, powers_body, powers_tail, bodies, tails, fr_bits, msm_c,
    msm_groups, axis_name,
):
    """Window totals for a batch of committed (body, tail) polynomials."""

    def one_commit(args):
        body, tail = args
        return pops.pcommit_totals(
            fq_spec, b3, powers_body, powers_tail, body, tail, fr_bits,
            c=msm_c, axis_name=axis_name, groups=msm_groups,
        )

    return jax.lax.map(one_commit, (bodies, tails))  # (B, W, 3, L)


def sharded_fused_core(
    spec,
    fq_spec,
    fr_bits: int,
    n: int,
    msm_c: int,
    msm_groups: int,
    st: pops.ShardNttTables,
    q4: ntt.Coset4Plan,
    tables: Dict,
    powers_body,  # (n, 3, L) shard of SRS powers[:n]
    powers_tail,  # (4, 3, L) replicated powers[n:n+4]
    b3,
    wires,  # (3, m, L) shard
    f,
    t_evals,
    h1,
    h2,
    pi_evals,
    z_scalars,
    q_scalars,
    q_weights,
    blinders_abc,
    blinders_th,
    blinders_z,
    qblinders,
    axis_name: str = AXIS,
):
    """Rounds 1-4 device work, sharded.  Returns (window totals (11, W, 3, L)
    replicated, q body shards (3, m, L), q tails (3, 4, L))."""
    th_evals = jnp.stack([t_evals, h1, h2])

    # z1/z2 depend only on EVALUATIONS, so all 9 iffts (wires, z, lookup,
    # pi) batch into ONE sharded ifft — one butterfly graph instead of
    # four (compile time) and one set of collectives (runtime).
    z_evals = _z_evals_sharded(
        spec, tables, wires, f, t_evals, h1, h2, z_scalars, axis_name
    )
    nine_evals = jnp.concatenate(
        [wires, z_evals, th_evals, pi_evals[None]]
    )  # (9, m, L) [a,b,c,z1,z2,t,h1,h2,pi]
    nine_tail = jnp.concatenate(
        [blinders_abc, blinders_z, blinders_th, jnp.zeros_like(blinders_abc[:1])]
    )  # (9, 4, L) replicated
    nine_body, nine_tail = _pifft_body_tail(
        spec, st, nine_evals, nine_tail, axis_name
    )
    abc_body, abc_tail = nine_body[0:3], nine_tail[0:3]
    z_body, z_tail = nine_body[3:5], nine_tail[3:5]
    th_body, th_tail = nine_body[5:8], nine_tail[5:8]

    q_body, q_tail = _quotient_sharded(
        spec, st, q4, tables, nine_body, nine_tail, q_scalars, q_weights,
        qblinders, axis_name,
    )

    # --- MSM commits: sharded bucket accumulation + collective reduce ---
    all_bodies = jnp.concatenate([abc_body, th_body, z_body, q_body])  # (11, m, L)
    all_tails = jnp.concatenate([abc_tail, th_tail, z_tail, q_tail])  # (11, 4, L)
    totals = _commit_totals_batch(
        fq_spec, b3, powers_body, powers_tail, all_bodies, all_tails,
        fr_bits, msm_c, msm_groups, axis_name,
    )
    return totals, q_body, q_tail


class ShardedProverCore:
    """Builds the jitted shard_map program + shardings for a Prover."""

    def __init__(self, prover, mesh: Mesh, axis_name: str = AXIS,
                 msm_groups: int = 0):
        """``msm_groups`` > 0 shrinks the per-device bucket graph (fewer
        accumulation groups).  Any value is mathematically correct; small
        values cut the XLA CPU compile of the scatter graphs (used by the
        virtual-device dryrun) at some device-throughput cost."""
        from ..ops.msm import msm_window_size

        self.prover = prover
        self.mesh = mesh
        self.axis_name = axis_name
        self.D = mesh.devices.size
        n = prover.n
        assert n % self.D == 0, "circuit size must divide the mesh"
        self.st_host = pops.build_shard_ntt_tables(prover.domain, self.D)
        self.msm_c = msm_window_size(n + 4)
        self.msm_groups = msm_groups
        self._build()

    def _build(self):
        prover = self.prover
        spec = prover.spec
        fq_spec = prover.ctx.fq_spec
        fr_bits = prover.ctx.curve.fr.modulus.bit_length()
        n = prover.n
        axis = self.axis_name
        msm_c = self.msm_c
        msm_groups = self.msm_groups

        sh = lambda *spec_: P(*spec_)
        rep = P()
        st_specs = pops.shard_ntt_specs(axis)
        tables_specs = {
            "coset": {k: sh(None, axis, None) for k in prover._tables["coset"]},
            "x_coset": sh(None, axis, None),
            "zh_inv": rep,
            "l1": sh(None, axis, None),
            "sigma": sh(None, axis, None),
            "roots": sh(axis, None),
            "pow4": sh(None, axis, None),
            "ipow4": sh(None, axis, None),
        }
        q4_specs = ntt.Coset4Plan(pow4=rep, ipow4=rep, gn4=rep, mix=rep)

        def core(st, q4, tables, powers_body, powers_tail, b3,
                 wires, f, t_evals, h1, h2, pi_evals, z_scalars, q_scalars,
                 q_weights, blinders_abc, blinders_th, blinders_z, qblinders):
            return sharded_fused_core(
                spec, fq_spec, fr_bits, n, msm_c, msm_groups, st, q4, tables,
                powers_body, powers_tail, b3, wires, f, t_evals, h1, h2,
                pi_evals, z_scalars, q_scalars, q_weights,
                blinders_abc, blinders_th, blinders_z, qblinders,
                axis_name=axis,
            )

        in_specs = (
            st_specs,
            q4_specs,
            tables_specs,
            sh(axis, None, None),  # powers body
            rep,  # powers tail
            rep,  # b3
            sh(None, axis, None),  # wires
            sh(axis, None),  # f
            sh(axis, None),  # t_evals
            sh(axis, None),  # h1
            sh(axis, None),  # h2
            sh(axis, None),  # pi_evals
            rep, rep, rep, rep, rep, rep, rep,
        )
        out_specs = (rep, sh(None, axis, None), rep)
        # check_vma=False: the replicated (P()) outputs — MSM window totals
        # and quotient tails — are replicated by construction (all_gather +
        # identical local math), which the static varying-manual-axes
        # inference cannot prove.
        self._core = jax.jit(
            jax.shard_map(
                core, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )

    # -- argument staging ------------------------------------------------

    def device_args(self):
        """device_put the prover's static tables with their shardings.

        The Coset4Plan's big (4, n, L) power tables are passed separately
        inside ``tables`` (sharded); the replicated plan carries only the
        tiny gn4/mix leaves (pow4/ipow4 entries are replaced by dummies).
        """
        prover = self.prover
        mesh, axis = self.mesh, self.axis_name
        ns = lambda *s: NamedSharding(mesh, P(*s))
        rep = NamedSharding(mesh, P())

        st = self.st_host
        st_dev = pops.ShardNttTables(
            rev_d=jax.device_put(jnp.asarray(st.rev_d), rep),
            rev_m=jax.device_put(jnp.asarray(st.rev_m), rep),
            tw_local=jax.device_put(jnp.asarray(st.tw_local), rep),
            tw_inv_local=jax.device_put(jnp.asarray(st.tw_inv_local), rep),
            tw_global=jax.device_put(jnp.asarray(st.tw_global), rep),
            tw_inv_global=jax.device_put(jnp.asarray(st.tw_inv_global), rep),
            n_inv=jax.device_put(jnp.asarray(st.n_inv), rep),
            coset_pow=jax.device_put(jnp.asarray(st.coset_pow), ns(axis, None)),
            coset_ipow=jax.device_put(jnp.asarray(st.coset_ipow), ns(axis, None)),
        )
        q4_host = prover.domain.quarter_plan()
        q4_dev = ntt.Coset4Plan(
            pow4=jax.device_put(jnp.zeros((1, 1), jnp.uint32), rep),
            ipow4=jax.device_put(jnp.zeros((1, 1), jnp.uint32), rep),
            gn4=jax.device_put(jnp.asarray(q4_host.gn4), rep),
            mix=jax.device_put(jnp.asarray(q4_host.mix), rep),
        )
        t = prover._tables
        tables_dev = {
            "coset": {
                k: jax.device_put(v, ns(None, axis, None))
                for k, v in t["coset"].items()
            },
            "x_coset": jax.device_put(t["x_coset"], ns(None, axis, None)),
            "zh_inv": jax.device_put(t["zh_inv"], rep),
            "l1": jax.device_put(t["l1"], ns(None, axis, None)),
            "sigma": jax.device_put(t["sigma"], ns(None, axis, None)),
            "roots": jax.device_put(t["roots"], ns(axis, None)),
            "pow4": jax.device_put(jnp.asarray(q4_host.pow4), ns(None, axis, None)),
            "ipow4": jax.device_put(jnp.asarray(q4_host.ipow4), ns(None, axis, None)),
        }
        n = prover.n
        powers = prover.ck.powers
        powers_body = jax.device_put(powers[:n], ns(axis, None, None))
        powers_tail = jax.device_put(powers[n : n + 4], rep)
        b3 = jax.device_put(prover.ck.b3, rep)
        return st_dev, q4_dev, tables_dev, powers_body, powers_tail, b3

    def run(self, statics, witness_args: Dict):
        """witness_args: same dict the single-chip fused core takes."""
        mesh, axis = self.mesh, self.axis_name
        ns = lambda *s: NamedSharding(mesh, P(*s))
        rep = NamedSharding(mesh, P())
        spec_for = {
            "wires": ns(None, axis, None),
            "f": ns(axis, None),
            "t_evals": ns(axis, None),
            "h1": ns(axis, None),
            "h2": ns(axis, None),
            "pi_evals": ns(axis, None),
        }
        placed = {
            k: jax.device_put(v, spec_for.get(k, rep))
            for k, v in witness_args.items()
        }
        # shard_map-wrapped callables take positional args only
        order = ["wires", "f", "t_evals", "h1", "h2", "pi_evals",
                 "z_scalars", "q_scalars", "q_weights",
                 "blinders_abc", "blinders_th", "blinders_z", "qblinders"]
        return self._core(*statics, *[placed[k] for k in order])


# ---------------------------------------------------------------------------
# Full multi-chip prover (real Fiat-Shamir orchestration)
# ---------------------------------------------------------------------------


class ShardedProver:
    """The COMPLETE 5-round prover over a device mesh — real transcript flow.

    Round structure, challenges and blinding mirror
    ``proof_system.prover.Prover.prove`` (reference ``prove.rs:59-483``)
    exactly, so proofs are bit-identical to single-chip; every device
    program is a ``shard_map`` with explicit collectives (domain sharding,
    SURVEY.md §2.5 item 6).  Commitments cross to the host as replicated
    MSM window totals; the host performs the tiny Horner window fold.

    Programs (each jitted once per circuit size):
      r12   — batched ifft of [a,b,c,t,h1,h2,pi] + blinding
      z     — z1/z2 grand products + ifft + blinding
      q     — interleaved 4n-coset quotient + splits
      eval  — batched multi-point evaluation at xi / omega*xi
      open  — lin combine + eta folds + sharded synthetic divisions
      commit — window totals for ONE (body, tail) polynomial

    All 13 commitments go through the ONE ``commit`` executable (host
    loop): embedding per-round commit graphs quadrupled the XLA compile
    cost — the r3/r4 dryrun timeouts — for a dispatch saving that is
    noise next to the MSM itself.
    """

    def __init__(self, prover, mesh: Mesh, axis_name: str = AXIS,
                 msm_groups: int = 0):
        from ..ops.msm import msm_window_size

        self.prover = prover
        self.mesh = mesh
        self.axis_name = axis_name
        self.D = mesh.devices.size
        n = prover.n
        assert n % self.D == 0, "circuit size must divide the mesh"
        self.m = n // self.D
        self.st_host = pops.build_shard_ntt_tables(prover.domain, self.D)
        self.msm_c = msm_window_size(n + 4)
        self.msm_groups = msm_groups
        self._build_programs()
        self._stage_statics()

    # -- program construction -------------------------------------------

    def _build_programs(self):
        prover = self.prover
        spec = prover.spec
        fq_spec = prover.ctx.fq_spec
        fr_bits = prover.ctx.curve.fr.modulus.bit_length()
        axis = self.axis_name
        msm_c, msm_groups = self.msm_c, self.msm_groups

        sh = lambda *s: P(*s)
        rep = P()
        st_specs = pops.shard_ntt_specs(axis)
        tables_specs = {
            "coset": {k: sh(None, axis, None) for k in prover._tables["coset"]},
            "x_coset": sh(None, axis, None),
            "zh_inv": rep,
            "l1": sh(None, axis, None),
            "sigma": sh(None, axis, None),
            "roots": sh(axis, None),
            "pow4": sh(None, axis, None),
            "ipow4": sh(None, axis, None),
        }
        q4_specs = ntt.Coset4Plan(pow4=rep, ipow4=rep, gn4=rep, mix=rep)
        pw_specs = (sh(axis, None, None), rep, rep)  # powers_body/tail, b3
        body = sh(None, axis, None)

        def smap(fn, in_specs, out_specs):
            return jax.jit(
                jax.shard_map(
                    fn, mesh=self.mesh, in_specs=in_specs,
                    out_specs=out_specs, check_vma=False,
                )
            )

        # the ONE commit program: window totals for a single (body, tail)
        def commit1(powers_body, powers_tail, b3, body_, tail_):
            return pops.pcommit_totals(
                fq_spec, b3, powers_body, powers_tail, body_, tail_,
                fr_bits, c=msm_c, axis_name=axis, groups=msm_groups,
            )

        self._commit1 = smap(
            commit1, (*pw_specs, sh(axis, None), rep), rep
        )

        # r12: one ifft over [a,b,c,t,h1,h2,pi] + blinding
        def r12(st, wires, th, pi, bl_abc, bl_th):
            evals = jnp.concatenate([wires, th, pi[None]])  # (7, m, L)
            tails = jnp.concatenate(
                [bl_abc, bl_th, jnp.zeros_like(bl_abc[:1])]
            )
            bodies, tails = _pifft_body_tail(spec, st, evals, tails, axis)
            return bodies, tails

        self._r12 = smap(
            r12,
            (st_specs, body, body, sh(axis, None), rep, rep),
            (body, rep),
        )

        # z round: grand products -> ifft -> blinding
        def zr(st, tables, wires, f, t, h1, h2, z_scalars, bl_z):
            z_evals = _z_evals_sharded(
                spec, tables, wires, f, t, h1, h2, z_scalars, axis
            )
            return _pifft_body_tail(spec, st, z_evals, bl_z, axis)

        self._zr = smap(
            zr,
            (st_specs, tables_specs, body,
             sh(axis, None), sh(axis, None), sh(axis, None), sh(axis, None),
             rep, rep),
            (body, rep),
        )

        # quotient round: assemble nine, fused coset pass, splits
        def qr(st, q4, tables, seven_body, seven_tail, z_body, z_tail,
               q_scalars, q_weights, qblinders):
            nine_body = jnp.concatenate(
                [seven_body[:3], z_body, seven_body[3:6], seven_body[6:7]]
            )
            nine_tail = jnp.concatenate(
                [seven_tail[:3], z_tail, seven_tail[3:6], seven_tail[6:7]]
            )
            return _quotient_sharded(
                spec, st, q4, tables, nine_body, nine_tail,
                q_scalars, q_weights, qblinders, axis,
            )

        self._qr = smap(
            qr,
            (st_specs, q4_specs, tables_specs,
             body, rep, body, rep, rep, rep, rep),
            (body, rep),
        )

        # round 5: batched evaluation at xi and omega*xi
        def ev(bx, tx, bw, tw, xi, wxi):
            return (
                pops.peval_many(spec, bx, tx, xi, axis),
                pops.peval_many(spec, bw, tw, wxi, axis),
            )

        self._ev = smap(
            ev, (body, rep, body, rep, rep, rep), (rep, rep)
        )

        # round 5 tail as ONE program: linearization combine + BOTH batch
        # openings (aw at xi over [r, 8 polys], saw at omega*xi over 4).
        # The two W commitments run through the shared ``commit1``.
        def opn(lin_bodies, lin_tails, lin_scalars,
                aw_bodies, aw_tails, saw_bodies, saw_tails,
                eta_aw, eta_saw, xi_pt, xi_inv, wxi_pt, wxi_inv):
            r_body = pops._tree_add(
                spec, fd.mul(spec, lin_bodies, lin_scalars[:, None, :]), axis=0
            )
            r_tail = pops._tree_add(
                spec, fd.mul(spec, lin_tails, lin_scalars[:, None, :]), axis=0
            )

            def fold_open(bodies, tails, eta_powers, pt, pt_inv):
                fb = pops._tree_add(
                    spec, fd.mul(spec, bodies, eta_powers[:, None, :]), axis=0
                )
                ft = pops._tree_add(
                    spec, fd.mul(spec, tails, eta_powers[:, None, :]), axis=0
                )
                return pops.pdivide_by_linear(spec, fb, ft, pt, pt_inv, axis)

            aw_b = jnp.concatenate([r_body[None], aw_bodies])
            aw_t = jnp.concatenate([r_tail[None], aw_tails])
            aw_qb, aw_qt = fold_open(aw_b, aw_t, eta_aw, xi_pt, xi_inv)
            saw_qb, saw_qt = fold_open(saw_bodies, saw_tails, eta_saw, wxi_pt, wxi_inv)
            return (jnp.stack([aw_qb, saw_qb]), jnp.stack([aw_qt, saw_qt]))

        self._opn = smap(
            opn,
            (body, rep, rep, body, rep, body, rep,
             rep, rep, rep, rep, rep, rep),
            (body, rep),
        )

    # -- static staging --------------------------------------------------

    def _stage_statics(self):
        prover = self.prover
        mesh, axis = self.mesh, self.axis_name
        ns = lambda *s: NamedSharding(mesh, P(*s))
        rep = NamedSharding(mesh, P())
        core = ShardedProverCore.__new__(ShardedProverCore)
        core.prover = prover
        core.mesh = mesh
        core.axis_name = axis
        core.st_host = self.st_host
        (self._st, self._q4, self._tables, self._pwb, self._pwt,
         self._b3) = core.device_args()
        n = prover.n
        # PK polynomials as committed (body shard, zero tail) pairs
        self._pk_body = {
            name: jax.device_put(prover.pk.polys[name], ns(axis, None))
            for name in ("sigma1", "sigma2", "sigma3", "q_lookup", "q_table",
                         "q_m", "q_l", "q_r", "q_o", "q_c")
        }
        self._zero_tail = jax.device_put(
            jnp.zeros((4, prover.spec.n_limbs), jnp.uint32), rep
        )
        self._sh_body = ns(None, axis, None)
        self._sh_row = ns(axis, None)
        self._rep = rep

    # -- host orchestration ----------------------------------------------

    def _fold_totals(self, totals) -> list:
        from ..ops import msm as msm_mod

        arr = np.asarray(totals)
        if arr.ndim == 3:
            arr = arr[None]
        Fq = self.prover.ctx.Fq
        return [
            msm_mod.fold_windows_host(self.prover.ctx.fq_spec, Fq, arr[i], self.msm_c)
            for i in range(arr.shape[0])
        ]

    def _commit_many(self, bodies, tails) -> list:
        """Commit B (body, tail) pairs through the ONE shared executable.

        bodies: (B, m_global, L) with the poly axis sharded; tails:
        (B, 4, L) replicated.  Dispatches B calls (device work dominates
        dispatch at any real size), folds window totals on the host.

        Every argument is device_put to its canonical sharding so all B
        calls (and the dryrun's precompile dummies) hit ONE executable —
        sliced arrays otherwise carry derived shardings that fork the jit
        cache key.
        """
        totals = [
            self._commit1(
                self._pwb, self._pwt, self._b3,
                jax.device_put(bodies[i], self._sh_row),
                jax.device_put(tails[i], self._rep),
            )
            for i in range(bodies.shape[0])
        ]
        return self._fold_totals(jnp.stack(totals))

    def prove(self, composer, transcript, rng):
        """Bit-identical to ``Prover.prove`` over the mesh."""
        from ..cs.composer import K1, K2
        from ..cs.lookup import combine_split
        from ..proof_system.proof import Proof, ProofEvaluations
        from ..proof_system.prover import _blinders, _enc_vec

        prover = self.prover
        n, p, spec = prover.n, prover.p, prover.spec
        composer.pad_to(n)
        transcript.append_scalars("pi", composer.pi_values())

        put_b = lambda x: jax.device_put(x, self._sh_body)
        put_r = lambda x: jax.device_put(x, self._sh_row)
        put = lambda x: jax.device_put(x, self._rep)

        # --- round 1 + 2 ----------------------------------------------
        # witness staging rides the single-chip prover's uint16 path
        # (device-side widen) before resharding onto the mesh
        a_ints, b_ints, c_ints = composer.wire_evals()
        wires = put_b(prover._stage_stack([a_ints, b_ints, c_ints]))
        t_ints = prover._t_ints
        ql = prover.epk.q_lookup_evals_host
        f_ints = [(ql[i] * c_ints[i]) % p for i in range(n)]
        h1_ints, h2_ints = combine_split(t_ints, f_ints)
        h1_ints += [0] * (n - len(h1_ints))
        h2_ints += [0] * (n - len(h2_ints))
        th = put_b(jnp.concatenate(
            [prover._t_dev[None], prover._stage_stack([h1_ints, h2_ints])]
        ))
        pi_evals = put_r(prover._stage_rows(composer.pi_as_evals(n)))
        bl_abc = put(_blinders(spec, rng, p, [2, 2, 2]))
        bl_th = put(_blinders(spec, rng, p, [0, 3, 2]))
        seven_body, seven_tail = self._r12(
            self._st, wires, th, pi_evals, bl_abc, bl_th,
        )
        aff6 = self._commit_many(seven_body[:6], seven_tail[:6])  # a,b,c,t,h1,h2
        transcript.append_commitment("a_commit", aff6[0])
        transcript.append_commitment("b_commit", aff6[1])
        transcript.append_commitment("c_commit", aff6[2])
        transcript.append_commitment("t_commit", aff6[3])
        transcript.append_commitment("h1_commit", aff6[4])
        transcript.append_commitment("h2_commit", aff6[5])

        # --- round 3 ---------------------------------------------------
        beta = transcript.challenge_scalar("beta")
        gamma = transcript.challenge_scalar("gamma")
        delta = transcript.challenge_scalar("delta")
        epsilon = transcript.challenge_scalar("epsilon")
        assert len({beta, gamma, delta, epsilon}) == 4, "challenges must be different"
        eps_1pd = epsilon * (1 + delta) % p
        z_scalars = put(_enc_vec(
            spec,
            [beta, beta * K1 % p, beta * K2 % p, gamma, delta, eps_1pd,
             (1 + delta) % p, epsilon],
        ))
        bl_z = put(_blinders(spec, rng, p, [3, 3]))
        f_dev = put_r(prover._stage_rows(f_ints))
        z_body, z_tail = self._zr(
            self._st, self._tables,
            wires, f_dev, put_r(th[0]), put_r(th[1]), put_r(th[2]),
            z_scalars, bl_z,
        )
        aff2 = self._commit_many(z_body, z_tail)
        transcript.append_commitment("z1_commit", aff2[0])
        transcript.append_commitment("z2_commit", aff2[1])

        # --- round 4 ---------------------------------------------------
        alpha = transcript.challenge_scalar("alpha")
        a2 = alpha * alpha % p
        a3 = a2 * alpha % p
        q_scalars = put(_enc_vec(
            spec,
            [beta, beta * K1 % p, beta * K2 % p, gamma, delta, epsilon, eps_1pd],
        ))
        q_weights = put(_enc_vec(
            spec,
            [alpha, alpha, a3 * (1 + delta) % p, a3, a2, a3 * alpha % p,
             a3 * a2 % p],
        ))
        qblinders = put(_enc_vec(spec, [rng.randrange(p), rng.randrange(p)]))
        q_body, q_tail = self._qr(
            self._st, self._q4, self._tables,
            put_b(seven_body), put(seven_tail), put_b(z_body), put(z_tail),
            q_scalars, q_weights, qblinders,
        )
        aff3 = self._commit_many(q_body, q_tail)
        transcript.append_commitment("q_lo_commit", aff3[0])
        transcript.append_commitment("q_mid_commit", aff3[1])
        transcript.append_commitment("q_hi_commit", aff3[2])

        # --- round 5 ---------------------------------------------------
        xi = transcript.challenge_scalar("xi")
        omega = prover.domain.group_gen
        wxi = xi * omega % p

        zt = self._zero_tail
        bx = jnp.stack([
            seven_body[0], seven_body[1], seven_body[2],
            self._pk_body["sigma1"], self._pk_body["sigma2"],
            self._pk_body["q_lookup"], seven_body[3], seven_body[5],
        ])
        tx = jnp.stack([
            seven_tail[0], seven_tail[1], seven_tail[2], zt, zt, zt,
            seven_tail[3], seven_tail[5],
        ])
        bw = jnp.stack([z_body[0], seven_body[3], z_body[1], seven_body[4]])
        tw = jnp.stack([z_tail[0], seven_tail[3], z_tail[1], seven_tail[4]])
        ev_xi, ev_wxi = self._ev(
            put_b(bx), put(tx), put_b(bw), put(tw),
            put(_enc_vec(spec, [xi])[0]), put(_enc_vec(spec, [wxi])[0]),
        )
        ev_xi_i = spec.decode(np.asarray(ev_xi))
        ev_wxi_i = spec.decode(np.asarray(ev_wxi))
        evals = ProofEvaluations(
            a=ev_xi_i[0], b=ev_xi_i[1], c=ev_xi_i[2],
            sigma1=ev_xi_i[3], sigma2=ev_xi_i[4],
            z1_next=ev_wxi_i[0], q_lookup=ev_xi_i[5],
            t=ev_xi_i[6], t_next=ev_wxi_i[1], z2_next=ev_wxi_i[2],
            h1_next=ev_wxi_i[3], h2=ev_xi_i[7],
        )
        for label, value in evals.transcript_items():
            transcript.append_scalar(label, value)

        zh_eval = (pow(xi, n, p) - 1) % p
        l1_eval = zh_eval * pow(n * (xi - 1) % p, -1, p) % p
        # linearization scalars — identical host algebra to the single-chip
        # prover; the poly list maps to (body, tail) pairs here
        scalars, poly_pairs = self._linearization_pairs(
            evals, alpha, beta, gamma, delta, epsilon, xi, zh_eval, l1_eval,
            seven_body, seven_tail, z_body, z_tail, q_body, q_tail,
        )
        lb = jnp.stack([bp for bp, _ in poly_pairs])
        lt_ = jnp.stack([tp for _, tp in poly_pairs])

        # --- openings (one merged program: lin + aw + saw) -------------
        eta = transcript.challenge_scalar("eta")
        from ..proof_system.prover import _powers_arr

        aw_rest_b = jnp.stack([
            seven_body[0], seven_body[1], seven_body[2],
            self._pk_body["sigma1"], self._pk_body["sigma2"],
            self._pk_body["q_lookup"], seven_body[3], seven_body[5],
        ])
        aw_rest_t = jnp.stack([
            seven_tail[0], seven_tail[1], seven_tail[2],
            zt, zt, zt, seven_tail[3], seven_tail[5],
        ])
        saw_b = jnp.stack([z_body[0], z_body[1], seven_body[3], seven_body[4]])
        saw_t = jnp.stack([z_tail[0], z_tail[1], seven_tail[3], seven_tail[4]])

        open_bodies, open_tails = self._opn(
            put_b(lb), put(lt_), put(_enc_vec(spec, scalars)),
            put_b(aw_rest_b), put(aw_rest_t), put_b(saw_b), put(saw_t),
            put(_powers_arr(spec, eta, 9, p)), put(_powers_arr(spec, eta, 4, p)),
            put(_enc_vec(spec, [xi])[0]),
            put(_enc_vec(spec, [pow(xi, -1, p)])[0]),
            put(_enc_vec(spec, [wxi])[0]),
            put(_enc_vec(spec, [pow(wxi, -1, p)])[0]),
        )
        aw_aff, saw_aff = self._commit_many(open_bodies, open_tails)

        return Proof(
            a_commit=aff6[0], b_commit=aff6[1], c_commit=aff6[2],
            t_commit=aff6[3], h1_commit=aff6[4], h2_commit=aff6[5],
            z1_commit=aff2[0], z2_commit=aff2[1],
            q_lo_commit=aff3[0], q_mid_commit=aff3[1], q_hi_commit=aff3[2],
            aw_opening=aw_aff, saw_opening=saw_aff, evaluations=evals,
        )

    def _linearization_pairs(
        self, ev, alpha, beta, gamma, delta, epsilon, xi, zh_eval, l1_eval,
        seven_body, seven_tail, z_body, z_tail, q_body, q_tail,
    ):
        """Same scalars as ``Prover._linearization_terms``; polys as
        (body, tail) pairs."""
        prover = self.prover
        p = prover.p
        zt = self._zero_tail
        pk = self._pk_body

        scalars = [ev.a * ev.b % p, ev.a, ev.b, ev.c, 1]
        pairs = [
            (pk["q_m"], zt), (pk["q_l"], zt), (pk["q_r"], zt),
            (pk["q_o"], zt), (pk["q_c"], zt),
        ]

        from ..cs.composer import K1, K2

        beta_xi = beta * xi % p
        z1_scalar = (
            alpha
            * ((beta_xi + ev.a + gamma) % p)
            * ((beta_xi * K1 + ev.b + gamma) % p)
            * ((beta_xi * K2 + ev.c + gamma) % p)
            + l1_eval * alpha * alpha
        ) % p
        scalars.append(z1_scalar)
        pairs.append((z_body[0], z_tail[0]))

        sigma3_scalar = (
            -alpha
            * beta
            * ev.z1_next
            * ((beta * ev.sigma1 + ev.a + gamma) % p)
            * ((beta * ev.sigma2 + ev.b + gamma) % p)
        ) % p
        scalars.append(sigma3_scalar)
        pairs.append((pk["sigma3"], zt))

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
        pairs.append((z_body[1], z_tail[1]))

        h1_scalar = (
            -alpha_cu * ev.z2_next * ((eps_1pd + ev.h2 + delta * ev.h1_next) % p)
        ) % p
        scalars.append(h1_scalar)
        pairs.append((seven_body[4], seven_tail[4]))

        scalars.append(alpha_qu * alpha % p * ev.t % p)
        pairs.append((pk["q_table"], zt))

        xi_n2 = (zh_eval + 1) * xi * xi % p
        scalars.append((-zh_eval) % p)
        pairs.append((q_body[0], q_tail[0]))
        scalars.append((-zh_eval) * xi_n2 % p)
        pairs.append((q_body[1], q_tail[1]))
        scalars.append((-zh_eval) * xi_n2 % p * xi_n2 % p)
        pairs.append((q_body[2], q_tail[2]))

        return scalars, pairs
