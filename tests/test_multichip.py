"""Multi-device parity tests for the shard_map collective layer.

Runs on 8 virtual CPU devices (conftest.py) — the standard way to validate
shard_map collectives without a TPU slice (SURVEY.md §4).  Every test
asserts the sharded primitive matches its single-device counterpart
bit-exactly.
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields import device as fd
from zkt_plonk_tpu.fields.limbs import ints_to_array
from zkt_plonk_tpu.ops import ec, msm, ntt
from zkt_plonk_tpu.parallel import ops as pops
from zkt_plonk_tpu.utils.domain import make_domain

D = 8
N = 128  # global poly size; shard = 16 rows/device

SPEC = make_spec(BN254_FR)
P_MOD = SPEC.modulus
AXIS = "poly"


def _mesh():
    devices = np.asarray(jax.devices()[:D])
    return Mesh(devices, (AXIS,))


def _rand_poly(rng, n, batch=()):
    vals = [rng.randrange(P_MOD) for _ in range(int(np.prod(batch, dtype=int)) * n)]
    arr = ints_to_array(vals, SPEC.n_limbs).reshape(*batch, n, SPEC.n_limbs)
    return jnp.asarray(arr)


def _decode(arr):
    return SPEC.decode(np.asarray(arr))


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= D, "conftest must provide 8 virtual devices"
    return _mesh()


@pytest.fixture(scope="module")
def domain():
    return make_domain(BN254_FR, N)


@pytest.fixture(scope="module")
def shard_tables(domain):
    return pops.build_shard_ntt_tables(domain, D)


def _run_sharded(mesh, fn, in_specs, out_specs, *args):
    # check_vma=False: replicated (P()) outputs here are replicated by
    # construction (all_gather + identical local math), which the static
    # varying-manual-axes inference cannot prove.
    sharded = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )
    return jax.jit(sharded)(*args)


def test_pbitrev_matches_global_gather(mesh, domain, shard_tables):
    rng = random.Random(1)
    x = _rand_poly(rng, N)
    st = shard_tables
    want = np.asarray(x)[domain.bit_reversal_perm()]

    got = _run_sharded(
        mesh,
        lambda a, rd, rm: pops.pbitrev(a, rd, rm, AXIS),
        (P(AXIS, None), P(), P()),
        P(AXIS, None),
        x,
        jnp.asarray(st.rev_d),
        jnp.asarray(st.rev_m),
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pfft_pifft_match_single_device(mesh, domain, shard_tables):
    rng = random.Random(2)
    x = _rand_poly(rng, N)
    plan = domain.plan_device()
    st = jax.tree_util.tree_map(jnp.asarray, shard_tables)
    specs = pops.shard_ntt_specs(AXIS)

    want_fft = np.asarray(jax.jit(lambda pl, c: ntt.fft(SPEC, pl, c))(plan, x))
    got_fft = _run_sharded(
        mesh,
        lambda t, c: pops.pfft(SPEC, t, c, AXIS),
        (specs, P(AXIS, None)),
        P(AXIS, None),
        st,
        x,
    )
    np.testing.assert_array_equal(np.asarray(got_fft), want_fft)

    want_ifft = np.asarray(jax.jit(lambda pl, c: ntt.ifft(SPEC, pl, c))(plan, x))
    got_ifft = _run_sharded(
        mesh,
        lambda t, c: pops.pifft(SPEC, t, c, AXIS),
        (specs, P(AXIS, None)),
        P(AXIS, None),
        st,
        x,
    )
    np.testing.assert_array_equal(np.asarray(got_ifft), want_ifft)


def test_pcoset_fft_roundtrip_and_parity(mesh, domain, shard_tables):
    rng = random.Random(3)
    x = _rand_poly(rng, N, batch=(2,))  # batched polys shard on axis -2
    plan = domain.plan_device()
    st = jax.tree_util.tree_map(jnp.asarray, shard_tables)
    specs = pops.shard_ntt_specs(AXIS)
    bspec = P(None, AXIS, None)

    want = np.asarray(jax.jit(lambda pl, c: ntt.coset_fft(SPEC, pl, c))(plan, x))
    got = _run_sharded(
        mesh,
        lambda t, c: pops.pcoset_fft(SPEC, t, c, AXIS),
        (specs, bspec),
        bspec,
        st,
        x,
    )
    np.testing.assert_array_equal(np.asarray(got), want)

    back = _run_sharded(
        mesh,
        lambda t, c: pops.pcoset_ifft(SPEC, t, c, AXIS),
        (specs, bspec),
        bspec,
        st,
        got,
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_proll_matches_global_roll(mesh):
    rng = random.Random(4)
    x = _rand_poly(rng, N)
    for shift in (-4, -1, 1, 3):
        got = _run_sharded(
            mesh,
            lambda a, s=shift: pops.proll(a, s, AXIS, axis=0),
            (P(AXIS, None),),
            P(AXIS, None),
            x,
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.roll(np.asarray(x), shift, axis=0)
        )


def test_pprefix_products_matches(mesh):
    rng = random.Random(5)
    x = _rand_poly(rng, N, batch=(2,))
    want = _decode(jax.jit(lambda a: fd.prefix_products(SPEC, a, axis=1))(x))
    got = _run_sharded(
        mesh,
        lambda a: pops.pprefix_products(SPEC, a, 1, AXIS),
        (P(None, AXIS, None),),
        P(None, AXIS, None),
        x,
    )
    assert _decode(got) == want


def test_pbatch_inverse_matches(mesh):
    rng = random.Random(6)
    x = _rand_poly(rng, N)
    # plant zeros to exercise the zero-maps-to-zero path
    x = x.at[3].set(0).at[77].set(0)
    want = _decode(jax.jit(lambda a: fd.batch_inverse(SPEC, a, axis=0))(x))
    got = _run_sharded(
        mesh,
        lambda a: pops.pbatch_inverse(SPEC, a, 0, AXIS),
        (P(AXIS, None),),
        P(AXIS, None),
        x,
    )
    assert _decode(got) == want


def test_pmsm_totals_matches_single_device(mesh):
    from zkt_plonk_tpu.curves import make_context

    ctx = make_context("bn254")
    fq_spec = ctx.fq_spec
    b3 = ec.b3_const(fq_spec, ctx.curve.b)
    fr_bits = ctx.curve.fr.modulus.bit_length()
    rng = random.Random(7)

    n = 64
    from zkt_plonk_tpu.curves import curve_host as ch

    base = ctx.g1
    pts_host = []
    acc = base
    for _ in range(n):
        pts_host.append(acc)
        acc = ch.add(acc, base)
    points = jnp.asarray(ec.from_affine_host(fq_spec, pts_host))
    scalars = jnp.asarray(
        ints_to_array([rng.randrange(ctx.curve.fr.modulus) for _ in range(n)],
                      ctx.fr_spec.n_limbs)
    )

    # small window/group counts keep the XLA CPU compile of the bucket
    # graphs test-sized; both sides use identical (c, groups)
    c, groups = 4, 2
    want = jax.jit(
        lambda pt, sc, b: msm.msm_totals(
            fq_spec, b, pt, sc, fr_bits, c=c, groups=groups
        )
    )(points, scalars, b3)

    got = _run_sharded(
        mesh,
        lambda pt, sc, b: pops.pmsm_totals(
            fq_spec, b, pt, sc, fr_bits, axis_name=AXIS, c=c, groups=groups
        ),
        (P(AXIS, None, None), P(AXIS, None), P()),
        P(),
        points,
        scalars,
        b3,
    )
    # window totals are projective points; compare affine (grouping differs)
    want_aff = ec.to_affine_host(fq_spec, np.asarray(want))
    got_aff = ec.to_affine_host(fq_spec, np.asarray(got))
    assert want_aff == got_aff


def test_sharded_fused_core_parity(mesh):
    """The full rounds-1-4 pipeline, sharded vs single-chip, bit-exact.

    Covers: sharded iNTT commits, grand-product scans (pbatch_inverse +
    pprefix_products), the interleaved coset quotient pass with ppermute
    next-taps, quotient splits across shard boundaries, and the collective
    MSM window reduction.
    """
    import __graft_entry__ as ge
    from zkt_plonk_tpu.parallel.prover import ShardedProverCore

    prover, args, _ = ge._build_tiny_prover(table_size=64)
    n = prover.n
    assert n == 64

    # single-chip reference
    statics1 = (prover._plan, prover._q4, prover._tables,
                prover.ck.powers, prover.ck.b3)
    commits1, q_polys1 = jax.jit(prover._fused_core)(*statics1, **args)

    # sharded
    core = ShardedProverCore(prover, mesh)
    statics = core.device_args()
    totals, q_body, q_tail = core.run(statics, args)

    # quotient polys: body (3, n, L) ++ tail (3, 4, L) == (3, n+4, L)
    q2 = np.concatenate([np.asarray(q_body), np.asarray(q_tail)], axis=1)
    np.testing.assert_array_equal(q2, np.asarray(q_polys1))

    # commitments: fold sharded window totals on host, compare affine
    fq_spec = prover.ctx.fq_spec
    Fq = prover.ctx.Fq
    want = ec.to_affine_host(fq_spec, np.asarray(commits1))
    tot_np = np.asarray(totals)
    got = [
        msm.fold_windows_host(fq_spec, Fq, tot_np[i], core.msm_c)
        for i in range(tot_np.shape[0])
    ]
    for i, (w, g) in enumerate(zip(want, got)):
        w2 = None if w is None else (int(w[0]), int(w[1]))
        assert w2 == g, f"commit {i} mismatch"


def test_sharded_full_prove_bit_identical(mesh):
    """A REAL proof produced end-to-end over the mesh (rounds 1-5 +
    openings through ``ShardedProver``), byte-identical to single-chip.

    Covers the prover tail the fused core stops short of: sharded
    multi-point evaluation (``peval_many``), linearization combine, and
    the two opening divisions (``pdivide_by_linear``) + W commits.
    """
    import random as _random

    from zkt_plonk_tpu.commitment import kzg
    from zkt_plonk_tpu.cs import ConstraintSystem, LookupTable, lt
    from zkt_plonk_tpu.parallel.prover import ShardedProver
    from zkt_plonk_tpu.plonk import TRANSCRIPT_LABEL, ZKTPlonk
    from zkt_plonk_tpu.transcript import EthereumTranscript
    from zkt_plonk_tpu.utils import arkserde

    table = LookupTable([1, 2, 5], size=63)
    inst = ZKTPlonk(curve="bn254", table=table)

    class TinyCircuit:
        def synthesize(self, cs):
            a = cs.assign_variable(2)
            b = cs.assign_variable(3)
            c = cs.mul_gate(lt(a), lt(b))
            d = cs.add_gate(lt(c), lt(a))
            cs.set_variable_public(lt(d))
            cs.lookup_constrain(lt(a))

    ck, cvk = kzg.setup(inst.ctx, max_degree=4 * 64, tau=123456789)
    compiled = inst.compile(TinyCircuit(), ck, cvk)
    assert compiled.vk.n == 64

    proof1 = inst.prove(compiled, TinyCircuit(), rng=_random.Random(9))
    inst.verify(compiled, proof1, [8])

    # sharded prove with the identical transcript flow + blinder stream
    from zkt_plonk_tpu.proof_system.prover import Prover

    prover = Prover(compiled.ck, compiled.pk, compiled.epk, compiled.vk, table)
    sp = ShardedProver(prover, mesh, msm_groups=2)
    cs = ConstraintSystem(inst.p, setup=False, lookup_table=table)
    TinyCircuit().synthesize(cs)
    transcript = EthereumTranscript(TRANSCRIPT_LABEL)
    compiled.vk.seed_transcript(transcript)
    proof2 = sp.prove(cs.proving, transcript, _random.Random(9))

    # the sharded proof must verify AND serialize byte-identically
    inst.verify(compiled, proof2, [8])
    p = inst.ctx
    b1 = arkserde.proof_to_bytes(
        proof1, p.curve.fq.modulus, p.curve.fr.modulus
    )
    b2 = arkserde.proof_to_bytes(
        proof2, p.curve.fq.modulus, p.curve.fr.modulus
    )
    assert b1 == b2


def test_batch_prover_data_axis(mesh):
    """Config #5 groundwork (BASELINE.json): k=2 independent proofs over a
    (data=2, poly=4) mesh — each row a full ShardedProver pipeline; both
    proofs verify and match the single-chip prover byte-for-byte."""
    import random as _random

    from zkt_plonk_tpu.commitment import kzg
    from zkt_plonk_tpu.cs import ConstraintSystem, LookupTable, lt
    from zkt_plonk_tpu.parallel.batch import BatchProver
    from zkt_plonk_tpu.plonk import TRANSCRIPT_LABEL, ZKTPlonk
    from zkt_plonk_tpu.proof_system.prover import Prover
    from zkt_plonk_tpu.transcript import EthereumTranscript

    table = LookupTable([1, 2, 5], size=63)
    inst = ZKTPlonk(curve="bn254", table=table)

    class C:
        def __init__(self, a, b):
            self.a, self.b = a, b

        def synthesize(self, cs):
            a = cs.assign_variable(self.a)
            b = cs.assign_variable(self.b)
            c = cs.mul_gate(lt(a), lt(b))
            d = cs.add_gate(lt(c), lt(a))
            cs.set_variable_public(lt(d))
            cs.lookup_constrain(lt(a))

    ck, cvk = kzg.setup(inst.ctx, max_degree=4 * 64, tau=42424242)
    compiled = inst.compile(C(2, 5), ck, cvk)
    prover = Prover(compiled.ck, compiled.pk, compiled.epk, compiled.vk, table)

    mesh2d = Mesh(mesh.devices.reshape(2, 4), ("data", "poly"))
    bp = BatchProver(prover, mesh2d, msm_groups=2)

    witnesses = [C(2, 5), C(1, 5)]
    pubs = [[12], [6]]
    composers, transcripts, rngs = [], [], []
    for i, w in enumerate(witnesses):
        cs = ConstraintSystem(inst.p, setup=False, lookup_table=table)
        w.synthesize(cs)
        t = EthereumTranscript(TRANSCRIPT_LABEL)
        compiled.vk.seed_transcript(t)
        composers.append(cs.proving)
        transcripts.append(t)
        rngs.append(_random.Random(100 + i))

    proofs = bp.prove_batch(composers, transcripts, rngs)
    for proof, pi in zip(proofs, pubs):
        inst.verify(compiled, proof, pi)

    # byte parity vs single chip at the same seeds
    from zkt_plonk_tpu.utils import arkserde

    for i, w in enumerate(witnesses):
        ref = inst.prove(compiled, w, rng=_random.Random(100 + i))
        fq, fr = inst.ctx.curve.fq.modulus, inst.ctx.curve.fr.modulus
        assert arkserde.proof_to_bytes(proofs[i], fq, fr) == \
            arkserde.proof_to_bytes(ref, fq, fr)


@pytest.mark.skipif(
    not __import__("os").environ.get("ZKT_RUN_SLOW"),
    reason="larger-n shard-boundary parity: extra full compile of the "
    "sharded core at a second shape (~10 min cold on 2-core CPU); "
    "set ZKT_RUN_SLOW=1",
)
def test_sharded_fused_core_parity_large(mesh):
    """Shard-boundary logic (_patch_rows, quotient split rolls) at a
    non-toy size: n=1024, m=128 rows/device."""
    import __graft_entry__ as ge
    from zkt_plonk_tpu.parallel.prover import ShardedProverCore

    prover, args, _ = ge._build_tiny_prover(table_size=1023)
    n = prover.n
    assert n == 1024

    statics1 = (prover._plan, prover._q4, prover._tables,
                prover.ck.powers, prover.ck.b3)
    commits1, q_polys1 = jax.jit(prover._fused_core)(*statics1, **args)

    core = ShardedProverCore(prover, mesh)
    statics = core.device_args()
    totals, q_body, q_tail = core.run(statics, args)

    q2 = np.concatenate([np.asarray(q_body), np.asarray(q_tail)], axis=1)
    np.testing.assert_array_equal(q2, np.asarray(q_polys1))

    fq_spec = prover.ctx.fq_spec
    Fq = prover.ctx.Fq
    want = ec.to_affine_host(fq_spec, np.asarray(commits1))
    tot_np = np.asarray(totals)
    got = [
        msm.fold_windows_host(fq_spec, Fq, tot_np[i], core.msm_c)
        for i in range(tot_np.shape[0])
    ]
    for i, (w, g) in enumerate(zip(want, got)):
        w2 = None if w is None else (int(w[0]), int(w[1]))
        assert w2 == g, f"commit {i} mismatch"
