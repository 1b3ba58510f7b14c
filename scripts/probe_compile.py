"""Micro-probe: XLA:CPU compile time of individual sharded-prover pieces.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
       python scripts/probe_compile.py [piece ...]
Pieces: mul ifft commit zr qr ev opn   (default: mul ifft commit)
Each piece compiles in THIS process with a throwaway cache dir, so timings
are cold and additive only within one invocation.
"""

import os
import sys
import time

os.environ.setdefault("ZKT_PLONK_XLA_CACHE", "/tmp/probe_cache_%d" % os.getpid())

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields import device as fd

D = 8
M = 32  # shard rows (n = 256)


def timeit(name, fn):
    t0 = time.time()
    r = fn()
    jax.tree_util.tree_map(lambda x: np.asarray(x), r)
    print(f"{name}: {time.time()-t0:.1f}s", flush=True)


def main():
    pieces = sys.argv[1:] or ["mul", "ifft", "commit"]
    mesh = Mesh(np.asarray(jax.devices()[:D]), ("poly",))
    spec = make_spec(BN254_FR)
    p = spec.modulus

    import random
    from zkt_plonk_tpu.fields.limbs import ints_to_array

    rng = random.Random(0)
    enc = lambda k: jnp.asarray(
        ints_to_array([rng.randrange(p) for _ in range(k)], spec.n_limbs)
    )

    if "mul" in pieces:
        def body(a, b):
            return fd.mul(spec, a, b)

        f = jax.jit(jax.shard_map(body, mesh=mesh,
                                  in_specs=(P("poly", None), P("poly", None)),
                                  out_specs=P("poly", None)))
        timeit("one shard_map mul", lambda: f(enc(D * M), enc(D * M)))

    if "ifft" in pieces:
        from zkt_plonk_tpu.parallel import ops as pops
        from zkt_plonk_tpu.utils.domain import make_domain

        dom = make_domain(BN254_FR, D * M)
        st = pops.build_shard_ntt_tables(dom, D)
        st_dev = jax.tree_util.tree_map(jnp.asarray, st)
        sp = pops.shard_ntt_specs("poly")

        def body(st_, x):
            return pops.pifft(spec, st_, x, "poly")

        f = jax.jit(jax.shard_map(body, mesh=mesh,
                                  in_specs=(sp, P(None, "poly", None)),
                                  out_specs=P(None, "poly", None),
                                  check_vma=False))
        timeit("pifft (9 batched)", lambda: f(st_dev, enc(9 * D * M).reshape(9, D * M, -1)))

    if "commit" in pieces:
        from zkt_plonk_tpu.curves import make_context
        from zkt_plonk_tpu.parallel import ops as pops
        from zkt_plonk_tpu.ops import msm as msm_mod, ec

        ctx = make_context("bn254")
        fq_spec = ctx.fq_spec
        fr_bits = ctx.curve.fr.modulus.bit_length()
        c = msm_mod.msm_window_size(D * M + 4)
        b3 = ec.b3_const(fq_spec, ctx.curve.b)
        pts = ec.identity(fq_spec, (D * M,)) + jnp.zeros((1,), jnp.uint32)
        tail = ec.identity(fq_spec, (4,)) + jnp.zeros((1,), jnp.uint32)

        def body(b3_, pb, pt, cb, ct):
            return pops.pcommit_totals(
                fq_spec, b3_, pb, pt, cb, ct, fr_bits, c=c, axis_name="poly",
                groups=2,
            )

        f = jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P("poly", None, None), P(), P("poly", None), P()),
            out_specs=P(), check_vma=False))
        timeit("pcommit_totals x1",
               lambda: f(b3, pts, tail, enc(D * M), enc(4)))

    if {"pinv", "pprod", "inv"} & set(pieces):
        probe_zr_pieces(mesh, spec, enc)

    if {"acc", "reduce", "digits", "msm1"} & set(pieces):
        from zkt_plonk_tpu.curves import make_context
        from zkt_plonk_tpu.ops import msm as msm_mod, ec

        ctx = make_context("bn254")
        fq_spec = ctx.fq_spec
        fr_bits = ctx.curve.fr.modulus.bit_length()
        c = msm_mod.msm_window_size(D * M + 4)
        b3 = ec.b3_const(fq_spec, ctx.curve.b)
        n = D * M
        pts = ec.identity(fq_spec, (n,)) + jnp.zeros((1,), jnp.uint32)
        G = 2

        if "digits" in pieces:
            f = jax.jit(lambda s: msm_mod.signed_window_digits(s, c, fr_bits))
            timeit("signed_window_digits", lambda: f(enc(n)))

        if "acc" in pieces:
            f = jax.jit(
                lambda p_, s_: msm_mod._accumulate(fq_spec, b3, p_, s_, fr_bits, c, G)
            )
            timeit("_accumulate (single dev jit)", lambda: f(pts, enc(n)))

        if "reduce" in pieces:
            K = (1 << (c - 1)) + 1
            W = msm_mod.num_windows(fr_bits + 1, c)
            bk = ec.identity(fq_spec, (W, G, K)) + jnp.zeros((1,), jnp.uint32)
            f = jax.jit(lambda b: msm_mod._reduce_buckets(fq_spec, b3, b))
            timeit("_reduce_buckets (single dev jit)", lambda: f(bk))

        if "msm1" in pieces:
            f = jax.jit(
                lambda p_, s_: msm_mod.msm_totals(
                    fq_spec, b3, p_, s_, fr_bits, c=c, groups=G
                )
            )
            timeit("msm_totals (single dev jit)", lambda: f(pts, enc(n)))


def probe_zr_pieces(mesh, spec, enc):
    """Isolate zr subgraphs: batch-inverse, prefix-products, z-evals."""
    import jax
    from jax.sharding import PartitionSpec as P
    from zkt_plonk_tpu.parallel import ops as pops
    from zkt_plonk_tpu.fields import device as fdd

    which = set(sys.argv[1:])
    if "pinv" in which:
        f = jax.jit(jax.shard_map(
            lambda x: pops.pbatch_inverse(spec, x, axis=1, axis_name="poly"),
            mesh=mesh, in_specs=(P(None, "poly", None),),
            out_specs=P(None, "poly", None), check_vma=False))
        timeit("pbatch_inverse", lambda: f(enc(2 * D * M).reshape(2, D * M, -1)))
    if "pprod" in which:
        f = jax.jit(jax.shard_map(
            lambda x: pops.pprefix_products(spec, x, axis=1, axis_name="poly"),
            mesh=mesh, in_specs=(P(None, "poly", None),),
            out_specs=P(None, "poly", None), check_vma=False))
        timeit("pprefix_products", lambda: f(enc(2 * D * M).reshape(2, D * M, -1)))
    if "inv" in which:
        f = jax.jit(jax.shard_map(
            lambda x: fdd.inv(spec, x),
            mesh=mesh, in_specs=(P("poly", None),),
            out_specs=P("poly", None), check_vma=False))
        timeit("fd.inv (fermat fori)", lambda: f(enc(D * M)))


if __name__ == "__main__":
    main()
