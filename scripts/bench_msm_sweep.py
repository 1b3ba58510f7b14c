"""Sweep Pippenger MSM (c, groups) parameters on the active backend.

Usage: python scripts/bench_msm_sweep.py [log_n] [iters]

Times the full variable-base MSM at each (c, G) config, plus a component
breakdown (accumulation / merge / reduction) for the best config.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from zkt_plonk_tpu.curves import make_context
from zkt_plonk_tpu.commitment import kzg
from zkt_plonk_tpu.fields.limbs import ints_to_array
from zkt_plonk_tpu.ops import msm


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = 1 << lg
    print(f"backend={jax.default_backend()} n=2^{lg} iters={iters}", flush=True)

    ctx = make_context("bn254")
    p = ctx.curve.fr.modulus
    rng = random.Random(0)
    t0 = time.perf_counter()
    if os.environ.get("MSM_SWEEP_FAKE_SRS", "1") == "1":
        # timing only: EC ops are data-independent, so tiled host points
        # are as good as a real SRS and skip its cold-compile cost
        from zkt_plonk_tpu.curves import host as ch_host
        from zkt_plonk_tpu.ops import ec as ec_mod
        import jax.numpy as _jnp

        base_pts = [
            ch_host.scalar_mul(ctx.g1, rng.randrange(1, p)) for _ in range(64)
        ]
        arr = ec_mod.from_affine_host(ctx.fq_spec, base_pts)
        powers = _jnp.asarray(np.tile(arr, (n // 64 + 1, 1, 1))[: n + 1])
        from zkt_plonk_tpu.ops import ec as _ec

        class CK:
            pass

        ck = CK()
        ck.powers = powers
        ck.b3 = _ec.b3_const(ctx.fq_spec, ctx.curve.b)
    else:
        ck, _ = kzg.setup(ctx, max_degree=n, tau=987654321)
    sync(ck.powers)
    print(f"setup: {time.perf_counter()-t0:.1f}s", flush=True)

    base = ints_to_array([rng.randrange(p) for _ in range(4096)], ctx.fr_spec.n_limbs)
    scalars = jnp.asarray(np.tile(base, (n // 4096, 1)))
    fr_bits = p.bit_length()

    if len(sys.argv) > 3:
        configs = [
            tuple(int(v) for v in part.split(","))
            for part in sys.argv[3].split(";")
        ]
    else:
        configs = [(6, 128), (6, 64), (6, 32), (7, 64), (7, 32), (8, 64), (8, 32), (8, 16)]
    results = {}
    for c, G in configs:
        f = jax.jit(
            lambda pw, s, b3, c=c, G=G: msm.msm(
                ctx.fq_spec, b3, pw, s, fr_bits, c=c, groups=G
            )
        )
        try:
            t0 = time.perf_counter()
            r = f(ck.powers[:n], scalars, ck.b3)
            sync(r)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(ck.powers[:n], scalars, ck.b3)
            sync(r)
            dt = (time.perf_counter() - t0) / iters
            results[(c, G)] = dt
            print(f"c={c} G={G:4d}: {dt*1e3:8.1f} ms   (compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa
            print(f"c={c} G={G:4d}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

    if results:
        best = min(results, key=results.get)
        print(f"best: c={best[0]} G={best[1]} -> {results[best]*1e3:.1f} ms")

        # component breakdown at the best config
        c, G = best
        acc = jax.jit(
            lambda pw, s, b3: msm._accumulate(ctx.fq_spec, b3, pw, s, fr_bits, c, G)
        )
        red = jax.jit(lambda bk, b3: msm._reduce_buckets(ctx.fq_spec, b3, bk))
        fold = jax.jit(lambda t, b3: msm._fold_windows(ctx.fq_spec, b3, t, c))

        bk = acc(ck.powers[:n], scalars, ck.b3)
        sync(bk)
        t0 = time.perf_counter()
        for _ in range(iters):
            bk = acc(ck.powers[:n], scalars, ck.b3)
        sync(bk)
        t_acc = (time.perf_counter() - t0) / iters

        tt = red(bk, ck.b3)
        sync(tt)
        t0 = time.perf_counter()
        for _ in range(iters):
            tt = red(bk, ck.b3)
        sync(tt)
        t_red = (time.perf_counter() - t0) / iters

        r = fold(tt, ck.b3)
        sync(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fold(tt, ck.b3)
        sync(r)
        t_fold = (time.perf_counter() - t0) / iters
        print(
            f"breakdown c={c} G={G}: accumulate {t_acc*1e3:.1f} ms, "
            f"reduce {t_red*1e3:.1f} ms, fold {t_fold*1e3:.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
