"""TPU sweep of the MSM (c, G) parameter space with the work-efficient
bucket reduce.  Amortized timing: K inner iterations per measurement, the
~27ms relay round-trip floor subtracted via a calibration measurement.

Usage: python scripts/bench_msm_sweep2.py [log_n] [c1,c2,...]
"""

import sys
import time
import random

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    cs = [int(c) for c in sys.argv[2].split(",")] if len(sys.argv) > 2 else [6, 8, 10, 12]
    gs = [int(g) for g in sys.argv[3].split(",")] if len(sys.argv) > 3 else [16, 32, 64]
    n = 1 << log_n

    from zkt_plonk_tpu.curves import make_context
    from zkt_plonk_tpu.fields.limbs import ints_to_array
    from zkt_plonk_tpu.ops import ec, msm

    ctx = make_context("bn254")
    fq_spec = ctx.fq_spec
    fr = ctx.curve.fr
    b3 = ec.b3_const(fq_spec, ctx.curve.b)
    rng = random.Random(0)

    # tile 1024 distinct points (algorithms don't exploit duplicates)
    from zkt_plonk_tpu.curves import curve_host as ch
    base_pts = []
    acc = ctx.g1
    for _ in range(1024):
        base_pts.append(acc)
        acc = ch.add(acc, ctx.g1)
    P = jnp.asarray(np.tile(ec.from_affine_host(fq_spec, base_pts), (n // 1024, 1, 1)))
    S = jnp.asarray(
        ints_to_array([rng.randrange(fr.modulus) for _ in range(n)],
                      ctx.fr_spec.n_limbs)
    )

    # relay floor calibration
    trivial = jax.jit(lambda x: x + 1)
    t = trivial(jnp.ones((8,), jnp.uint32))
    sync(t)
    floors = []
    for _ in range(5):
        t0 = time.time(); sync(trivial(t)); floors.append(time.time() - t0)
    floor = sorted(floors)[2]
    print(f"relay floor: {floor*1e3:.1f} ms", file=sys.stderr)

    fr_bits = fr.modulus.bit_length()
    for c in cs:
        for G in gs:
            f = jax.jit(
                lambda pts, sc, b, c=c, G=G: msm.msm_totals(
                    fq_spec, b, pts, sc, fr_bits, c=c, groups=G
                )
            )
            try:
                out = f(P, S, b3)
                sync(out)
            except Exception as e:
                print(f"c={c} G={G}: FAIL {type(e).__name__}", file=sys.stderr)
                continue
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                out = f(P, S, b3)
            sync(out)
            dt = (time.time() - t0 - floor) / reps
            print(f"n=2^{log_n} c={c:2d} G={G:3d}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
