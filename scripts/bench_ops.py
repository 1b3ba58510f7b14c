"""Profile NTT and MSM on the active backend at BASELINE.md target sizes."""

import random
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields.limbs import ints_to_array
from zkt_plonk_tpu.ops import ntt
from zkt_plonk_tpu.utils.domain import make_domain


def timeit_chained(fn, state, *args, iters=10):
    """Time fn by chaining its output into the next call (true serial cost)."""
    out = fn(state, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(out, *args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    spec = make_spec(BN254_FR)
    p = spec.modulus
    rng = random.Random(0)
    print(f"backend={jax.default_backend()}")

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("ntt", "all"):
        for lg in (14, 16, 18, 20):
            n = 1 << lg
            dom = make_domain(BN254_FR, n)
            base = ints_to_array([rng.randrange(p) for _ in range(4096)], spec.n_limbs)
            coeffs = jnp.asarray(np.tile(base, (n // 4096, 1)))
            plan = dom.plan_device()
            f = jax.jit(lambda c, pl: ntt.fft(dom.spec, pl, c))
            dt = timeit_chained(f, coeffs, plan, iters=10)
            print(f"NTT 2^{lg}: {dt*1e3:8.3f} ms  ({n/dt/1e6:.0f} Mpt/s)")

    if which in ("msm", "all"):
        from zkt_plonk_tpu.commitment import kzg
        from zkt_plonk_tpu.curves import make_context

        ctx = make_context("bn254")
        for lg in (14, 16, 18, 20):
            n = 1 << lg
            t0 = time.perf_counter()
            ck, _ = kzg.setup(ctx, max_degree=n, tau=987654321)
            print(f"  setup 2^{lg}: {time.perf_counter()-t0:.1f}s")
            base = ints_to_array([rng.randrange(p) for _ in range(4096)], spec.n_limbs)
            poly = jnp.asarray(np.tile(base, (n // 4096, 1)))
            committer = kzg.Committer(ck)
            c0 = committer.commit_many([poly])
            t0 = time.perf_counter()
            iters = 5
            for _ in range(iters):
                c = committer.commit_many([poly])
            dt = (time.perf_counter() - t0) / iters
            print(f"MSM 2^{lg}: {dt*1e3:8.2f} ms  ({n/dt/1e6:.1f} Mpt/s)")


if __name__ == "__main__":
    main()
