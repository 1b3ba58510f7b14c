"""MR pallas NTT vs fori-loop NTT on the active backend: parity + timing.

Usage: python scripts/bench_ntt_mr.py [log_ns] [which]
  log_ns: comma list, default "12,14,16"
  which:  fwd|inv|coset_fwd|coset_inv|all (default fwd)
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields.limbs import ints_to_array
from zkt_plonk_tpu.ops import ntt, ntt_mr
from zkt_plonk_tpu.utils.domain import make_domain


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


BASE = {
    "fwd": (ntt.fft, "fwd"),
    "inv": (ntt.ifft, "inv"),
    "coset_fwd": (ntt.coset_fft, "coset_fwd"),
    "coset_inv": (ntt.coset_ifft, "coset_inv"),
}


def main():
    log_ns = [int(v) for v in (sys.argv[1] if len(sys.argv) > 1 else "12,14,16").split(",")]
    which = sys.argv[2] if len(sys.argv) > 2 else "fwd"
    dirs = list(BASE) if which == "all" else [which]

    spec = make_spec(BN254_FR)
    p = spec.modulus
    rng = random.Random(0)
    print(f"backend={jax.default_backend()}", flush=True)

    for lg in log_ns:
        n = 1 << lg
        dom = make_domain(BN254_FR, n)
        plan = dom.plan_device()
        base = ints_to_array([rng.randrange(p) for _ in range(4096)], spec.n_limbs)
        x = jnp.asarray(np.tile(base, (max(1, n // 4096), 1))[:n])

        for d in dirs:
            ref_fn, attr = BASE[d]
            f_ref = jax.jit(lambda pl_, c: ref_fn(dom.spec, pl_, c))
            f_mr = jax.jit(
                lambda pl_, c, attr=attr: ntt_mr.transform(
                    spec, getattr(pl_.mr, attr), c, use_kernel=True
                )
            )
            try:
                t0 = time.perf_counter()
                r_mr = f_mr(plan, x)
                sync(r_mr)
                comp = time.perf_counter() - t0
            except Exception as e:  # noqa
                print(f"2^{lg} {d}: MR FAILED {type(e).__name__}: {str(e)[:160]}")
                continue
            r_ref = f_ref(plan, x)
            sync(r_ref)
            ok = bool(jnp.array_equal(r_mr, r_ref))

            iters = 10
            t0 = time.perf_counter()
            out = x
            for _ in range(iters):
                out = f_ref(plan, out)
            sync(out)
            t_ref = (time.perf_counter() - t0) / iters
            t0 = time.perf_counter()
            out = x
            for _ in range(iters):
                out = f_mr(plan, out)
            sync(out)
            t_mr = (time.perf_counter() - t0) / iters
            print(
                f"2^{lg} {d}: parity={'OK' if ok else 'MISMATCH'}  "
                f"fori {t_ref*1e3:7.2f} ms  MR {t_mr*1e3:7.2f} ms  "
                f"({t_ref/t_mr:.2f}x)  [mr compile {comp:.0f}s]",
                flush=True,
            )


if __name__ == "__main__":
    main()
