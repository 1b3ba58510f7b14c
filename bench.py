"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: single-chip NTT(2^14) + KZG-commit(2^14) pipeline throughput
(BASELINE.md config #2).  The reference publishes no numbers
(BASELINE.md: README "Performance: TODO", empty bench file), so
``vs_baseline`` is null until a measured CPU reference baseline exists.

Extra sub-metrics (field-mul throughput, NTT sizes, MSM) go to stderr for
human inspection; stdout carries exactly the one JSON line.
"""

import json
import random
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x):
    """Honest device sync: block_until_ready is a no-op through the axon
    relay (it measures dispatch, not execution). Pull a few real elements
    through device_get to force execution to finish."""
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


def main():
    import jax
    import jax.numpy as jnp

    from zkt_plonk_tpu.fields import BN254_FR, make_spec
    from zkt_plonk_tpu.fields import device as fd
    from zkt_plonk_tpu.fields.limbs import ints_to_array
    from zkt_plonk_tpu.ops import ntt
    from zkt_plonk_tpu.utils.domain import make_domain

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    spec = make_spec(BN254_FR)
    p = spec.modulus
    rng = random.Random(0)

    # --- field mul throughput --------------------------------------------
    n = 1 << 20
    base = ints_to_array([rng.randrange(p) for _ in range(1024)], spec.n_limbs)
    A = jnp.asarray(np.tile(base, (n // 1024, 1)))
    mulf = jax.jit(lambda x, y: fd.mul(spec, x, y))
    sync(mulf(A, A))
    t0 = time.time()
    iters = 20
    C = A
    for _ in range(iters):
        C = mulf(C, A)
    sync(C)
    mul_rate = n * iters / (time.time() - t0)
    log(f"field mul 2^20: {mul_rate/1e9:.2f} G/s")

    # --- NTT 2^14 ---------------------------------------------------------
    n_ntt = 1 << 14
    dom = make_domain(BN254_FR, n_ntt)
    coeffs = jnp.asarray(
        np.tile(ints_to_array([rng.randrange(p) for _ in range(1024)], spec.n_limbs),
                (n_ntt // 1024, 1))
    )
    plan = dom.plan_device()
    fftf = jax.jit(lambda pl, c: ntt.fft(dom.spec, pl, c))
    sync(fftf(plan, coeffs))
    t0 = time.time()
    iters = 10
    out = coeffs
    for _ in range(iters):
        out = fftf(plan, out)
    sync(out)
    ntt_time = (time.time() - t0) / iters
    log(f"NTT 2^14: {ntt_time*1e3:.2f} ms -> {1/ntt_time:.1f} NTT/s")

    # --- KZG commit (MSM) 2^14 -------------------------------------------
    from zkt_plonk_tpu.commitment import kzg
    from zkt_plonk_tpu.curves import make_context

    ctx = make_context("bn254")
    ck, _ = kzg.setup(ctx, max_degree=n_ntt, tau=987654321)
    committer = kzg.Committer(ck)
    scalars = jnp.asarray(
        np.tile(ints_to_array([rng.randrange(p) for _ in range(1024)], spec.n_limbs),
                (n_ntt // 1024, 1))
    )
    # the real product path: device window totals + host Horner fold
    r = committer.commit_many([scalars])
    t0 = time.time()
    iters = 3
    for _ in range(iters):
        r = committer.commit_many([scalars])
    msm_time = (time.time() - t0) / iters
    log(f"KZG commit 2^14 (Pippenger MSM): {msm_time*1e3:.1f} ms")

    pipeline_per_s = 1.0 / (ntt_time + msm_time)
    print(
        json.dumps(
            {
                "metric": "ntt14_plus_kzg_commit14_pipeline",
                "value": round(pipeline_per_s, 3),
                "unit": "ops/s/chip",
                "vs_baseline": None,
                "detail": {
                    "backend": backend,
                    "field_mul_G_per_s": round(mul_rate / 1e9, 2),
                    "ntt_2e14_ms": round(ntt_time * 1e3, 2),
                    "msm_2e14_ms": round(msm_time * 1e3, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
