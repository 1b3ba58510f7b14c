"""Lower each ShardedProver program and report StableHLO op counts.

XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/probe_lower.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from __graft_entry__ import _build_tiny_prover
from zkt_plonk_tpu.parallel.prover import ShardedProver


def count(name, traced):
    txt = traced.as_text()
    n = sum(1 for l in txt.splitlines() if "= stablehlo" in l or " = \"" in l)
    print(f"{name}: {n} stablehlo ops, {txt.count(chr(10))} lines", flush=True)


def main():
    t0 = time.time()
    prover, args, ex = _build_tiny_prover(table_size=64)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("poly",))
    sp = ShardedProver(prover, mesh, msm_groups=2)
    print(f"build: {time.time()-t0:.1f}s", flush=True)

    spec = prover.spec
    m = sp.m
    L = spec.n_limbs
    z = lambda *s: jnp.zeros(s, jnp.uint32)

    count("r12", sp._r12.trace(
        sp._st, z(3, 8 * m, L), z(3, 8 * m, L), z(8 * m, L), z(3, 4, L), z(3, 4, L)
    ).lower())
    count("zr", sp._zr.trace(
        sp._st, sp._tables, z(3, 8 * m, L), z(8 * m, L), z(8 * m, L),
        z(8 * m, L), z(8 * m, L), z(8, L), z(2, 4, L)
    ).lower())
    count("qr", sp._qr.trace(
        sp._st, sp._q4, sp._tables, z(7, 8 * m, L), z(7, 4, L),
        z(2, 8 * m, L), z(2, 4, L), z(7, L), z(7, L), z(2, L)
    ).lower())
    count("ev", sp._ev.trace(
        z(8, 8 * m, L), z(8, 4, L), z(4, 8 * m, L), z(4, 4, L), z(L), z(L)
    ).lower())
    count("opn", sp._opn.trace(
        z(13, 8 * m, L), z(13, 4, L), z(13, L),
        z(8, 8 * m, L), z(8, 4, L), z(4, 8 * m, L), z(4, 4, L),
        z(9, L), z(4, L), z(L), z(L), z(L), z(L)
    ).lower())
    count("commit1", sp._commit1.trace(
        sp._pwb, sp._pwt, sp._b3, z(8 * m, L), z(4, L)
    ).lower())


if __name__ == "__main__":
    main()
