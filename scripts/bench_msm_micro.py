"""Microbenchmark the MSM bucket-accumulation loop body on TPU.

Variants:
  A. fori_loop whose body is ONLY the fused pallas EC add (compute floor)
  B. full accumulation body: gather from buckets + add + scatter back
  C. B but with buckets in coordinate-major (3, L, M) layout (lane
     gather/scatter, no per-iteration transposes)

Usage: python scripts/bench_msm_micro.py [S] [W] [G] [K]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from zkt_plonk_tpu.curves import make_context
from zkt_plonk_tpu.ops import ec, ec_pallas


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(jax.device_get(jnp.ravel(leaf)[:4]))


def main():
    S = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 43
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    ctx = make_context("bn254")
    spec = ctx.fq_spec
    L = spec.n_limbs
    b3 = ec.b3_const(spec, ctx.curve.b)
    rng = np.random.default_rng(0)

    print(f"backend={jax.default_backend()} S={S} W={W} G={G} K={K}", flush=True)

    # fake (but in-range) points: the generator broadcast everywhere
    gpt = ec.from_affine_host(spec, [ctx.g1])[0]
    pts = jnp.asarray(np.broadcast_to(gpt, (S, G, 3, L)).copy())
    digs = jnp.asarray(rng.integers(0, K, size=(W, S, G), dtype=np.uint32))

    only = sys.argv[5] if len(sys.argv) > 5 else ""

    def run(f, args, label, iters=3):
        if only and only not in label:
            return None
        r = f(*args)
        sync(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        sync(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt*1e3:8.1f} ms  ({dt/S*1e6:.0f} us/iter)", flush=True)
        return dt

    # --- A: adds only ------------------------------------------------------
    def loop_a(pts, b3):
        state = ec.identity(spec, (W, G))

        def body(j, st):
            return ec_pallas.add(spec, b3, st, pts[j][None])

        return jax.lax.fori_loop(0, S, body, state)

    run(jax.jit(loop_a), (pts, b3), "A add-only      ")

    # --- B: element-major gather/add/scatter --------------------------------
    w_idx = jnp.arange(W)[:, None]
    g_idx = jnp.arange(G)[None, :]

    def loop_b(pts, digs, b3):
        buckets = ec.identity(spec, (W, G, K))

        def body(j, bk):
            d_j = digs[:, j, :]
            cur = bk[w_idx, g_idx, d_j]
            upd = ec_pallas.add(spec, b3, cur, pts[j][None])
            return bk.at[w_idx, g_idx, d_j].set(upd)

        return jax.lax.fori_loop(0, S, body, buckets)

    run(jax.jit(loop_b), (pts, digs, b3), "B elem-major    ")

    # --- C: coord-major lane gather/scatter ---------------------------------
    M = W * G * K
    base = (jnp.arange(W)[:, None] * G + jnp.arange(G)[None, :]) * K  # (W, G)
    pts_cm = jnp.asarray(
        np.broadcast_to(gpt.T[None], (S, L, 3)).transpose(0, 2, 1)[:, :, :, None]
        .repeat(G, axis=3)
        .copy()
    )  # (S, 3, L, G)
    id_cm = np.zeros((3, L, M), np.uint32)
    id_cm[1, 0, :] = 1

    def loop_c(pts_cm, digs, b3):
        buckets = jnp.asarray(id_cm)

        def body(j, bk):
            flat = (base + digs[:, j, :]).reshape(W * G)
            cur = bk[:, :, flat]
            p_t = jnp.tile(pts_cm[j], (1, 1, W))
            upd = ec_pallas.add_cm(spec, b3, cur, p_t)
            return bk.at[:, :, flat].set(upd)

        return jax.lax.fori_loop(0, S, body, buckets)

    if hasattr(ec_pallas, "add_cm"):
        run(jax.jit(loop_c), (pts_cm, digs, b3), "C coord-major   ")

    # --- D: element-major + unique/in-bounds hints ---------------------------
    def loop_d(pts, digs, b3):
        buckets = ec.identity(spec, (W, G, K))

        def body(j, bk):
            d_j = digs[:, j, :]
            cur = bk.at[w_idx, g_idx, d_j].get(
                mode="promise_in_bounds", unique_indices=True
            )
            upd = ec_pallas.add(spec, b3, cur, pts[j][None])
            return bk.at[w_idx, g_idx, d_j].set(
                upd, mode="promise_in_bounds", unique_indices=True
            )

        return jax.lax.fori_loop(0, S, body, buckets)

    run(jax.jit(loop_d), (pts, digs, b3), "D hints         ")

    # --- E: flat leading-axis rows + 1D indices + hints ----------------------
    base_f = ((jnp.arange(W)[:, None] * G + jnp.arange(G)[None, :]) * K).reshape(-1)

    def loop_e(pts, digs, b3):
        buckets = ec.identity(spec, (W * G * K,))

        def body(j, bk):
            flat = base_f + digs[:, j, :].reshape(-1)
            cur = bk.at[flat].get(mode="promise_in_bounds", unique_indices=True)
            upd = ec_pallas.add(
                spec, b3, cur.reshape(W, G, 3, L), pts[j][None]
            ).reshape(W * G, 3, L)
            return bk.at[flat].set(upd, mode="promise_in_bounds", unique_indices=True)

        return jax.lax.fori_loop(0, S, body, buckets)

    run(jax.jit(loop_e), (pts, digs, b3), "E flat+hints    ")

    # --- F: gather-only / scatter-only split ---------------------------------
    def loop_f_gather(pts, digs, b3):
        buckets = ec.identity(spec, (W, G, K))

        def body(j, carry):
            bk, acc = carry
            d_j = digs[:, j, :]
            cur = bk[w_idx, g_idx, d_j]
            acc = ec_pallas.add(spec, b3, acc, cur)
            return (bk, acc)

        return jax.lax.fori_loop(
            0, S, body, (buckets, ec.identity(spec, (W, G)))
        )[1]

    run(jax.jit(loop_f_gather), (pts, digs, b3), "F gather+add    ")

    def loop_f_scatter(pts, digs, b3):
        buckets = ec.identity(spec, (W, G, K))

        def body(j, bk):
            d_j = digs[:, j, :]
            upd = ec_pallas.add(spec, b3, bk[:, :, 0], pts[j][None])
            return bk.at[w_idx, g_idx, d_j].set(upd)

        return jax.lax.fori_loop(0, S, body, buckets)

    run(jax.jit(loop_f_scatter), (pts, digs, b3), "F scatter+add   ")

    # --- I: pure scatter, no read of the bucket tensor at all ----------------
    def loop_i(pts, digs):
        buckets = ec.identity(spec, (W, G, K))

        def body(j, bk):
            d_j = digs[:, j, :]
            upd = jnp.broadcast_to(pts[j][None], (W, G, 3, L))
            return bk.at[w_idx, g_idx, d_j].set(upd)

        return jax.lax.fori_loop(0, S, body, buckets)

    run(jax.jit(loop_i), (pts, digs), "I scatter only  ")

    # --- I2: same but 2x bucket tensor (K doubled) — copy-cost probe ---------
    def loop_i2(pts, digs):
        buckets = ec.identity(spec, (W, G, 2 * K))

        def body(j, bk):
            d_j = digs[:, j, :]
            upd = jnp.broadcast_to(pts[j][None], (W, G, 3, L))
            return bk.at[w_idx, g_idx, d_j].set(upd)

        return jax.lax.fori_loop(0, S, body, buckets)

    run(jax.jit(loop_i2), (pts, digs), "I2 scatter 2xK  ")

    # --- I3: half the steps, double rows per scatter — per-op cost probe -----
    def loop_i3(pts, digs):
        buckets = ec.identity(spec, (W, G, K))
        w2 = jnp.arange(W)[:, None, None]
        g2 = jnp.arange(G)[None, None, :]

        def body(j, bk):
            d_j = jax.lax.dynamic_slice_in_dim(digs, 2 * j, 2, axis=1)  # (W, 2, G)
            p2 = jax.lax.dynamic_index_in_dim(pts, 2 * j, keepdims=False)
            upd = jnp.broadcast_to(p2[None, None], (W, 2, G, 3, L))
            return bk.at[w2, g2, d_j].set(upd)

        return jax.lax.fori_loop(0, S // 2, body, buckets)

    run(jax.jit(loop_i3), (pts, digs), "I3 2 rows/scat  ")


if __name__ == "__main__":
    main()
