"""Microbenchmark: element-major (n, L) vs limb-major (L, n) field mul.

The current fields/device.py layout puts the L=16 limb axis last, which
underuses the 128-wide VPU lanes.  This script measures a limb-major
prototype (limb axis -2, element axis -1) against the production mul on
whatever backend is active (run on TPU to decide the migration).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields import device as fd
from zkt_plonk_tpu.fields.limbs import LIMB_BITS, LIMB_MASK, ints_to_array

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)


# --- limb-major prototype (limb axis -2, element axis -1) -----------------

def _shift_up_lm(x, d):
    pad = [(0, 0)] * x.ndim
    pad[-2] = (d, 0)
    return jnp.pad(x, pad)[..., : x.shape[-2], :]


def _ks_carries_lm(g, p):
    n = g.shape[-2]
    d = 1
    while d < n:
        g = g | (p & _shift_up_lm(g, d))
        p = p & _shift_up_lm(p, d)
        d <<= 1
    return _shift_up_lm(g, 1)


def _carry_propagate_lm(cols, out_len):
    k = cols.shape[-2]
    if k < out_len:
        pad = [(0, 0)] * cols.ndim
        pad[-2] = (0, out_len - k)
        cols = jnp.pad(cols, pad)
    else:
        cols = cols[..., :out_len, :]
    s = (cols & MASK) + _shift_up_lm(cols >> LIMB_BITS, 1)
    s = (s & MASK) + _shift_up_lm(s >> LIMB_BITS, 1)
    g = s >> LIMB_BITS
    limb = s & MASK
    p = (limb == MASK).astype(U32)
    carry_in = _ks_carries_lm(g, p)
    return (limb + carry_in) & MASK


def _sub_with_borrow_lm(a, b):
    t = a + np.uint32(1 << LIMB_BITS) - b
    limb = t & MASK
    g = np.uint32(1) - (t >> LIMB_BITS)
    p = (limb == 0).astype(U32)
    n = a.shape[-2]
    gg, pp = g, p
    d = 1
    while d < n:
        gg = gg | (pp & _shift_up_lm(gg, d))
        pp = pp & _shift_up_lm(pp, d)
        d <<= 1
    borrow_in = _shift_up_lm(gg, 1)
    diff = (limb + np.uint32(1 << LIMB_BITS) - borrow_in) & MASK
    return diff, gg[..., n - 1, :]


def _skew_columns_lm(prod, ncols):
    # prod: (..., R, C, n) -> (..., ncols, n), out[k] = sum_{i+j=k} prod[i,j]
    *batch, R, C, n = prod.shape
    W = C + R - 1
    pad = [(0, 0)] * prod.ndim
    pad[-2] = (0, W + 1 - C)
    padded = jnp.pad(prod, pad)
    flat = padded.reshape(*batch, R * (W + 1), n)
    skewed = flat[..., : R * W, :].reshape(*batch, R, W, n)
    out = jnp.sum(skewed, axis=-3, dtype=U32)
    if ncols > W:
        pad2 = [(0, 0)] * out.ndim
        pad2[-2] = (0, ncols - W)
        out = jnp.pad(out, pad2)
    return out[..., :ncols, :]


def _mul_columns_lm(a, b, ncols):
    prod = a[..., :, None, :] * b[..., None, :, :]
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    cols_lo = _skew_columns_lm(lo, ncols)
    cols_hi = _skew_columns_lm(hi, ncols - 1)
    pad = [(0, 0)] * cols_hi.ndim
    pad[-2] = (1, 0)
    return cols_lo + jnp.pad(cols_hi, pad)


def mul_lm(spec, a, b, p_arr, mu_arr):
    L = spec.n_limbs
    t = _carry_propagate_lm(_mul_columns_lm(a, b, 2 * L), 2 * L)
    t_hi = t[..., L - 1 :, :]
    prod2 = _carry_propagate_lm(_mul_columns_lm(t_hi, mu_arr, 2 * L + 2), 2 * L + 2)
    qhat = prod2[..., L + 1 : 2 * L + 1, :]
    qp = _carry_propagate_lm(_mul_columns_lm(qhat, p_arr, L + 1), L + 1)
    r, _ = _sub_with_borrow_lm(t[..., : L + 1, :], qp)

    def cond_sub(x):
        pp = p_arr
        if x.shape[-2] > L:
            pad = [(0, 0)] * pp.ndim
            pad[-2] = (0, x.shape[-2] - L)
            pp = jnp.pad(pp, pad)
        pp = jnp.broadcast_to(pp, x.shape)
        diff, borrow = _sub_with_borrow_lm(x, pp)
        return jnp.where((borrow == 0)[..., None, :], diff, x)

    r = cond_sub(cond_sub(r))
    return r[..., :L, :]


def main():
    n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    spec = make_spec(BN254_FR)
    p = spec.modulus
    L = spec.n_limbs
    rng = np.random.default_rng(0)
    import random as pyrandom

    r = pyrandom.Random(0)
    vals = [r.randrange(p) for _ in range(4096)]
    base = ints_to_array(vals, L)  # (4096, L)
    A_em = jnp.asarray(np.tile(base, (n // 4096, 1)))  # (n, L)
    A_lm = jnp.asarray(np.tile(base, (n // 4096, 1)).T.copy())  # (L, n)

    p_arr = jnp.asarray(np.asarray(spec.modulus_limbs, np.uint32)[:, None])
    mu_arr = jnp.asarray(np.asarray(spec.mu_limbs, np.uint32)[:, None])

    print(f"backend={jax.default_backend()} n=2^{n.bit_length()-1}")

    def sync(x):
        # block_until_ready does NOT block through the axon relay; a tiny
        # device_get of a slice is the only honest sync.
        return np.asarray(jax.device_get(x.ravel()[:4]))

    iters = 5

    # element-major production mul
    f_em = jax.jit(lambda x, y: fd.mul(spec, x, y))
    sync(f_em(A_em, A_em))
    t0 = time.perf_counter()
    C = A_em
    for _ in range(iters):
        C = f_em(C, A_em)
    sync(C)
    dt_em = (time.perf_counter() - t0) / iters
    print(f"element-major (n,L): {dt_em*1e3:8.3f} ms -> {n/dt_em/1e6:.1f} M/s")

    # limb-major prototype
    f_lm = jax.jit(lambda x, y, pp, mm: mul_lm(spec, x, y, pp, mm))
    sync(f_lm(A_lm, A_lm, p_arr, mu_arr))
    t0 = time.perf_counter()
    D = A_lm
    for _ in range(iters):
        D = f_lm(D, A_lm, p_arr, mu_arr)
    sync(D)
    dt_lm = (time.perf_counter() - t0) / iters
    print(f"limb-major  (L,n): {dt_lm*1e3:8.3f} ms -> {n/dt_lm/1e6:.1f} M/s")
    print(f"speedup: {dt_em/dt_lm:.2f}x")

    # correctness cross-check
    got = np.asarray(D).T
    want = np.asarray(C)
    assert (got == want).all(), "limb-major result mismatch!"
    print("cross-check OK (same iterated product)")


if __name__ == "__main__":
    main()
