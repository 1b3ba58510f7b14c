"""Prototype: Pallas TPU kernel for BN254 Fr modmul, limb-major (L, n).

Measures against the production jnp path. Correctness via interpret mode on
CPU (run with JAX_PLATFORMS=cpu) or directly vs python ints on TPU.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields.limbs import LIMB_BITS, LIMB_MASK, ints_to_array, array_to_ints

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)
L = 16


def _shift_up(x, d):
    """Shift limbs (axis 0) toward higher indices by d, zero fill."""
    if d == 0:
        return x
    return jnp.concatenate([jnp.zeros((d,) + x.shape[1:], U32), x[:-d]], axis=0)


def _ks_carries(g, p):
    n = g.shape[0]
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    return _shift_up(g, 1)


def _carry_propagate(cols, out_len):
    k = cols.shape[0]
    if k < out_len:
        cols = jnp.concatenate(
            [cols, jnp.zeros((out_len - k,) + cols.shape[1:], U32)], axis=0
        )
    else:
        cols = cols[:out_len]
    s = (cols & MASK) + _shift_up(cols >> LIMB_BITS, 1)
    s = (s & MASK) + _shift_up(s >> LIMB_BITS, 1)
    g = s >> LIMB_BITS
    limb = s & MASK
    p = (limb == MASK).astype(U32)
    return (limb + _ks_carries(g, p)) & MASK


def _sub_with_borrow(a, b):
    t = a + np.uint32(1 << LIMB_BITS) - b
    limb = t & MASK
    g = np.uint32(1) - (t >> LIMB_BITS)
    p = (limb == 0).astype(U32)
    n = a.shape[0]
    gg, pp = g, p
    d = 1
    while d < n:
        gg = gg | (pp & _shift_up(gg, d))
        pp = pp & _shift_up(pp, d)
        d <<= 1
    borrow_in = _shift_up(gg, 1)
    diff = (limb + np.uint32(1 << LIMB_BITS) - borrow_in) & MASK
    return diff, gg[n - 1]


def _mul_columns(a, b, ncols):
    """Column sums of a*b, limb-major: a (La, B), b (Lb, B) -> (ncols, B).

    Block-shifted accumulation: 2*La adds of (Lb, B) blocks, no gathers.
    """
    La = a.shape[0]
    Lb = b.shape[0]
    B = a.shape[1]
    zrow = jnp.zeros((1, B), U32)

    def place(x, off):
        """Embed (k, B) rows at limb offset ``off`` in an (ncols, B) array."""
        k = min(x.shape[0], ncols - off)
        if k <= 0:
            return None
        parts = []
        if off:
            parts.append(jnp.zeros((off, B), U32))
        parts.append(x[:k])
        if off + k < ncols:
            parts.append(jnp.zeros((ncols - off - k, B), U32))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    acc = jnp.zeros((ncols, B), U32)
    for i in range(La):
        prod = a[i][None, :] * b  # (Lb, B)
        lo = place(prod & MASK, i)
        hi = place(prod >> LIMB_BITS, i + 1)
        if lo is not None:
            acc = acc + lo
        if hi is not None:
            acc = acc + hi
    return acc


def make_mul_kernel(spec, block=512):
    p_np = np.asarray(spec.modulus_limbs, np.uint32)[:, None]
    mu_np = np.asarray(spec.mu_limbs, np.uint32)[:, None]

    def kernel(p_ref, mu_ref, a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        p_arr = p_ref[:]
        mu = mu_ref[:]

        t = _carry_propagate(_mul_columns(a, b, 2 * L), 2 * L)
        t_hi = t[L - 1 :]  # (L+1, B)
        mu_b = jnp.broadcast_to(mu, (L + 1, a.shape[1]))
        prod2 = _carry_propagate(_mul_columns(t_hi, mu_b, 2 * L + 2), 2 * L + 2)
        qhat = prod2[L + 1 : 2 * L + 1]  # (L, B)
        p_b = jnp.broadcast_to(p_arr, (L, a.shape[1]))
        qp = _carry_propagate(_mul_columns(qhat, p_b, L + 1), L + 1)
        r, _ = _sub_with_borrow(t[: L + 1], qp)

        p_pad = jnp.concatenate(
            [jnp.broadcast_to(p_arr, (L, a.shape[1])),
             jnp.zeros((1, a.shape[1]), U32)], axis=0
        )
        for _ in range(2):
            diff, borrow = _sub_with_borrow(r, p_pad)
            r = jnp.where((borrow == 0)[None, :], diff, r)
        o_ref[:] = r[:L]

    @jax.jit
    def mul(a, b):
        n = a.shape[1]
        grid = n // block
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), U32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L + 1, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, block), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((L, block), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, block), lambda j: (0, j), memory_space=pltpu.VMEM),
            interpret=(jax.default_backend() == "cpu"),
        )(jnp.asarray(p_np), jnp.asarray(mu_np), a, b)

    return mul


def main():
    spec = make_spec(BN254_FR)
    p = spec.modulus
    import random as pyrandom

    r = pyrandom.Random(0)
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << lg
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    m = 4096
    vals_a = [r.randrange(p) for _ in range(m)]
    vals_b = [r.randrange(p) for _ in range(m)]
    A = jnp.asarray(np.tile(ints_to_array(vals_a, L).T, (1, n // m)))  # (L, n)
    B = jnp.asarray(np.tile(ints_to_array(vals_b, L).T, (1, n // m)))

    mul = make_mul_kernel(spec, block=block)

    def sync(x):
        return np.asarray(jax.device_get(x.ravel()[:4]))

    out = mul(A, B)
    sync(out)

    # correctness on first m entries
    got = array_to_ints(np.asarray(out[:, :m]).T)
    want = [(x * y) % p for x, y in zip(vals_a, vals_b)]
    assert got == want, "MISMATCH"
    print(f"correct ({m} checked), backend={jax.default_backend()}")

    iters = 10
    t0 = time.perf_counter()
    o = A
    for _ in range(iters):
        o = mul(o, B)
    sync(o)
    dt = (time.perf_counter() - t0) / iters
    print(f"pallas mul 2^{lg} (block={block}): {dt*1e3:8.3f} ms -> {n/dt/1e6:8.1f} M/s")


if __name__ == "__main__":
    main()
