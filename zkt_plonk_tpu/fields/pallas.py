"""Pallas TPU kernels for field arithmetic — the VMEM-resident fast path.

The pure-jnp formulas in ``fields/device.py`` are correct everywhere but
HBM-bound on TPU: XLA materializes the (…, L, L) outer-product
intermediates (measured ~190 GB of traffic per 2^20 muls → 4.5 M mul/s).
These kernels run the whole word-aligned Barrett pipeline on limb-major
``(L, block)`` tiles in VMEM: measured 153 M mul/s on v5e (33x).

Integration contract (see ``fields/device.py``): public fd ops keep the
element-major ``uint32[..., L]`` interface; wrappers here flatten batch
axes, transpose to limb-major, pad to a block multiple, run the kernel,
and undo. Consecutive fd calls inside one jit cancel the intermediate
transposes at the XLA level.

Kernels are enabled when the active backend is TPU (``use_pallas()``);
interpret mode is used on CPU only in dedicated parity tests.

Replaces the reference's ``asm`` feature (x86-64 field mul in ark-ff,
``plonk-core/Cargo.toml:65``) as the "hand-tuned native mul" layer.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .limbs import LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)

# Tuned on v5e: 512 and 1024 within noise, 2048+ slower (VMEM pressure).
BLOCK = 1024
# Below this many elements the jnp path wins (kernel + relayout overhead).
MIN_PALLAS_ELEMS = 1024


def use_pallas() -> bool:
    env = os.environ.get("ZKT_PLONK_PALLAS", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# limb-major primitives used INSIDE kernels.
#
# Convention: the LIMB axis is -2 and the lane/element axis is -1; any
# leading axes are batch. On TPU this puts limbs on sublanes and elements
# on the 128-wide lanes, so limb shifts are cheap sublane moves and all
# arithmetic is fully lane-parallel.
# ---------------------------------------------------------------------------


def _shift_up(x, d):
    """Shift limbs (axis -2) toward higher indices by d, zero fill."""
    if d == 0:
        return x
    z = jnp.zeros(x.shape[:-2] + (d, x.shape[-1]), U32)
    return jnp.concatenate([z, x[..., :-d, :]], axis=-2)


def _ks_carries(g, p):
    n = g.shape[-2]
    d = 1
    while d < n:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d <<= 1
    return _shift_up(g, 1)


def _carry_propagate(cols, out_len):
    k = cols.shape[-2]
    if k < out_len:
        z = jnp.zeros(cols.shape[:-2] + (out_len - k, cols.shape[-1]), U32)
        cols = jnp.concatenate([cols, z], axis=-2)
    else:
        cols = cols[..., :out_len, :]
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
    n = a.shape[-2]
    gg, pp = g, p
    d = 1
    while d < n:
        gg = gg | (pp & _shift_up(gg, d))
        pp = pp & _shift_up(pp, d)
        d <<= 1
    borrow_in = _shift_up(gg, 1)
    diff = (limb + np.uint32(1 << LIMB_BITS) - borrow_in) & MASK
    return diff, gg[..., n - 1, :]


def _mul_columns(a, b, ncols):
    """Column sums of a*b over columns [0, ncols).

    a (..., La, B), b (..., Lb, B) -> (..., ncols, B); output row r is
    column r of the schoolbook product.  Full-width products are kept
    deliberately: truncating the Barrett mu/qp products to their
    mathematically sufficient column windows was MEASURED SLOWER on v5e
    (irregular sliced shapes defeat Mosaic fusion — see ``_barrett_mul_lm``).
    """
    La, Lb = a.shape[-2], b.shape[-2]
    R = ncols

    def place(x, off):
        """Place x rows at output rows [off, off+k), clipped to [0, R)."""
        k = x.shape[-2]
        lo_clip = max(0, -off)
        hi_clip = min(k, R - off)
        if lo_clip >= hi_clip:
            return None
        x = x[..., lo_clip:hi_clip, :]
        pre = off + lo_clip
        post = R - pre - (hi_clip - lo_clip)
        parts = []
        if pre:
            parts.append(jnp.zeros(x.shape[:-2] + (pre, x.shape[-1]), U32))
        parts.append(x)
        if post:
            parts.append(jnp.zeros(x.shape[:-2] + (post, x.shape[-1]), U32))
        return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else parts[0]

    acc = None
    for i in range(La):
        j_hi = min(Lb, ncols - i)
        if j_hi <= 0:
            continue
        prod = a[..., i : i + 1, :] * b[..., :j_hi, :]
        lo = place(prod & MASK, i)
        hi = place(prod >> LIMB_BITS, i + 1)
        for part in (lo, hi):
            if part is not None:
                acc = part if acc is None else acc + part
    return acc


def _cond_sub(r, p_pad):
    diff, borrow = _sub_with_borrow(r, p_pad)
    return jnp.where((borrow == 0)[..., None, :], diff, r)


def _bcast_const(c, like, rows):
    """Broadcast a (rows, 1) constant to (..., rows, B) matching ``like``.

    Two steps (lanes first, then leading dims) — Mosaic cannot broadcast
    sublanes and lanes in a single op.
    """
    c2 = jnp.broadcast_to(c, (rows, like.shape[-1]))
    return jnp.broadcast_to(c2, like.shape[:-2] + (rows, like.shape[-1]))


def _barrett_mul_lm(a, b, p_arr, fold, L):
    """Full modmul on limb-major (..., L, B) tiles (canonical in).

    Fold-then-small-Barrett reduction (replaces the word-aligned Barrett
    mu product of r3 — measured slower: its (L+1)x(L+1) estimator plus
    LxL back-multiply cost ~440 u32 muls per element vs ~300 here):

      1. t = a*b, carry-propagated to 2L limbs;
      2. FOLD: V = t_lo + sum_i t_hi[i] * C_i with C_i = beta^{L+i} mod p
         (``fold`` rows, see ``limbs.fold_limbs``) — an LxL product with
         NO diagonal shifts (every partial lands at offset 0/1), so the
         accumulation is two dense row sums; V == t (mod p), V < beta^{L+2};
      3. SMALL QUOTIENT: w = top 4 limbs of V, qhat = floor(w*mu3/beta^4)
         with mu3 = floor(beta^{L+2}/p); q-2 <= qhat <= q = floor(V/p);
      4. r = V - qhat*p (< 3p), two conditional subtractions.

    NOTE on truncation (r3, still applies): sliced irregular column
    windows defeat Mosaic fusion; every product here is full-width and
    regular.
    """
    a, b = jnp.broadcast_arrays(a, b)
    return _reduce_2l(
        _carry_propagate(_mul_columns(a, b, 2 * L), 2 * L), p_arr, fold, L
    )


def _mul2_lm(a, b, c, d, p_arr, fold, L):
    """(a*b + c*d) mod p with ONE shared reduction.

    The raw column sums of the two schoolbook products add directly
    (each column < L*2^17, so the sum stays far below 2^32), and the fold
    bound in ``_reduce_2l`` is per-limb worst-case — it covers any 2L-limb
    t, including t = a*b + c*d < 2p^2 < beta^{2L}.  Saves one full
    reduction (~300 u32 muls + 3 carry chains) per pair vs two muls + add.
    """
    cols = _mul_columns(a, b, 2 * L) + _mul_columns(c, d, 2 * L)
    return _reduce_2l(_carry_propagate(cols, 2 * L), p_arr, fold, L)


def _small_mul_lm(x, v, p_arr, fold, L):
    """x * v mod p for a small STATIC constant v (1 <= v < 16), x canonical.

    The product is a shift-add over v's set bits (column sums < 2^21), and
    t = v*x < 16p gets a 1-limb-quotient Barrett tail: q = floor(t/p) < 16
    is estimated from the top 3 limbs with the same mu3 constant as the
    full reduction (q-2 <= qhat <= q, two conditional subtractions).
    ~30 u32 muls instead of ~560 for a generic field mul — used for the
    curve constant 3b (9 / 12 / 3 on bn254 / bls12-381 / bls12-377).
    """
    assert 1 <= v < 16
    cols = None
    for bit in range(4):
        if (v >> bit) & 1:
            term = x << bit
            cols = term if cols is None else cols + term
    t = _carry_propagate(cols, L + 1)  # v*x < 16p < beta^(L+1)
    w = t[..., L - 2 :, :]  # (..., 3, B): floor(t / beta^(L-2)) < 2^36
    mu3 = _bcast_const(fold[L * L : L * L + 4], x, 4)
    m = _carry_propagate(_mul_columns(w, mu3, 7), 7)
    qhat = m[..., 4:5, :]  # floor(w*mu3 / beta^4) — 1 limb (q < 16)
    qp = _carry_propagate(
        _mul_columns(qhat, _bcast_const(p_arr, x, L), L + 1), L + 1
    )
    r, _ = _sub_with_borrow(t, qp)
    z1 = jnp.zeros(x.shape[:-2] + (1, x.shape[-1]), U32)
    p_pad = jnp.concatenate([_bcast_const(p_arr, x, L), z1], axis=-2)
    r = _cond_sub(_cond_sub(r, p_pad), p_pad)
    return r[..., :L, :]


def _reduce_2l(t, p_arr, fold, L):
    """Reduce a 2L-limb value t (limbs on axis -2) to canonical L limbs."""
    a = t  # shape/batch template for broadcasts below
    t_lo, t_hi = t[..., :L, :], t[..., L:, :]

    # fold: acc_lo/acc_hi are the offset-0 / offset-1 partial rows of
    # sum_i t_hi[i] * C_i; column sums stay < L * 2^17 << 2^32
    acc_lo = acc_hi = None
    for i in range(L):
        ci = _bcast_const(fold[i * L : (i + 1) * L], a, L)
        prod = t_hi[..., i : i + 1, :] * ci
        lo, hi = prod & MASK, prod >> LIMB_BITS
        acc_lo = lo if acc_lo is None else acc_lo + lo
        acc_hi = hi if acc_hi is None else acc_hi + hi

    z1 = jnp.zeros(a.shape[:-2] + (1, a.shape[-1]), U32)
    z2 = jnp.concatenate([z1, z1], axis=-2)
    cols = (
        jnp.concatenate([acc_lo, z2], axis=-2)
        + jnp.concatenate([z1, acc_hi, z1], axis=-2)
        + jnp.concatenate([t_lo, z2], axis=-2)
    )
    V = _carry_propagate(cols, L + 2)

    w = V[..., L - 2 :, :]  # (..., 4, B)
    mu3 = _bcast_const(fold[L * L : L * L + 4], a, 4)
    m = _carry_propagate(_mul_columns(w, mu3, 8), 8)
    qhat = m[..., 4:6, :]  # floor(w*mu3 / beta^4) — 2 limbs (q < 2^22)

    qp = _carry_propagate(
        _mul_columns(qhat, _bcast_const(p_arr, a, L), L + 2), L + 2
    )
    r, _ = _sub_with_borrow(V, qp)
    r = r[..., : L + 1, :]
    p_pad = jnp.concatenate([_bcast_const(p_arr, a, L), z1], axis=-2)
    r = _cond_sub(_cond_sub(r, p_pad), p_pad)
    return r[..., :L, :]


def _add_lm(a, b, p_arr, L):
    a, b = jnp.broadcast_arrays(a, b)
    s = _carry_propagate(a + b, L + 1)
    p_pad = jnp.concatenate(
        [_bcast_const(p_arr, a, L), jnp.zeros(a.shape[:-2] + (1, a.shape[-1]), U32)],
        axis=-2,
    )
    return _cond_sub(s, p_pad)[..., :L, :]


def _sub_lm(a, b, p_arr, L):
    a, b = jnp.broadcast_arrays(a, b)
    d, borrow = _sub_with_borrow(a, b)
    fixed = _carry_propagate(d + _bcast_const(p_arr, a, L), L)
    return jnp.where((borrow > 0)[..., None, :], fixed, d)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _kernel_fn(spec: FieldSpec, op: str, interpret: bool):
    L = spec.n_limbs

    if op == "mul":

        def kernel(p_ref, mu_ref, a_ref, b_ref, o_ref):
            o_ref[:] = _barrett_mul_lm(
                a_ref[:], b_ref[:], p_ref[:], mu_ref[:], L
            )

        n_consts = 2
    elif op == "add":

        def kernel(p_ref, a_ref, b_ref, o_ref):
            o_ref[:] = _add_lm(a_ref[:], b_ref[:], p_ref[:], L)

        n_consts = 1
    elif op == "sub":

        def kernel(p_ref, a_ref, b_ref, o_ref):
            o_ref[:] = _sub_lm(a_ref[:], b_ref[:], p_ref[:], L)

        n_consts = 1
    else:  # pragma: no cover
        raise ValueError(op)

    const_specs = [
        pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((L * L + 4, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
    ][:n_consts]
    if op != "mul":
        const_specs = [pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)]

    def call(consts, a_lm, b_lm):
        n = a_lm.shape[1]
        grid = n // BLOCK
        data_spec = pl.BlockSpec((L, BLOCK), lambda j: (0, j), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), U32),
            grid=(grid,),
            in_specs=const_specs + [data_spec, data_spec],
            out_specs=data_spec,
            interpret=interpret,
        )(*consts, a_lm, b_lm)

    return call


def _consts(spec: FieldSpec, op: str):
    p_arr = jnp.asarray(np.asarray(spec.modulus_limbs, np.uint32)[:, None])
    if op == "mul":
        return (p_arr, fold_const(spec))
    return (p_arr,)


def fold_const(spec: FieldSpec):
    """(L*L+4, 1) fold/mu3 constant block for ``_barrett_mul_lm``."""
    from .limbs import fold_limbs

    return jnp.asarray(fold_limbs(spec)[:, None])


def binary_op(spec: FieldSpec, op: str, a, b, *, interpret: bool = False):
    """Run a binary field op through the pallas kernel.

    a, b: element-major ``uint32[..., L]`` (already broadcast to a common
    shape). Returns the same shape. Caller is responsible for the
    use-it-or-not decision (see ``eligible``).
    """
    L = spec.n_limbs
    shape = a.shape
    n = int(np.prod(shape[:-1], dtype=np.int64)) if len(shape) > 1 else 1
    a2 = a.reshape(n, L).T  # (L, n) — one XLA relayout
    b2 = b.reshape(n, L).T
    pad = (-n) % BLOCK
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
        b2 = jnp.pad(b2, ((0, 0), (0, pad)))
    out = _kernel_fn(spec, op, interpret)(_consts(spec, op), a2, b2)
    if pad:
        out = out[:, :n]
    return out.T.reshape(shape)


def eligible(a, b) -> bool:
    """Static decision: is the pallas path worth it for these operands?"""
    shape = np.broadcast_shapes(a.shape, b.shape)
    n = int(np.prod(shape[:-1], dtype=np.int64)) if len(shape) > 1 else 1
    return n >= MIN_PALLAS_ELEMS


# ---------------------------------------------------------------------------
# square-and-multiply chain kernel (Fermat inversion / fixed pow)
# ---------------------------------------------------------------------------
#
# A ~380-step square-and-multiply chain issued as XLA ops costs ~30ms on
# TPU regardless of batch size (per-op overhead on tiny shapes dominates —
# measured: fd.inv of ONE element = 31ms).  This kernel runs the whole
# chain on a VMEM-resident (L, B) tile: one pallas_call, fori_loop inside,
# ~0.5ms.  Used by fd.pow_const (hence fd.inv / fd.batch_inverse totals).

POW_BLOCK = 256


@lru_cache(maxsize=None)
def _pow_kernel(spec: FieldSpec, nbits: int, interpret: bool):
    L = spec.n_limbs

    def kernel(p_ref, mu_ref, bits_ref, x_ref, o_ref):
        x = x_ref[...]
        # limb-major one: row 0 = 1 (iota+where — .at[].set lowers to an
        # unsupported scatter in Mosaic)
        row = jax.lax.broadcasted_iota(jnp.uint32, x.shape, 0)
        acc0 = jnp.where(row == 0, jnp.uint32(1), jnp.uint32(0))

        def body(i, acc):
            sq = _barrett_mul_lm(acc, acc, p_ref[...], mu_ref[...], L)
            sqx = _barrett_mul_lm(sq, x, p_ref[...], mu_ref[...], L)
            return jnp.where(bits_ref[i] > 0, sqx, sq)

        o_ref[...] = jax.lax.fori_loop(0, nbits, body, acc0)

    p_spec = pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((L * L + 4, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    bits_spec = pl.BlockSpec((nbits,), lambda j: (0,), memory_space=pltpu.SMEM)
    data_spec = pl.BlockSpec(
        (L, POW_BLOCK), lambda j: (0, j), memory_space=pltpu.VMEM
    )

    def call(p_arr, mu, bits, x_lm):
        n = x_lm.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), U32),
            grid=(n // POW_BLOCK,),
            in_specs=[p_spec, mu_spec, bits_spec, data_spec],
            out_specs=data_spec,
            interpret=interpret,
        )(p_arr, mu, bits, x_lm)

    return call


def pow_chain(spec: FieldSpec, a, exponent: int, *, interpret: bool = False):
    """a^exponent elementwise via one square-and-multiply chain kernel.

    a: element-major ``uint32[..., L]`` canonical.  The exponent is STATIC
    (baked into the kernel's bit schedule).  Maps 0 -> 0 for exponents
    >= 1 (so Fermat inversion keeps the 0 -> 0 convention).
    """
    assert exponent >= 1
    L = spec.n_limbs
    shape = a.shape
    n = int(np.prod(shape[:-1], dtype=np.int64)) if len(shape) > 1 else 1
    a2 = a.reshape(n, L).T  # (L, n)
    pad = (-n) % POW_BLOCK
    if pad:
        a2 = jnp.pad(a2, ((0, 0), (0, pad)))
    nbits = exponent.bit_length()
    bits = np.asarray(
        [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.int32
    )
    p_arr, mu = _consts(spec, "mul")
    out = _pow_kernel(spec, nbits, interpret)(p_arr, mu, jnp.asarray(bits), a2)
    if pad:
        out = out[:, :n]
    return out.T.reshape(shape)
