"""Multi-scalar multiplication on device (Pippenger, TPU formulation).

Replaces arkworks ``VariableBaseMSM`` (``plonk-core/src/commitment.rs:42``)
— the engine behind every KZG commit/open in the reference.

TPU-first design (no data-dependent scatter):
  * scalars are split into c-bit windows (digit extraction is pure bit
    arithmetic on the 16-bit limb arrays);
  * per window: points are SORTED by digit (XLA sort), bucket sums fall out
    of an inclusive prefix scan of complete EC adds (log2 n dense steps)
    sliced at bucket boundaries (searchsorted on the sorted digits);
  * bucket-weighted reduction uses the telescoping identity
        Σ k·B_k = (K-1)·E_{K-1} - Σ_{j<K-1} E_j
    where E_k are prefix sums at bucket ends — a *tree* reduction instead of
    the sequential running-sum loop;
  * windows are mapped with ``lax.map`` so the per-window program compiles
    once and memory stays O(n) instead of O(W·n).

Fixed-base MSM (for SRS generation / verifier precomputation) uses
host-precomputed window tables and W gather+add steps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import device as fd
from ..fields.limbs import LIMB_BITS, FieldSpec
from . import ec

DEFAULT_WINDOW = 8


def num_windows(fr_bits: int, c: int) -> int:
    return -(-fr_bits // c)


def window_digits(scalars: jnp.ndarray, c: int, fr_bits: int) -> jnp.ndarray:
    """(n, L) canonical scalar limbs -> (W, n) uint32 window digits."""
    n, L = scalars.shape
    padded = jnp.pad(scalars, ((0, 0), (0, 1)))
    digits = []
    mask = np.uint32((1 << c) - 1)
    for w in range(num_windows(fr_bits, c)):
        bitpos = c * w
        li, of = divmod(bitpos, LIMB_BITS)
        lo = padded[:, li] if li < L + 1 else jnp.zeros(n, jnp.uint32)
        hi = padded[:, li + 1] if li + 1 < L + 1 else jnp.zeros(n, jnp.uint32)
        word = lo | (hi << LIMB_BITS)
        digits.append((word >> of) & mask)
    return jnp.stack(digits)


def _prefix_scan_points(spec: FieldSpec, b3, pts: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix 'sums' (EC adds) along axis 0 — Hillis-Steele.

    The doubling loop runs under ``fori_loop`` so the (large) complete-add
    subgraph is traced/compiled exactly once regardless of n.
    """
    n = pts.shape[0]
    if n == 1:
        return pts
    steps = (n - 1).bit_length()
    idx = jnp.arange(n)[:, None, None]

    def body(i, y):
        d = jnp.int32(1) << i
        shifted = jnp.roll(y, d, axis=0)
        summed = ec.add(spec, b3, y, shifted)
        return jnp.where(idx >= d, summed, y)

    return jax.lax.fori_loop(0, steps, body, pts)


def _sum_points(spec: FieldSpec, b3, pts: jnp.ndarray) -> jnp.ndarray:
    """Sum of points along axis 0 (via the shared prefix-scan body)."""
    return _prefix_scan_points(spec, b3, pts)[-1]


def _scalar_mul_small(spec: FieldSpec, b3, pt: jnp.ndarray, k: int) -> jnp.ndarray:
    """pt * k for a small static k (double-and-add under fori_loop)."""
    if k == 0:
        return ec.identity(spec)
    nbits = k.bit_length()
    bits = jnp.asarray(
        np.array([(k >> (nbits - 1 - i)) & 1 for i in range(nbits)], dtype=np.uint32)
    )

    def body(i, acc):
        acc = ec.add(spec, b3, acc, acc)
        with_add = ec.add(spec, b3, acc, pt)
        return jnp.where(bits[i] > 0, with_add, acc)

    return jax.lax.fori_loop(0, nbits, body, ec.identity(spec))


def _window_total(spec: FieldSpec, b3, points: jnp.ndarray, c: int, digits: jnp.ndarray):
    """Bucket-accumulate one window; returns Σ_k k·B_k as a single point."""
    K = 1 << c
    order = jnp.argsort(digits)
    d_sorted = digits[order]
    pts_sorted = points[order]
    # digit-0 points contribute nothing; replace with identity so the
    # prefix scan stays exact at bucket boundaries
    pts_sorted = ec.select((d_sorted == 0), ec.identity(spec, d_sorted.shape), pts_sorted)

    S = _prefix_scan_points(spec, b3, pts_sorted)

    cum = jnp.searchsorted(d_sorted, jnp.arange(K, dtype=jnp.uint32), side="right")
    E = S[jnp.clip(cum - 1, 0, None)]
    E = ec.select(cum == 0, ec.identity(spec, (K,)), E)

    # Σ_{k=1}^{K-1} k·B_k = (K-1)·E_{K-1} - Σ_{j=0}^{K-2} E_j
    top = _scalar_mul_small(spec, b3, E[K - 1], K - 1)
    rest = _sum_points(spec, b3, E[: K - 1])
    return ec.add(spec, b3, top, ec.neg(spec, rest))


def msm(
    fq_spec: FieldSpec,
    b3: jnp.ndarray,
    points: jnp.ndarray,
    scalars: jnp.ndarray,
    fr_bits: int,
    c: int = DEFAULT_WINDOW,
) -> jnp.ndarray:
    """Σ scalars_i · points_i.

    points: (n, 3, L) projective over Fq; scalars: (n, Lr) canonical limbs.
    Returns a single projective point (3, L).
    """
    digits = window_digits(scalars, c, fr_bits)  # (W, n)

    totals = jax.lax.map(
        partial(_window_total, fq_spec, b3, points, c), digits
    )  # (W, 3, L)

    W = totals.shape[0]

    def fold(w, acc):
        acc = jax.lax.fori_loop(
            0, c, lambda _, a: ec.add(fq_spec, b3, a, a), acc
        )
        return ec.add(fq_spec, b3, acc, totals[W - 1 - w])

    return jax.lax.fori_loop(0, W, fold, ec.identity(fq_spec))


# ---------------------------------------------------------------------------
# fixed-base MSM (known base point, e.g. SRS generation)
# ---------------------------------------------------------------------------


def fixed_base_tables(ctx, base_affine, c: int = DEFAULT_WINDOW) -> np.ndarray:
    """Host-precomputed tables[w][d] = d·2^(cw)·G, shape (W, 2^c, 3, L)."""
    from ..curves import curve_host as ch

    fr_bits = ctx.curve.fr.modulus.bit_length()
    W = num_windows(fr_bits, c)
    K = 1 << c
    spec = ctx.fq_spec
    rows = []
    base = base_affine
    for _ in range(W):
        row = [None]
        for _ in range(K - 1):
            row.append(ch.add(row[-1], base))
        rows.append(ec.from_affine_host(spec, row))
        for _ in range(c):
            base = ch.double(base)
    return np.stack(rows)  # (W, K, 3, L)


def fixed_base_msm(
    fq_spec: FieldSpec,
    b3: jnp.ndarray,
    tables: jnp.ndarray,
    scalars: jnp.ndarray,
    fr_bits: int,
    c: int = DEFAULT_WINDOW,
) -> jnp.ndarray:
    """[s_i · G for each scalar] via window tables; returns (n, 3, L)."""
    digits = window_digits(scalars, c, fr_bits)  # (W, n)
    W = digits.shape[0]
    n = scalars.shape[0]

    def body(w, acc):
        pts = tables[w][digits[w]]  # (n, 3, L) gather
        return ec.add(fq_spec, b3, acc, pts)

    return jax.lax.fori_loop(0, W, body, ec.identity(fq_spec, (n,)))
