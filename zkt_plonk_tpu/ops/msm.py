"""Multi-scalar multiplication on device (Pippenger, TPU formulation).

Replaces arkworks ``VariableBaseMSM`` (``plonk-core/src/commitment.rs:42``)
— the engine behind every KZG commit/open in the reference.

TPU-first design (no data-dependent control flow, no sorting):
  * scalars split into c-bit windows (pure bit arithmetic on limb arrays);
  * bucket accumulation uses G parallel GROUPS per window: each group owns
    a private (2^c)-bucket array, and a ``fori_loop`` walks the group's
    points adding each into its digit's bucket via gather + complete-EC-add
    + scatter.  Distinct groups write disjoint slices, so there are no
    scatter collisions; total work is the optimal W*n EC adds;
  * group bucket arrays merge by halving (log G vectorized adds);
  * the weighted bucket reduction Σ k*B_k is two suffix-sum scans
    (Σ_{k≥1} Σ_{j≥k} B_j), each log2(2^c) dense steps over all windows;
  * windows fold with c doublings + 1 add per window under fori_loop.

Fixed-base MSM (SRS generation / verifier precomputation) uses
host-precomputed window tables and W gather+add steps.
"""

from __future__ import annotations

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


def _suffix_scan_points(spec: FieldSpec, b3, pts: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive suffix 'sums' (EC adds) along ``axis`` — Hillis-Steele
    under fori_loop (one compiled complete-add body)."""
    k = pts.shape[axis]
    if k == 1:
        return pts
    steps = (k - 1).bit_length()
    idx_shape = [1] * pts.ndim
    idx_shape[axis] = k
    idx = jnp.arange(k).reshape(idx_shape)

    def body(i, y):
        d = jnp.int32(1) << i
        shifted = jnp.roll(y, -d, axis=axis)
        summed = ec.add(spec, b3, y, shifted)
        return jnp.where(idx < k - d, summed, y)

    return jax.lax.fori_loop(0, steps, body, pts)


def _pick_params(n: int, c: int) -> Tuple[int, int]:
    if c <= 0:
        c = 4 if n <= (1 << 12) else 6
    groups = min(256, max(8, n // 128))
    # keep the bucket tensor bounded (~256 MB for the largest configs)
    return c, groups


def msm(
    fq_spec: FieldSpec,
    b3: jnp.ndarray,
    points: jnp.ndarray,
    scalars: jnp.ndarray,
    fr_bits: int,
    c: int = 0,
    groups: int = 0,
) -> jnp.ndarray:
    """Σ scalars_i · points_i.

    points: (n, 3, L) projective over Fq; scalars: (n, Lr) canonical limbs.
    Returns a single projective point (3, L).
    """
    n = points.shape[0]
    c, g_auto = _pick_params(n, c)
    G = groups if groups > 0 else g_auto
    K = 1 << c
    W = num_windows(fr_bits, c)
    L = fq_spec.n_limbs

    digits = window_digits(scalars, c, fr_bits)  # (W, n)

    S = -(-n // G)  # points per group
    n_pad = S * G
    if n_pad != n:
        points = jnp.concatenate([points, ec.identity(fq_spec, (n_pad - n,))])
        digits = jnp.pad(digits, ((0, 0), (0, n_pad - n)))

    pts_steps = points.reshape(S, G, 3, L)
    dig_steps = digits.reshape(W, S, G)

    w_idx = jnp.arange(W)[:, None]  # (W, 1)
    g_idx = jnp.arange(G)[None, :]  # (1, G)
    buckets0 = ec.identity(fq_spec, (W, G, K))

    def body(j, buckets):
        p_j = pts_steps[j]  # (G, 3, L)
        d_j = dig_steps[:, j, :]  # (W, G)
        cur = buckets[w_idx, g_idx, d_j]  # (W, G, 3, L)
        upd = ec.add(fq_spec, b3, cur, p_j[None])
        return buckets.at[w_idx, g_idx, d_j].set(upd)

    buckets = jax.lax.fori_loop(0, S, body, buckets0)

    # merge groups by halving (digit-0 buckets carry junk but are never
    # weighted below)
    g = G
    while g > 1:
        half = g // 2
        merged = ec.add(fq_spec, b3, buckets[:, :half], buckets[:, half : 2 * half])
        if g % 2:
            merged = merged.at[:, 0].set(
                ec.add(fq_spec, b3, merged[:, 0], buckets[:, g - 1])
            )
        buckets = merged
        g = half
    B = buckets[:, 0]  # (W, K, 3, L)

    # Σ_{k=1}^{K-1} k·B_k = Σ_{j≥1} Σ_{k≥j} B_k : two suffix scans
    s1 = _suffix_scan_points(fq_spec, b3, B, axis=1)
    s2 = _suffix_scan_points(fq_spec, b3, s1, axis=1)
    totals = s2[:, 1]  # (W, 3, L)

    def fold(w, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: ec.add(fq_spec, b3, a, a), acc)
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
