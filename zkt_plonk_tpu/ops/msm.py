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
from ..fields.limbs import LIMB_BITS, LIMB_MASK, FieldSpec
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


def _pack16(x: jnp.ndarray) -> jnp.ndarray:
    """(..., L) uint32 of 16-bit limbs -> (..., L/2) with two limbs per
    word.  Bucket rows live packed in HBM: the data-dependent bucket
    gather/scatter runs at ~2-9 GB/s effective (vs ~30 GB/s streaming),
    so halving the row bytes halves the dominant MSM cost."""
    return x[..., 0::2] | (x[..., 1::2] << LIMB_BITS)


def _unpack16(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``_pack16``: (..., L/2) -> (..., L)."""
    lo = x & np.uint32(LIMB_MASK)
    hi = x >> LIMB_BITS
    return jnp.stack([lo, hi], axis=-1).reshape(*x.shape[:-1], 2 * x.shape[-1])


def _tree_reduce_points(spec: FieldSpec, b3, pts: jnp.ndarray, axis: int) -> jnp.ndarray:
    """EC sum along ``axis`` by pairwise halving — work k-1 adds, depth
    ceil(log2 k). Keeps the axis (size 1) removed on return."""
    k = pts.shape[axis]
    while k > 1:
        half = k // 2
        lo = jax.lax.slice_in_dim(pts, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(pts, half, 2 * half, axis=axis)
        merged = ec.add(spec, b3, lo, hi)
        if k % 2:
            odd = jax.lax.slice_in_dim(pts, k - 1, k, axis=axis)
            merged = jnp.concatenate([merged, odd], axis=axis)
            k = half + 1
        else:
            k = half
        pts = merged
    return jnp.squeeze(pts, axis=axis)


def _pick_params(n: int, c: int) -> Tuple[int, int]:
    if c <= 0:
        c = 5 if n <= (1 << 12) else 7
    # r3 v5e sweep (scripts/bench_msm_sweep2.py, n=2^14, flat scatter):
    # c=6/G=16 90.9ms; G=32 +23%; G=64 +127%; c=8 ~5x worse, c=10 ~15x —
    # the bucket scatter cost tracks the bucket TENSOR size, so small K
    # and small G win.  Larger G also inflates the tensor with no upside.
    # r4: SIGNED digits halve K for the same c, so c moves up one notch at
    # the same bucket-tensor size: c=7 signed has K=65 (vs 64 for c=6
    # unsigned) and 37 windows instead of 43 — 14% fewer EC adds.
    groups = min(16, max(8, n // 1024))
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
    buckets = _accumulate(fq_spec, b3, points, scalars, fr_bits, c, G)
    totals = _reduce_buckets(fq_spec, b3, buckets)
    return _fold_windows(fq_spec, b3, totals, c)


def msm_totals(
    fq_spec: FieldSpec,
    b3: jnp.ndarray,
    points: jnp.ndarray,
    scalars: jnp.ndarray,
    fr_bits: int,
    c: int = 0,
    groups: int = 0,
) -> jnp.ndarray:
    """Device part of the MSM up to the per-window totals (W, 3, L).

    The final Horner fold over windows (c doublings + 1 add per window,
    ~300 SERIAL single-point ops — measured ~23 ms of pure dispatch floor
    on v5e) is left to ``fold_windows_host``: W points is tiny data and
    the host does the chain in ~1 ms of bigint math.
    """
    n = points.shape[0]
    c, g_auto = _pick_params(n, c)
    G = groups if groups > 0 else g_auto
    buckets = _accumulate(fq_spec, b3, points, scalars, fr_bits, c, G)
    return _reduce_buckets(fq_spec, b3, buckets)


def msm_window_size(n: int, c: int = 0) -> int:
    return _pick_params(n, c)[0]


def fold_windows_host(fq_spec: FieldSpec, Fq, totals_np, c: int):
    """Host Horner over window totals: acc = 2^c*acc + T_w, high first.

    totals_np: (W, 3, L) numpy projective points. Returns an affine
    ``(int, int)`` tuple or None.
    """
    from ..curves import host as ch

    pts = ec.to_affine_host(fq_spec, totals_np)
    acc = None
    for t in reversed(pts):
        for _ in range(c):
            acc = ch.double(acc)
        acc = ch.add(acc, None if t is None else (Fq(t[0]), Fq(t[1])))
    return None if acc is None else (int(acc[0]), int(acc[1]))


def signed_window_digits(scalars, c: int, fr_bits: int):
    """Signed c-bit recoding: digit in [-2^(c-1), 2^(c-1)].

    Returns (magnitudes (W, n) in [0, half], negate-flags (W, n) bool) with
    W = num_windows(fr_bits + 1, c).  A raw digit d > half becomes
    d - 2^c < 0 with a +1 carry into the next window; because the window
    coverage spans fr_bits + 1 bits, the top raw digit is < half, so the
    final carry is always absorbed (never lost).
    """
    half = np.uint32(1 << (c - 1))
    full = np.uint32(1 << c)
    raw = window_digits(scalars, c, fr_bits + 1)  # (W, n) unsigned
    W = raw.shape[0]
    mags, negs = [], []
    carry = jnp.zeros(raw.shape[1], jnp.uint32)
    for w in range(W):
        d = raw[w] + carry
        over = d > half
        mags.append(jnp.where(over, full - d, d))
        negs.append(over)
        carry = over.astype(jnp.uint32)
    return jnp.stack(mags), jnp.stack(negs)


def _accumulate(fq_spec, b3, points, scalars, fr_bits, c, G):
    """Grouped serial bucket accumulation -> (W, G, K, 3, L).

    SIGNED digits (K = 2^(c-1)+1 buckets, one more window notch at the
    same bucket-tensor size): each of G groups owns a private bucket
    array; a ``fori_loop`` walks the group's points adding each point (or
    its negation, for negative digits) into its |digit| bucket via a
    disjoint scatter.  Digit-0 buckets accumulate junk (incl. padding)
    but are never weighted.
    """
    n = points.shape[0]
    K = (1 << (c - 1)) + 1
    L = fq_spec.n_limbs

    digits, signs = signed_window_digits(scalars, c, fr_bits)  # (W, n) x2
    W = digits.shape[0]

    S = -(-n // G)  # points per group
    n_pad = S * G
    if n_pad != n:
        points = jnp.concatenate([points, ec.identity(fq_spec, (n_pad - n,))])
        digits = jnp.pad(digits, ((0, 0), (0, n_pad - n)))
        signs = jnp.pad(signs, ((0, 0), (0, n_pad - n)))

    pts_steps = points.reshape(S, G, 3, L)
    dig_steps = digits.reshape(W, S, G)
    sgn_steps = signs.reshape(W, S, G)

    # flattened 1-D addressing: measured ~20% faster than the 3-D advanced-
    # index scatter on v5e (90.9 vs 113.4 ms at n=2^14, c=6, G=16)
    base = (jnp.arange(W)[:, None] * G + jnp.arange(G)[None, :]) * K  # (W, G)
    # ``+ 0*points`` keeps the value but derives the fori carry's
    # sharding/varying-manual-axes type from the inputs (shard_map safe).
    # The bucket tensor is held PACKED (two 16-bit limbs per u32 word):
    # the data-dependent row gather/scatter is the MSM wall (r4 measured
    # ~49 of 63 us/step at 2^16), and packing halves its bytes.
    assert L % 2 == 0, "16-bit limb packing needs an even limb count"
    buckets0 = ec.identity(fq_spec, (W, G, K)) + jnp.zeros_like(points[0])
    bflat0 = _pack16(buckets0.reshape(W * G * K, 3, L))

    def body(j, bflat):
        p_j = pts_steps[j]  # (G, 3, L)
        s_j = sgn_steps[:, j, :]  # (W, G)
        d_j = dig_steps[:, j, :]  # (W, G)
        # projective negation: -P = (X, p-Y, Z); fd.sub's 0 -> 0 keeps
        # identity representatives valid.  Negating the tiny (G, 3, L)
        # slice in-loop beats materializing a second (n, 3, L) array.
        ny = fd.sub(fq_spec, jnp.zeros_like(p_j[:, 1]), p_j[:, 1])
        n_j = jnp.concatenate([p_j[:, :1], ny[:, None], p_j[:, 2:]], axis=1)
        q_j = jnp.where(s_j[:, :, None, None], n_j[None], p_j[None])
        lin = (base + d_j).reshape(-1)  # (W*G,) — all distinct by layout
        cur = _unpack16(bflat[lin]).reshape(W, G, 3, L)
        upd = ec.add(fq_spec, b3, cur, q_j).reshape(-1, 3, L)
        return bflat.at[lin].set(
            _pack16(upd), unique_indices=True, mode="promise_in_bounds"
        )

    bflat = jax.lax.fori_loop(0, S, body, bflat0)
    return _unpack16(bflat).reshape(W, G, K, 3, L)


def _ec_masked_scan(fq_spec, b3, x, axis: int, reverse: bool = False):
    """Inclusive prefix (or suffix) EC sums along ``axis`` — Hillis-Steele
    doubling steps under ``fori_loop``.

    The loop body traces ONE ec.add regardless of the axis length: graph
    size is the scarce resource (an unrolled work-efficient reduction
    traced ~90k StableHLO ops and cost 230-360 s of XLA:CPU compile PER
    COMMIT program at toy shapes — the r3/r4 multichip-dryrun timeouts).
    Work is k·log2(k) EC adds vs ~3k for the unrolled pairwise merge, but
    the reduction runs over the K-sized bucket axis (K = 2^(c-1)+1 <= 65)
    — noise next to the n-sized accumulation at any real MSM size.
    """
    k = x.shape[axis]
    steps = max(0, (k - 1)).bit_length()
    sh = [1] * x.ndim
    sh[axis] = k
    idx = jnp.arange(k).reshape(sh)

    def body(i, y):
        d = jnp.left_shift(jnp.int32(1), i)
        shifted = jnp.roll(y, -d if reverse else d, axis=axis)
        summed = ec.add(fq_spec, b3, y, shifted)
        keep = (idx < k - d) if reverse else (idx >= d)
        return jnp.where(keep, summed, y)

    return jax.lax.fori_loop(0, steps, body, x)


def _reduce_buckets(fq_spec, b3, buckets):
    """(W, G, K, 3, L) group buckets -> (W, 3, L) weighted totals Σ k·B_k.

    Groups merge by pairwise halving (`_tree_reduce_points`: G-1 runtime
    EC adds, log2(G) traced adds of HALVING shapes — cheaper on both
    axes than a scan, which does G·log2(G) full-tensor adds for a total
    we only need at one index).  The weighted sum Σ_{k>=1} k·B_k =
    Σ_{k>=1} SS_k with SS the suffix scan over buckets — evaluated by a
    second fixed-shape masked suffix scan (its element 1).  The k = 0
    bucket has weight 0, so its junk (padding) never contributes.
    """
    B = _tree_reduce_points(fq_spec, b3, buckets, axis=1)  # (W, K, 3, L)
    SS = _ec_masked_scan(fq_spec, b3, B, axis=1, reverse=True)
    T = _ec_masked_scan(fq_spec, b3, SS, axis=1, reverse=True)
    return T[:, 1]


def _fold_windows(fq_spec, b3, totals, c):
    """Horner over windows: acc = 2^c acc + T_w, high window first."""
    W = totals.shape[0]

    def fold(w, acc):
        acc = jax.lax.fori_loop(0, c, lambda _, a: ec.add(fq_spec, b3, a, a), acc)
        return ec.add(fq_spec, b3, acc, totals[W - 1 - w])

    init = ec.identity(fq_spec) + jnp.zeros_like(totals[0])
    return jax.lax.fori_loop(0, W, fold, init)


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
