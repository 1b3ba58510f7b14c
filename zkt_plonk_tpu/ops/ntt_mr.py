"""Mixed-radix multi-pass NTT with pallas column kernels — the TPU fast path.

Replaces the per-stage gather NTT of ``ops/ntt.py`` on TPU (reference:
ark-poly radix-2 FFT, ``plonk-core/src/util.rs:63-140``).  Algorithm
(Bailey four-step generalized to D factors): n = F1*F2*...*FD;

  pass d: F_d-point DIT NTTs along axis 0 (rows pre-permuted to
          bit-reversed order — a cheap row gather), batched over all other
          indices on the 128-wide lane axis; then an inter-pass twiddle
          multiply w^(P_d * t_d * c_d) with P_d = F1*...*F_{d-1}; then an
          XLA transpose bringing F_{d+1} to axis 0.

Each pass is ONE pallas kernel: a (F, L, Mb) block stays in VMEM for all
log2(F) butterfly stages — limbs on sublanes, lanes = batch, butterflies
are leading-axis slices (exact n/2 muls per stage, no gathers, no lane
rolls).  Stage-0 twiddles are 1 and skip their mul.  Inter-pass twiddles,
coset prologues (coset-FFT) and coset epilogues (coset-iFFT, with 1/n
folded into the last inter-pass table) are fused into the same kernel.

Twiddle memory: tables are stored compactly (O(F * sqrt(M)) not O(n)) and
blocked into the kernel by index-map address arithmetic; every table block
is either a (rows, L, Mb) lane slice or a (rows, L, 1) broadcast column.

The same math runs as a pure-jnp column transform (``use_kernel=False``)
so CPU tests validate tables + index algebra at full size; the kernels get
interpret-mode parity tests.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import pallas as fp
from ..fields.limbs import FieldSpec, ints_to_array

U32 = jnp.uint32

MB = 128  # lane block per kernel grid step
FULL_TABLE_MAX = 1 << 16  # build O(n) tables when F*M is at most this

# Pallas TPU requires lane blocks of 128 (or the array's full lane dim),
# so VMEM pressure is managed on the SUBLANE side instead: the stacked
# Barrett multiplies inside a kernel are chunked to at most MUL_CHUNK_ROWS
# rows per call (peak live set ~ rows * (2L+2) * 128 lanes * ~6 buffers).
# 16 is what fits Mosaic's scoped-vmem budget on real v5e for F = 256
# passes (64 exceeded it — the r2 "non-functional on real TPU" failure);
# 32 measured slightly slower (3.88 vs 3.59 ms at 2^14).
MUL_CHUNK_ROWS = 16


def _mb_for(Mtot: int) -> int:
    """Lane block: 128, or the whole (smaller) lane dimension."""
    return min(MB, Mtot)


def _mul_row_chunked(mul, a, b):
    """Apply ``mul`` in row chunks so Barrett intermediates stay small."""
    rows = a.shape[0]
    if rows <= MUL_CHUNK_ROWS:
        return mul(a, b)
    outs = [
        mul(a[i : i + MUL_CHUNK_ROWS], b[i : i + MUL_CHUNK_ROWS])
        for i in range(0, rows, MUL_CHUNK_ROWS)
    ]
    return jnp.concatenate(outs, axis=0)


def factorize(log_n: int) -> Tuple[int, ...]:
    """Split log2(n) into D factors: F1 = 128 (2^7), later factors <= 2^7,
    split evenly.

    F1 must give P_d >= MB = 128 for every later pass (compact-table
    addressing), hence 7; factors are capped at 7 because F = 256 passes
    crash the TPU remote compiler for multi-pass plans at n >= 2^16
    (measured r3) while F = 128 compiles everywhere — and runs FAST:
    2^16 measured 5.56 ms vs 173.75 ms for the fori-gather path.
    """
    k = log_n
    if k <= 8:
        return (k,)
    # NO radix-256 in multi-pass plans: an F=256 pass at the full mb=128
    # lane block needs ~20MB of scoped vmem (> the 16MB budget) — it only
    # ever fit for single-poly transforms whose lane dim was < 128, which
    # is why batch-1 testing missed it (BATCHED 2^14 iNTTs crashed).
    r = k - 7
    parts = -(-r // 7)  # remaining passes, each <= 7
    base, extra = divmod(r, parts)
    return (7,) + tuple(base + (1 if i < extra else 0) for i in range(parts))


def _bitrev_perm(F: int) -> np.ndarray:
    bits = F.bit_length() - 1
    idx = np.arange(F)
    out = np.zeros(F, dtype=np.int32)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


def _enc(values: Sequence[int], L: int, rows: int, lanes: int) -> np.ndarray:
    """ints (row-major rows x lanes) -> (rows, L, lanes) uint32."""
    arr = ints_to_array(list(values), L).reshape(rows, lanes, L)
    return np.ascontiguousarray(arr.transpose(0, 2, 1))


class Tbl:
    """A multiplicative table + static block addressing.

    For kernel lane-block j the table block is column-block
    ``(j // k) % m`` of ``arr``; ``slice_`` selects a (rows, L, mb) lane
    slice (one table lane per data lane) vs a (rows, L, 1) broadcast
    column (one value for the whole block's lanes).

    jnp expansion of the same addressing (mb = lane block in elements):
    slice: full = tile(arr, M / lanes); const: full = tile(repeat(each
    column k*mb times), M / (m*k*mb)).
    """

    __slots__ = ("arr", "k", "m", "slice_")

    def __init__(self, arr, k: int, m: int, slice_: bool):
        self.arr = arr
        self.k = k
        self.m = m
        self.slice_ = slice_


def _expand_jnp(t: Tbl, M: int, mb: int, nb: int) -> jnp.ndarray:
    """Expand a table to per-batch width M, then tile over the nb batches
    (batches ride outermost on the lane axis)."""
    arr = t.arr
    lanes = arr.shape[-1]
    if t.slice_:
        full = arr if lanes == M else jnp.tile(arr, (1, 1, M // lanes))
    else:
        period = t.m * t.k * mb
        full = jnp.repeat(arr[..., : t.m], t.k * mb, axis=-1)
        if period < M:
            full = jnp.tile(full, (1, 1, M // period))
        full = full[..., :M]
    return full if nb == 1 else jnp.tile(full, (1, 1, nb))


@jax.tree_util.register_pytree_node_class
class MrPlan:
    """All tables for one direction (+ optional coset) of one domain size."""

    def __init__(self, n, factors, L, bitrevs, stage_tws, post, pro, epi):
        self.n = n
        self.factors = tuple(factors)
        self.L = L
        self.bitrevs = list(bitrevs)  # per pass: (F_d,) int32
        self.stage_tws = list(stage_tws)  # per pass: (F_d, L, 1)
        self.post = [list(ts) for ts in post]  # per pass: [Tbl]
        self.pro = list(pro)  # pass-1 prologue: [Tbl]
        self.epi = list(epi)  # last-pass epilogue: [Tbl]

    def tree_flatten(self):
        children = (
            list(self.bitrevs),
            list(self.stage_tws),
            [[t.arr for t in ts] for ts in self.post],
            [t.arr for t in self.pro],
            [t.arr for t in self.epi],
        )
        aux = (
            self.n,
            self.factors,
            self.L,
            tuple(tuple((t.k, t.m, t.slice_) for t in ts) for ts in self.post),
            tuple((t.k, t.m, t.slice_) for t in self.pro),
            tuple((t.k, t.m, t.slice_) for t in self.epi),
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        n, factors, L, post_mk, pro_mk, epi_mk = aux
        bitrevs, stage_tws, post_arrs, pro_arrs, epi_arrs = children
        mk = lambda a, meta: Tbl(a, meta[0], meta[1], meta[2])
        post = [
            [mk(a, meta) for a, meta in zip(arrs, metas)]
            for arrs, metas in zip(post_arrs, post_mk)
        ]
        pro = [mk(a, meta) for a, meta in zip(pro_arrs, pro_mk)]
        epi = [mk(a, meta) for a, meta in zip(epi_arrs, epi_mk)]
        return cls(n, factors, L, bitrevs, stage_tws, post, pro, epi)


def _stage_tws(p: int, w: int, F: int, L: int) -> np.ndarray:
    """Concatenated DIT stage twiddles: row (2^s + j) = w^(j * F / 2^(s+1)).

    Row 0 unused (stage 0 twiddles are 1 and skipped). w: F-th root of 1.
    """
    out = [0] * F
    logF = F.bit_length() - 1
    for s in range(logF):
        H = 1 << s
        base = pow(w, F >> (s + 1), p)
        cur = 1
        for j in range(H):
            out[H + j] = cur
            cur = cur * base % p
    return _enc(out, L, F, 1)


def _geom_tables(p, F, M, P, L, base, row_base=1, scale=1) -> List[Tbl]:
    """Tables multiplying x[t, m] by scale * row_base^t * base^(t*c) where
    c = m // P (trailing P indices share a column).  Shapes (F, L, *).
    """
    Q = M // P
    if F * Q <= FULL_TABLE_MAX and P == 1:
        vals = []
        for t in range(F):
            wt = pow(base, t, p)
            cur = pow(row_base, t, p) * scale % p
            for c in range(Q):
                vals.append(cur)
                cur = cur * wt % p
        return [Tbl(_enc(vals, L, F, Q), 1, max(Q // min(MB, Q), 1), True)]
    if P == 1:
        # compact split c = hi*Q_lo + lo; lo table is a lane slice,
        # hi table is column-constant per block
        Q_lo = MB
        while Q_lo * Q_lo < Q:
            Q_lo *= 2
        Q_hi = Q // Q_lo
        lo, hi = [], []
        for t in range(F):
            wt = pow(base, t, p)
            cur = 1
            for c in range(Q_lo):
                lo.append(cur)
                cur = cur * wt % p
            wt_hi = pow(base, t * Q_lo, p)
            cur = pow(row_base, t, p) * scale % p
            for h in range(Q_hi):
                hi.append(cur)
                cur = cur * wt_hi % p
        return [
            Tbl(_enc(lo, L, F, Q_lo), 1, Q_lo // MB, True),
            Tbl(_enc(hi, L, F, Q_hi), Q_lo // MB, Q_hi, False),
        ]
    # P >= MB: every lane block sits inside one c -> column-constant tables
    assert P % MB == 0, (P, MB)
    if F * Q <= FULL_TABLE_MAX:
        vals = []
        for t in range(F):
            wt = pow(base, t, p)
            cur = pow(row_base, t, p) * scale % p
            for c in range(Q):
                vals.append(cur)
                cur = cur * wt % p
        return [Tbl(_enc(vals, L, F, Q), P // MB, Q, False)]
    Q_lo = 1 << ((Q.bit_length() - 1 + 1) // 2)
    Q_hi = Q // Q_lo
    lo, hi = [], []
    for t in range(F):
        wt = pow(base, t, p)
        cur = 1
        for c in range(Q_lo):
            lo.append(cur)
            cur = cur * wt % p
        wt_hi = pow(base, t * Q_lo, p)
        cur = pow(row_base, t, p) * scale % p
        for h in range(Q_hi):
            hi.append(cur)
            cur = cur * wt_hi % p
    return [
        Tbl(_enc(lo, L, F, Q_lo), P // MB, Q_lo, False),
        Tbl(_enc(hi, L, F, Q_hi), P * Q_lo // MB, Q_hi, False),
    ]


def _row_geom_tables(p, M, L, base, scale=1) -> List[Tbl]:
    """Tables for x[:, m] *= scale * base^m (row-independent), rows=1."""
    if M <= FULL_TABLE_MAX:
        vals, cur = [], scale % p
        for _ in range(M):
            vals.append(cur)
            cur = cur * base % p
        return [Tbl(_enc(vals, L, 1, M), 1, max(M // min(MB, M), 1), True)]
    # compact split m = hi*M_lo + lo
    M_lo = MB
    while M_lo * M_lo < M:
        M_lo *= 2
    M_hi = M // M_lo
    lo, cur = [], 1
    for _ in range(M_lo):
        lo.append(cur)
        cur = cur * base % p
    base_hi = pow(base, M_lo, p)
    hi, cur = [], scale % p
    for _ in range(M_hi):
        hi.append(cur)
        cur = cur * base_hi % p
    return [
        Tbl(_enc(lo, L, 1, M_lo), 1, M_lo // MB, True),
        Tbl(_enc(hi, L, 1, M_hi), M_lo // MB, M_hi, False),
    ]


def build_plan(dom, *, inverse: bool, coset: bool) -> MrPlan:
    """Host-side table construction (numpy) for one ``Domain``."""
    p = dom.modulus
    L = dom.spec.n_limbs
    n = dom.size
    logn = dom.log_size
    factors = factorize(logn)
    D = len(factors)
    assert D >= 2, "mixed-radix plan needs n >= 2^9 (use the jnp path below)"
    Fs = [1 << f for f in factors]

    w = dom.group_gen_inv if inverse else dom.group_gen
    g = dom.coset_gen
    n_inv = dom.size_inv

    bitrevs, stage_tws, post = [], [], []
    P = 1
    Q = n
    for d in range(D):
        F = Fs[d]
        Q //= F
        bitrevs.append(_bitrev_perm(F))
        stage_tws.append(_stage_tws(p, pow(w, n // F, p), F, L))
        if d < D - 1:
            scale = n_inv if (inverse and d == D - 2) else 1
            post.append(
                _geom_tables(p, F, Q * P, P, L, base=pow(w, P, p), scale=scale)
            )
        else:
            post.append([])
        P *= F

    pro: List[Tbl] = []
    epi: List[Tbl] = []
    if coset and not inverse:
        # prologue on pass-1 input: x[r, c] *= g^(r*C + c), rows in
        # BIT-REVERSED order (the row permutation happens before the kernel)
        C = n // Fs[0]
        rows = [pow(g, int(r) * C, p) for r in _bitrev_perm(Fs[0])]
        pro.append(Tbl(_enc(rows, L, Fs[0], 1), 1, 1, False))
        pro.extend(_row_geom_tables(p, C, L, base=g))
    if coset and inverse:
        # epilogue on last-pass output: x[t, m] *= g^-(t*M + m)
        gi = pow(g, -1, p)
        F = Fs[-1]
        M = n // F
        rows = [pow(gi, t * M, p) for t in range(F)]
        epi.append(Tbl(_enc(rows, L, F, 1), 1, 1, False))
        epi.extend(_row_geom_tables(p, M, L, base=gi))

    return MrPlan(n, factors, L, bitrevs, stage_tws, post, pro, epi)


def device_plan(plan: MrPlan) -> MrPlan:
    """numpy tables -> device arrays (pass the result as a jit ARGUMENT —
    never close over it; see CLAUDE.md constant-folding rule)."""
    leaves, treedef = jax.tree_util.tree_flatten(plan)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(leaf) for leaf in leaves]
    )


# ---------------------------------------------------------------------------
# the per-pass column transform
# ---------------------------------------------------------------------------


def _rep_concat(x, axis, target):
    """Repeat x along ``axis`` to size ``target`` by concat-doubling.

    Mosaic cannot lower a vector.broadcast that expands sublanes and lanes
    at once (jnp broadcast chains get canonicalized into exactly that);
    log2 concatenations lower cleanly and the copies are VMEM-local.

    When ``target`` is not a power-of-two multiple of the source size
    (e.g. batch=3 lane counts), doubling overshoots — trim back with a
    zero-offset slice.  Correct for both uses: lane expansion from 1 and
    axis-0 tiling, where ``target`` is a multiple of the source period H
    (slicing 2^k*H rows down to G*H keeps whole periods).
    """
    while x.shape[axis] < target:
        x = jnp.concatenate([x, x], axis=axis)
    if x.shape[axis] != target:
        x = jax.lax.slice_in_dim(x, 0, target, axis=axis)
    return x


def _butterflies(x, tws, L, p_arr, mu):
    """DIT butterflies along axis 0 of (F, L, M); rows pre-bitreversed."""
    F = x.shape[0]
    logF = F.bit_length() - 1
    mul = lambda a, b: fp._barrett_mul_lm(a, b, p_arr, mu, L)
    add = lambda a, b: fp._add_lm(a, b, p_arr, L)
    sub = lambda a, b: fp._sub_lm(a, b, p_arr, L)
    lanes = x.shape[-1]
    for s in range(logF):
        H = 1 << s
        G = F // (2 * H)
        x4 = x.reshape(G, 2, H, L, lanes)
        u = x4[:, 0].reshape(G * H, L, lanes)
        v = x4[:, 1].reshape(G * H, L, lanes)
        if s == 0:
            m = v
        else:
            # expand (H, L, 1) -> (G*H, L, lanes) without jnp broadcasts:
            # concat-doubling on lanes, then row tiling (period H repeats)
            tw = _rep_concat(tws[H : 2 * H], -1, lanes)
            tw = _rep_concat(tw, 0, G * H)
            m = _mul_row_chunked(mul, tw, v)
        hi = add(u, m).reshape(G, 1, H, L, lanes)
        lo = sub(u, m).reshape(G, 1, H, L, lanes)
        x = jnp.concatenate([hi, lo], axis=1).reshape(F, L, lanes)
    return x


def _col_pass_jnp(x, stage_tws, L, p_arr, mu):
    return _butterflies(x, stage_tws, L, p_arr, mu)


def _col_pass_pallas(x, stage_tws, L, p_arr, mu, interpret=False):
    """Butterfly-only kernel: all log2(F) stages on a VMEM-resident block.

    Tables (pro/post/epi) are applied OUTSIDE via ``_mul3d`` — fusing
    column-constant table blocks into this kernel crashed the Mosaic
    compile helper (and lane-deficient operands hit the unimplemented
    sublane+lane broadcast), so the kernel touches only full-lane data
    plus the (F, L, 1) stage-twiddle input, which compiles cleanly as the
    non-sliced mul operand.
    """
    F, _, Mtot = x.shape
    mb = _mb_for(Mtot)
    grid = Mtot // mb

    def kernel(p_ref, mu_ref, tw_ref, x_ref, o_ref):
        o_ref[...] = _butterflies(
            x_ref[...], tw_ref[...], L, p_ref[...], mu_ref[...]
        )

    p_spec = pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((L * L + 4, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((F, L, 1), lambda j: (0, 0, 0), memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((F, L, mb), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, L, Mtot), U32),
        grid=(grid,),
        in_specs=[p_spec, mu_spec, tw_spec, x_spec],
        out_specs=x_spec,
        interpret=interpret,
    )(p_arr, mu, stage_tws, x)


def _mul3d(x, tbl, L, p_arr, mu, use_kernel, interpret=False):
    """Elementwise field mul of (F, L, M) by an equally-shaped table."""
    if not use_kernel:
        return fp._barrett_mul_lm(x, tbl, p_arr, mu, L)
    F, _, Mtot = x.shape
    mb = _mb_for(Mtot)
    grid = Mtot // mb

    def kernel(p_ref, mu_ref, x_ref, t_ref, o_ref):
        mul = lambda a, b: fp._barrett_mul_lm(a, b, p_ref[...], mu_ref[...], L)
        t = t_ref[...]
        x_full = x_ref[...]
        if t.shape[0] == x_full.shape[0]:
            o_ref[...] = _mul_row_chunked(mul, x_full, t)
        else:  # row-independent table (rows=1): broadcast over row chunks
            rows = x_full.shape[0]
            if rows <= MUL_CHUNK_ROWS:
                o_ref[...] = mul(x_full, t)
            else:
                # factorize() yields power-of-two F, so full chunks only;
                # a ragged tail would need a clamped final store
                assert rows % MUL_CHUNK_ROWS == 0, "rows must chunk evenly"
                for i in range(0, rows, MUL_CHUNK_ROWS):
                    o_ref[i : i + MUL_CHUNK_ROWS] = mul(
                        x_full[i : i + MUL_CHUNK_ROWS], t
                    )

    rows = tbl.shape[0]  # F, or 1 (row-independent: leading broadcast)
    p_spec = pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((L * L + 4, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((F, L, mb), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((rows, L, mb), lambda j: (0, 0, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, L, Mtot), U32),
        grid=(grid,),
        in_specs=[p_spec, mu_spec, d_spec, t_spec],
        out_specs=d_spec,
        interpret=interpret,
    )(p_arr, mu, x, tbl)


# ---------------------------------------------------------------------------
# the multi-pass driver
# ---------------------------------------------------------------------------


def transform(
    spec: FieldSpec,
    plan: MrPlan,
    x: jnp.ndarray,
    *,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the (i)NTT described by ``plan`` on x of shape (..., n, L).

    Leading batch axes are folded into the lane axis (they transform
    independently and identically).
    """
    L = spec.n_limbs
    n = plan.n
    Fs = [1 << f for f in plan.factors]
    D = len(Fs)
    if use_kernel is None:
        use_kernel = fp.use_pallas()

    p_arr = jnp.asarray(np.asarray(spec.modulus_limbs, np.uint32)[:, None])
    mu = fp.fold_const(spec)

    batch = x.shape[:-2]
    nb = int(np.prod(batch, dtype=np.int64)) if batch else 1
    # (..., n, L) -> (F1, L, nb*C): batches OUTERMOST on the lane axis so
    # per-batch table addressing (periodic in M_d) is unchanged
    C = n // Fs[0]
    x = x.reshape(nb, Fs[0], C, L).transpose(1, 3, 0, 2).reshape(Fs[0], L, nb * C)

    def apply_tables(x, tbls, M):
        mb = min(MB, M)
        for t in tbls:
            full = _expand_jnp(t, M, mb, nb)
            x = _mul3d(x, full, L, p_arr, mu, use_kernel, interpret=interpret)
        return x

    Q = n
    for d in range(D):
        F = Fs[d]
        Q //= F
        x = jnp.take(x, plan.bitrevs[d], axis=0)
        if d == 0 and plan.pro:
            x = apply_tables(x, plan.pro, n // F)
        if use_kernel:
            x = _col_pass_pallas(x, plan.stage_tws[d], L, p_arr, mu, interpret=interpret)
        else:
            x = _col_pass_jnp(x, plan.stage_tws[d], L, p_arr, mu)
        if plan.post[d]:
            x = apply_tables(x, plan.post[d], n // F)
        if d == D - 1 and plan.epi:
            x = apply_tables(x, plan.epi, n // F)
        if d < D - 1:
            # (F_d, L, nb*M_d) -> (F_{d+1}, L, nb*M_{d+1})
            P = 1
            for e in range(d):
                P *= Fs[e]
            Fn = Fs[d + 1]
            Qn = Q // Fn
            x = x.reshape(F, L, nb, Fn, Qn, P)
            x = x.transpose(3, 1, 2, 4, 0, 5)
            x = x.reshape(Fn, L, nb * Qn * F * P)
    # exit: (F_D, L, nb*M_D) -> (..., n, L)
    M = n // Fs[-1]
    x = x.reshape(Fs[-1], L, nb, M).transpose(2, 0, 3, 1).reshape(*batch, n, L)
    return x


# ---------------------------------------------------------------------------
# plan bundle per domain (all four directions)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class MrPlanSet:
    """fft / ifft / coset_fft / coset_ifft plans for one domain size."""

    def __init__(self, fwd, inv, coset_fwd, coset_inv):
        self.fwd, self.inv = fwd, inv
        self.coset_fwd, self.coset_inv = coset_fwd, coset_inv

    def tree_flatten(self):
        return (self.fwd, self.inv, self.coset_fwd, self.coset_inv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def build_plan_set(dom) -> MrPlanSet:
    return MrPlanSet(
        build_plan(dom, inverse=False, coset=False),
        build_plan(dom, inverse=True, coset=False),
        build_plan(dom, inverse=False, coset=True),
        build_plan(dom, inverse=True, coset=True),
    )
