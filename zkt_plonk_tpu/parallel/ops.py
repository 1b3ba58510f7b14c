"""Sharded (multi-chip) primitives — explicit shard_map collectives.

The reference has no distributed execution at all (rayon shared-memory
only — SURVEY.md §2.5); this module is the TPU-native replacement layer:
polynomials/point arrays are DOMAIN-SHARDED in contiguous blocks over a
1-D mesh axis, and every cross-shard data motion is an explicit collective
(``all_to_all`` / ``ppermute`` / ``all_gather``), never GSPMD inference —
per-device programs then compile like single-chip programs of shard size.

Every function here is designed to be called INSIDE a ``jax.shard_map``
body: arguments are LOCAL shards, ``axis_name`` names the mesh axis, and
global semantics are documented per function.

Sharded radix-2 NTT design (replaces ark-poly Radix2 FFT,
``plonk-core/src/util.rs:63-140``, at scale):

* the DIT bit-reversal over n = D*m elements factors into ONE all_to_all
  plus two purely local static gathers — for output device d, local r:
  src = rev_m(r)*D + rev_D(d), so each device needs exactly m/D elements
  from every other device (an all_to_all pattern), and the final local
  arrangement is the LOCAL m-point bit-reversal of the received block;
* the first log2(m) butterfly stages are shard-local (partner index
  i ^ half stays in-block for half < m) and reuse the single-chip
  ``_butterfly_stages`` with a stride-D twiddle slice;
* the last log2(D) stages pair WHOLE shards: one ``ppermute`` exchange
  with the partner device + an elementwise combine per stage.

Communication per transform: (1 + log2 D) shard volumes over ICI.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..fields import device as fd
from ..fields.limbs import FieldSpec
from ..ops import msm as msm_mod
from ..ops.msm import _tree_reduce_points
from ..ops.ntt import _butterfly_stages


class ShardNttTables(NamedTuple):
    """Per-device tables for a size-n NTT sharded over D devices.

    Leaves marked [shard] differ per device and must enter shard_map with
    a block-sharded in_spec; the rest are replicated.
    """

    rev_d: jnp.ndarray  # (D,) int32 — log2(D)-bit reversal (involution)
    rev_m: jnp.ndarray  # (m,) int32 — local m-point bit reversal
    tw_local: jnp.ndarray  # (m/2, L) — tw[::D], drives the local stages
    tw_inv_local: jnp.ndarray  # (m/2, L)
    tw_global: jnp.ndarray  # (n/2, L) — gathered by the log2(D) global stages
    tw_inv_global: jnp.ndarray  # (n/2, L)
    n_inv: jnp.ndarray  # (L,)
    coset_pow: jnp.ndarray  # (n, L) [shard] — g^i for the local block
    coset_ipow: jnp.ndarray  # (n, L) [shard]


def build_shard_ntt_tables(domain, n_devices: int) -> ShardNttTables:
    """Host-side table build for ``domain.size`` split over ``n_devices``.

    Returned leaves are numpy; pass through ``jax.device_put`` with the
    matching shardings (see ``shard_specs``) or hand to shard_map in_specs.
    """
    n, D = domain.size, n_devices
    assert n % D == 0 and D & (D - 1) == 0, "need power-of-two devices dividing n"
    m = n // D
    log_d = D.bit_length() - 1

    def _rev(k, bits):
        out = 0
        for b in range(bits):
            out |= ((k >> b) & 1) << (bits - 1 - b)
        return out

    rev_d = np.asarray([_rev(j, log_d) for j in range(D)], np.int32)
    rev_m = np.asarray(
        [_rev(j, m.bit_length() - 1) for j in range(m)], np.int32
    )
    half = max(1, n // 2)
    tw = domain.powers_array(domain.group_gen, half)
    tw_inv = domain.powers_array(domain.group_gen_inv, half)
    return ShardNttTables(
        rev_d=rev_d,
        rev_m=rev_m,
        tw_local=tw[::D][: max(1, m // 2)],
        tw_inv_local=tw_inv[::D][: max(1, m // 2)],
        tw_global=tw,
        tw_inv_global=tw_inv,
        n_inv=domain.spec.encode([domain.size_inv])[0],
        coset_pow=domain.powers_array(domain.coset_gen, n),
        coset_ipow=domain.powers_array(domain.coset_gen_inv, n),
    )


def shard_ntt_specs(axis_name: str = "poly"):
    """PartitionSpec pytree matching ``ShardNttTables`` for shard_map."""
    from jax.sharding import PartitionSpec as P

    rep = P()
    return ShardNttTables(
        rev_d=rep,
        rev_m=rep,
        tw_local=rep,
        tw_inv_local=rep,
        tw_global=rep,
        tw_inv_global=rep,
        n_inv=rep,
        coset_pow=P(axis_name, None),
        coset_ipow=P(axis_name, None),
    )


# ---------------------------------------------------------------------------
# sharded bit reversal + butterflies
# ---------------------------------------------------------------------------


def _axis_size(axis_name: str) -> int:
    return lax.axis_size(axis_name)


def pbitrev(x, rev_d, rev_m, axis_name: str):
    """Global bit-reversal permutation of a block-sharded poly axis.

    x: local (..., m, L) shard of a global (..., n, L) array; returns the
    local shard of x_global[bitrev(i)].  One all_to_all + two local static
    gathers (see module docstring for the index algebra).
    """
    D = _axis_size(axis_name)
    if D == 1:
        return jnp.take(x, rev_m, axis=-2)
    m = x.shape[-2]
    # local prep: column c of the (m/D, D) view goes to dest d = rev_d[c];
    # equivalently dest-major columns are a gather by rev_d (an involution)
    xcols = x.reshape(*x.shape[:-2], m // D, D, x.shape[-1])
    xcols = jnp.take(xcols, rev_d, axis=-2)
    xsend = jnp.moveaxis(xcols, -2, 0)  # (D, ..., m/D, L)
    recv = lax.all_to_all(xsend, axis_name, split_axis=0, concat_axis=0, tiled=True)
    # recv[a, ..., b] = x_dev_a[b*D + rev_d[my_d]]
    flat = jnp.moveaxis(recv, 0, -3).reshape(*x.shape[:-2], m, x.shape[-1])
    return jnp.take(flat, rev_m, axis=-2)


def _global_stages(spec, x, tw_global, axis_name: str, m: int):
    """The last log2(D) butterfly stages: whole-shard ppermute exchanges."""
    D = _axis_size(axis_name)
    d = lax.axis_index(axis_name)
    n = m * D
    r = jnp.arange(m, dtype=jnp.int32)
    log_d = D.bit_length() - 1
    for s_g in range(log_d):
        hb = 1 << s_g
        perm = [(j, j ^ hb) for j in range(D)]
        other = lax.ppermute(x, axis_name, perm)
        is_lower = (d & hb) == 0
        stride = D // (2 * hb)
        tw_idx = ((d & (hb - 1)) * m + r) * stride
        tw = jnp.take(tw_global, tw_idx, axis=0)  # (m, L)
        u = jnp.where(is_lower, x, other)
        v = jnp.where(is_lower, other, x)
        t = fd.mul(spec, tw, v)
        x = jnp.where(is_lower, fd.add(spec, u, t), fd.sub(spec, u, t))
    return x


def pfft(spec: FieldSpec, st: ShardNttTables, coeffs, axis_name: str = "poly"):
    """Sharded coefficients -> sharded natural-order evaluations."""
    x = pbitrev(coeffs, st.rev_d, st.rev_m, axis_name)
    x = _butterfly_stages(spec, x, st.tw_local)
    return _global_stages(spec, x, st.tw_global, axis_name, x.shape[-2])


def pifft(spec: FieldSpec, st: ShardNttTables, evals, axis_name: str = "poly"):
    """Sharded natural-order evaluations -> sharded coefficients."""
    x = pbitrev(evals, st.rev_d, st.rev_m, axis_name)
    x = _butterfly_stages(spec, x, st.tw_inv_local)
    x = _global_stages(spec, x, st.tw_inv_global, axis_name, x.shape[-2])
    return fd.mul(spec, x, st.n_inv)


def pcoset_fft(spec: FieldSpec, st: ShardNttTables, coeffs, axis_name: str = "poly"):
    return pfft(spec, st, fd.mul(spec, coeffs, st.coset_pow), axis_name)


def pcoset_ifft(spec: FieldSpec, st: ShardNttTables, evals, axis_name: str = "poly"):
    return fd.mul(spec, pifft(spec, st, evals, axis_name), st.coset_ipow)


# ---------------------------------------------------------------------------
# sharded scans / rolls
# ---------------------------------------------------------------------------


def proll(x, shift: int, axis_name: str, axis: int = -2):
    """Global roll by a small static ``shift`` along a block-sharded axis.

    Local roll + one ppermute of the |shift| boundary rows.
    """
    D = _axis_size(axis_name)
    k = abs(shift)
    m = x.shape[axis]
    assert k <= m, "roll distance must fit in one shard"
    rolled = jnp.roll(x, shift, axis=axis)
    if D == 1 or k == 0:
        return rolled
    if shift < 0:
        # my trailing k rows must become the leading k rows of neighbor d+1
        boundary = lax.slice_in_dim(x, 0, k, axis=axis)
        recv = lax.ppermute(
            boundary, axis_name, [((j + 1) % D, j) for j in range(D)]
        )
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(m - k, m)
        return rolled.at[tuple(idx)].set(recv)
    boundary = lax.slice_in_dim(x, m - k, m, axis=axis)
    recv = lax.ppermute(boundary, axis_name, [((j - 1) % D, j) for j in range(D)])
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, k)
    return rolled.at[tuple(idx)].set(recv)


def pprefix_products(spec: FieldSpec, x, axis: int, axis_name: str):
    """Global inclusive prefix products along a block-sharded axis.

    Local log-depth scan + all_gather of the D shard totals + a tiny
    D-element exclusive scan, replicated on every device.
    """
    D = _axis_size(axis_name)
    local = fd.prefix_products(spec, x, axis=axis)
    if D == 1:
        return local
    m = x.shape[axis]
    total = lax.index_in_dim(local, m - 1, axis=axis, keepdims=False)
    totals = lax.all_gather(total, axis_name)  # (D, ..., L)
    incl = fd.prefix_products(spec, totals, axis=0)
    excl = jnp.roll(incl, 1, axis=0)
    excl = excl.at[0].set(fd.one(spec, excl.shape[1:-1]))
    d = lax.axis_index(axis_name)
    mine = lax.dynamic_index_in_dim(excl, d, axis=0, keepdims=False)
    return fd.mul(spec, local, jnp.expand_dims(mine, axis))


def pflip(x, axis: int, axis_name: str):
    """Global flip along a block-sharded axis: local flip + device-order
    reversal (one ppermute)."""
    D = _axis_size(axis_name)
    loc = jnp.flip(x, axis=axis)
    if D == 1:
        return loc
    return lax.ppermute(loc, axis_name, [(j, D - 1 - j) for j in range(D)])


def pbatch_inverse(spec: FieldSpec, x, axis: int, axis_name: str):
    """Global Montgomery-trick batch inversion along a sharded axis."""
    D = _axis_size(axis_name)
    if D == 1:
        return fd.batch_inverse(spec, x, axis=axis)
    zero_mask = fd.is_zero(spec, x)
    safe = jnp.where(zero_mask[..., None], fd.one(spec, x.shape[:-1]), x)

    incl_pre = pprefix_products(spec, safe, axis, axis_name)
    incl_suf = pflip(
        pprefix_products(spec, pflip(safe, axis, axis_name), axis, axis_name),
        axis,
        axis_name,
    )
    m = x.shape[axis]
    total_local = lax.index_in_dim(incl_pre, m - 1, axis=axis, keepdims=False)
    # global total = last device's inclusive prefix total
    totals = lax.all_gather(total_local, axis_name)
    total = totals[-1]
    total_inv = fd.inv(spec, total)

    ones_row = fd.one(spec, ())
    pre_excl = _shift_one(spec, incl_pre, 1, axis, axis_name, ones_row)
    suf_excl = _shift_one(spec, incl_suf, -1, axis, axis_name, ones_row)
    out = fd.mul(
        spec, fd.mul(spec, pre_excl, suf_excl), jnp.expand_dims(total_inv, axis)
    )
    return jnp.where(zero_mask[..., None], jnp.zeros_like(x), out)


def _shift_one(spec, arr, shift, axis, axis_name, fill_row):
    """Global shift by ±1 along the sharded axis, filling the vacated
    global boundary with ``fill_row`` (no wraparound)."""
    D = _axis_size(axis_name)
    d = lax.axis_index(axis_name)
    out = proll(arr, shift, axis_name, axis=axis)
    m = arr.shape[axis]
    idx = [slice(None)] * arr.ndim
    if shift > 0:
        idx[axis] = slice(0, shift)
        boundary_dev = 0
    else:
        idx[axis] = slice(m + shift, m)
        boundary_dev = D - 1
    patch = jnp.broadcast_to(fill_row, out[tuple(idx)].shape)
    patched = out.at[tuple(idx)].set(patch)
    return jnp.where(d == boundary_dev, patched, out)


# ---------------------------------------------------------------------------
# sharded polynomial evaluation / synthetic division (round 5 + openings)
# ---------------------------------------------------------------------------


def _device_factor(spec: FieldSpec, xm, axis_name: str):
    """xm^d for this device's index d (log2 D static squarings)."""
    D = _axis_size(axis_name)
    d = lax.axis_index(axis_name)
    fac = jnp.zeros_like(xm).at[..., 0].set(1)
    cur = xm
    b = 0
    while (1 << b) < D:
        bit = (d >> b) & 1
        fac = jnp.where(bit == 1, fd.mul(spec, fac, cur), fac)
        cur = fd.mul(spec, cur, cur)
        b += 1
    return fac, cur  # cur == xm^(2^ceil(log2 D)) == xm^D for pow2 D


def pshard_powers(spec: FieldSpec, x, m: int, axis_name: str):
    """(x^(d*m + j))_{j<m} for this device d, plus x^n (n = D*m), replicated.

    Returns (local_powers (m, L), x_n (L,)).
    """
    base = fd.powers(spec, x, m)  # (m, L) — identical on every device
    xm = fd.mul(spec, base[m - 1], x)  # x^m
    fac, xn = _device_factor(spec, xm, axis_name)
    return fd.mul(spec, base, fac), xn


def _tree_add(spec: FieldSpec, x, axis: int):
    """Field add-reduce along ``axis`` (log depth)."""
    k = x.shape[axis]
    while k > 1:
        half = (k + 1) // 2
        lo = lax.slice_in_dim(x, 0, half, axis=axis)
        hi = lax.slice_in_dim(x, half, k, axis=axis)
        if hi.shape[axis] < half:
            pad = [(0, 0)] * x.ndim
            pad[axis] = (0, half - hi.shape[axis])
            hi = jnp.pad(hi, pad)
        x = fd.add(spec, lo, hi)
        k = half
    return jnp.squeeze(x, axis=axis)


def peval_many(
    spec: FieldSpec, bodies, tails, x, axis_name: str = "poly"
):
    """Evaluate committed (body shard, replicated tail) polys at scalar x.

    bodies: (B, m, L) shard of the n coefficient rows; tails: (B, 4, L)
    replicated rows n..n+3.  Returns (B, L) replicated values.
    """
    m = bodies.shape[-2]
    local_powers, xn = pshard_powers(spec, x, m, axis_name)
    terms = fd.mul(spec, bodies, local_powers)
    partial = _tree_add(spec, terms, axis=-2)  # (B, L) local
    alls = lax.all_gather(partial, axis_name, axis=0)  # (D, B, L)
    body_sum = _tree_add(spec, alls, axis=0)
    tail_powers = jnp.stack(
        [
            xn,
            fd.mul(spec, xn, x),
            fd.mul(spec, fd.mul(spec, xn, x), x),
            fd.mul(spec, fd.mul(spec, fd.mul(spec, xn, x), x), x),
        ]
    )  # (4, L) = x^n..x^(n+3)
    tail_sum = _tree_add(spec, fd.mul(spec, tails, tail_powers), axis=-2)
    return fd.add(spec, body_sum, tail_sum)


def _local_suffix_sums(spec: FieldSpec, x, axis: int = -2):
    """Inclusive suffix sums along ``axis`` (log-depth rolls)."""
    n = x.shape[axis]
    sh = [1] * x.ndim
    sh[axis] = n
    idx = jnp.arange(n).reshape(sh)
    y = x
    d = 1
    while d < n:
        shifted = jnp.roll(y, -d, axis=axis)
        summed = fd.add(spec, y, shifted)
        y = jnp.where(idx < n - d, summed, y)
        d <<= 1
    return y


def pdivide_by_linear(
    spec: FieldSpec, body, tail, x, x_inv, axis_name: str = "poly"
):
    """(P(X) - P(x)) / (X - x) for a committed (body, tail) polynomial.

    Sharded analog of ``kzg.divide_by_linear``: q_i = x^{-(i+1)} Σ_{j>i}
    c_j x^j over the GLOBAL n+4 coefficient axis.  For body row i the
    cross-shard part of the suffix is a per-device offset (all_gather of
    the D shard totals) plus the replicated tail total — no body exchange.

    body: (m, L) shard; tail: (4, L) replicated.
    Returns (q_body (m, L) shard, q_tail (4, L) replicated).
    """
    D = _axis_size(axis_name)
    d = lax.axis_index(axis_name)
    m = body.shape[-2]

    pow_x, xn = pshard_powers(spec, x, m, axis_name)
    u = fd.mul(spec, body, pow_x)  # c_j x^j (local rows)
    local_suf = _local_suffix_sums(spec, u)  # (m, L)

    # tail terms u_{n+j} and their suffix (replicated)
    xpow = xn
    tail_u = []
    for j in range(4):
        tail_u.append(fd.mul(spec, tail[j], xpow))
        xpow = fd.mul(spec, xpow, x)
    tail_u = jnp.stack(tail_u)  # (4, L)
    tail_suf = _local_suffix_sums(spec, tail_u)  # inclusive
    tail_total = tail_suf[0]

    shard_total = local_suf[0]  # Σ over this shard
    gathered = lax.all_gather(shard_total, axis_name, axis=0)  # (D, L)
    gsuf = _local_suffix_sums(spec, gathered)  # (D, L) inclusive over devices
    # offset_d = Σ_{d' > d} shard totals
    gsuf_pad = jnp.concatenate([gsuf, fd.zeros(spec, (1,))], axis=0)
    offset = lax.dynamic_index_in_dim(gsuf_pad, d + 1, axis=0, keepdims=False)

    # exclusive global suffix at body row i: local_suf[i+1] + offset + tail_total
    excl = jnp.concatenate([local_suf[1:], fd.zeros(spec, (1,))], axis=0)
    excl = fd.add(spec, excl, fd.add(spec, offset, tail_total))

    # x^{-(dm+j+1)} = x_inv^(dm+j) * x_inv
    pow_xi, xin = pshard_powers(spec, x_inv, m, axis_name)
    q_body = fd.mul(spec, fd.mul(spec, excl, pow_xi), x_inv)

    # tail quotient rows (global n..n+3): excl suffix is within the tail;
    # x^-(n+j+1) = x_inv^n * x_inv^(j+1)
    tail_excl = jnp.concatenate([tail_suf[1:], fd.zeros(spec, (1,))], axis=0)
    acc = fd.mul(spec, xin, x_inv)
    rows = []
    for j in range(4):
        rows.append(fd.mul(spec, tail_excl[j], acc))
        acc = fd.mul(spec, acc, x_inv)
    q_tail = jnp.stack(rows)
    return q_body, q_tail


# ---------------------------------------------------------------------------
# sharded MSM
# ---------------------------------------------------------------------------


def pmsm_totals(
    fq_spec: FieldSpec,
    b3,
    points,
    scalars,
    fr_bits: int,
    axis_name: str = "poly",
    c: int = 0,
    groups: int = 0,
):
    """Sharded Pippenger up to per-window totals (W, 3, L), replicated.

    Each device buckets/reduces its point shard locally (the single-chip
    grouped accumulation), then the tiny (W, 3, L) per-device window
    totals are all_gathered and tree-summed with log2(D) dense EC adds —
    the collective replacement for arkworks' rayon bucket reduction
    (``plonk-core/src/commitment.rs:42``).
    """
    tot = msm_mod.msm_totals(fq_spec, b3, points, scalars, fr_bits, c=c, groups=groups)
    D = _axis_size(axis_name)
    if D == 1:
        return tot
    alls = lax.all_gather(tot, axis_name)  # (D, W, 3, L)
    return _tree_reduce_points(fq_spec, b3, alls, axis=0)


def pcommit_totals(
    fq_spec,
    b3,
    powers_shard,
    tail_points,
    coeffs_shard,
    tail_coeffs,
    fr_bits: int,
    c: int,
    axis_name: str = "poly",
    groups: int = 0,
):
    """Window totals for an MSM over (n sharded + 4 replicated-tail) rows.

    The prover commits uniform (n+4)-coefficient polynomials (wraparound
    blinding); under domain sharding the n-part is sharded and the 4-row
    tail is replicated.  The tail's tiny MSM runs replicated on every
    device (no comm) and folds into the gathered window totals.

    ``c`` must be the window size the host uses for the final fold
    (``msm.msm_window_size``) — it parameterizes the local accumulation
    so window totals align across devices and with the host fold.

    The replicated tail rides the MAIN accumulation: the 4 tail rows are
    appended to every device's point shard with their coefficients masked
    to zero except on device 0 (zero digits land in the never-weighted
    0 bucket).  One bucket graph instead of two — the separate tail MSM
    doubled the XLA compile cost of every commit program.
    """
    d = lax.axis_index(axis_name)
    pts = jnp.concatenate([powers_shard, tail_points], axis=0)
    tc = jnp.where(d == 0, tail_coeffs, jnp.zeros_like(tail_coeffs))
    cfs = jnp.concatenate([coeffs_shard, tc], axis=0)
    return pmsm_totals(
        fq_spec, b3, pts, cfs, fr_bits, axis_name=axis_name, c=c,
        groups=groups,
    )
