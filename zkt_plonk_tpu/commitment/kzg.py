"""KZG10 polynomial commitment scheme — device commits, host checks.

Role-equivalent of the reference's ``KZG10 = SonicKZG10`` instantiation
(``plonk-core/src/commitment.rs:24-46``):

* ``setup``/``trim``: SRS powers [tau^i]G1 generated ON DEVICE with a
  fixed-base windowed MSM (``ops/msm.fixed_base_msm``) — the host only
  computes the scalar powers;
* ``commit``: variable-base Pippenger MSM on device (``ops/msm.msm``);
* ``open``: eta-powers aggregation + synthetic division by (X - xi), both
  as O(n) device ops (the division via a suffix-sum scan, not a sequential
  Horner recurrence);
* ``check``: host-side pairing equation (O(1) work).

Proof/commitment points cross to the host as affine coordinates.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import curve_host as ch, pairing as pairing_mod
from ..curves.context import CurveCtx
from ..fields import device as fd
from ..fields.limbs import ints_to_array
from ..ops import ec, msm


@dataclass(eq=False)
class CommitterKey:
    """SRS G1 powers on device: (N, 3, L) projective, plus curve constants."""

    ctx: CurveCtx
    powers: jnp.ndarray  # (N, 3, L)
    b3: jnp.ndarray

    @property
    def max_degree(self) -> int:
        return self.powers.shape[0] - 1


@dataclass(eq=False)
class VerifierKeyKZG:
    """Host-side verification elements."""

    ctx: CurveCtx
    g1: Tuple  # G1 generator (affine host)
    g2: Tuple  # G2 generator
    tau_g2: Tuple  # [tau] G2


def setup(
    ctx: CurveCtx, max_degree: int, tau: Optional[int] = None, rng=None
) -> Tuple[CommitterKey, VerifierKeyKZG]:
    """Generate a (testing) SRS.  ``tau`` is sampled if not given.

    Production deployments load an externally ceremonies SRS instead —
    see ``load_srs``.
    """
    r = ctx.curve.fr.modulus
    if tau is None:
        import secrets

        tau = (rng.randrange(r) if rng is not None else secrets.randbelow(r)) or 1

    # host: scalar powers; device: fixed-base MSM to materialize [tau^i]G1
    powers_int = [1] * (max_degree + 1)
    for i in range(1, max_degree + 1):
        powers_int[i] = powers_int[i - 1] * tau % r

    fr_spec = ctx.fr_spec
    fq_spec = ctx.fq_spec
    b3 = ec.b3_const(fq_spec, ctx.curve.b)
    if max_degree <= 4096:
        # small SRS (dryrun / unit tests): host windowed fixed-base MSM —
        # under the device dispatch floor and zero XLA compile time
        W = msm.num_windows(r.bit_length(), 8)
        base = ctx.g1
        table = []
        for _ in range(W):
            row = [None]
            for _ in range(255):
                row.append(ch.add(row[-1], base))
            table.append(row)
            for _ in range(8):
                base = ch.double(base)
        pts = []
        for s in powers_int:
            acc = None
            for w in range(W):
                d = (s >> (8 * w)) & 255
                if d:
                    acc = ch.add(acc, table[w][d])
            pts.append(acc)
        powers = jnp.asarray(
            ec.from_affine_host(
                fq_spec,
                [None if a is None else (int(a[0]), int(a[1])) for a in pts],
            )
        )
    else:
        tables = jnp.asarray(msm.fixed_base_tables(ctx, ctx.g1, c=8))
        scalars = jnp.asarray(ints_to_array(powers_int, fr_spec.n_limbs))
        powers = jax.jit(
            lambda t, s, b: msm.fixed_base_msm(fq_spec, b, t, s, r.bit_length(), c=8)
        )(tables, scalars, b3)

    ck = CommitterKey(ctx=ctx, powers=powers, b3=b3)
    cvk = VerifierKeyKZG(
        ctx=ctx,
        g1=ctx.g1,
        g2=ctx.g2,
        tau_g2=ch.scalar_mul(ctx.g2, tau),
    )
    return ck, cvk


def trim(ck: CommitterKey, cvk: VerifierKeyKZG, degree: int):
    assert ck.max_degree >= degree, (
        f"SRS supports degree {ck.max_degree}, circuit needs {degree} "
        f"(circuit_bound * 4) — regenerate with a larger max_degree"
    )
    return CommitterKey(ctx=ck.ctx, powers=ck.powers[: degree + 1], b3=ck.b3), cvk


# ---------------------------------------------------------------------------
# commit / open (device)
# ---------------------------------------------------------------------------


def commit_device(ck: CommitterKey, coeffs: jnp.ndarray, c: int = 0):
    """coeffs: (m, L) canonical -> projective commitment point (3, L) (device).

    Window size defaults adaptively: log2(m)-sized buckets keep the
    bucket-reduction work proportional to the point count.
    """
    m = coeffs.shape[0]
    fr_bits = ck.ctx.curve.fr.modulus.bit_length()
    return msm.msm(ck.ctx.fq_spec, ck.b3, ck.powers[:m], coeffs, fr_bits, c=c)


class Committer:
    """Batched commitment dispatcher used by the prover/setup.

    On TPU (or for large degrees) commits run as the device Pippenger MSM —
    ONE compiled shape per polynomial length.  On the CPU test backend the
    device MSM is pathologically slow under XLA:CPU, so small commits fall
    back to a host MSM over the same SRS (identical results); the device
    path stays covered by the dedicated MSM test suite.
    """

    def __init__(self, ck: CommitterKey):
        self.ck = ck
        fr_bits = ck.ctx.curve.fr.modulus.bit_length()

        # powers/b3 are jit ARGUMENTS (closed-over arrays become constants
        # and poison the limb-multiply compile — see CLAUDE.md)
        def _commit(coeffs, powers, b3):
            m = coeffs.shape[0]
            return msm.msm(ck.ctx.fq_spec, b3, powers[:m], coeffs, fr_bits)

        self._jit_commit = jax.jit(_commit)

        # device computes per-window totals; the serial Horner fold over
        # windows runs on host (see msm.fold_windows_host).  The whole
        # BATCH runs as one program and crosses to host in one device_get:
        # each dispatch+device_get round-trip through the axon relay costs
        # ~25-30ms, so per-poly calls would dominate small commits.
        def _totals_batch(coeffs_batch, powers, b3):
            m = coeffs_batch.shape[1]
            return jax.lax.map(
                lambda cfs: msm.msm_totals(
                    ck.ctx.fq_spec, b3, powers[:m], cfs, fr_bits
                ),
                coeffs_batch,
            )  # (B, W, 3, L)

        self._jit_totals_batch = jax.jit(_totals_batch)
        self._host_powers = None
        self._native_pts = None

    def _use_host(self, m: int) -> bool:
        # the XLA:CPU device MSM is pathological; on the CPU backend route
        # everything to the host — through the native C++ Pippenger
        # (``native/zkt_native.cpp``, arkworks-VariableBaseMSM-role) when
        # available, else the Python host MSM below a size cutoff
        if jax.default_backend() != "cpu":
            return False
        return self._native_available() or m <= (1 << 13)

    def _native_available(self) -> bool:
        from .. import _native

        return self.ck.ctx.name == "bn254" and _native.get_lib() is not None

    def _native_srs(self, m: int):
        from .. import _native

        if self._native_pts is None or self._native_pts[0].shape[0] < m:
            proj = _native.limbs16_to_u64(np.asarray(self.ck.powers[:m]))
            self._native_pts = _native.g1_normalize_batch(proj)
        aff, inf = self._native_pts
        return aff[:m], inf[:m]

    def _host_srs(self, m: int):
        from ..ops import ec as ec_mod

        if self._host_powers is None or len(self._host_powers) < m:
            pts = ec_mod.to_affine_host(
                self.ck.ctx.fq_spec, np.asarray(self.ck.powers[:m])
            )
            Fq = self.ck.ctx.Fq
            self._host_powers = [
                None if p_ is None else (Fq(p_[0]), Fq(p_[1])) for p_ in pts
            ]
        return self._host_powers[:m]

    def commit_many(self, polys) -> list:
        """polys: (B, m, L) device array or list of (m, L). Returns a list
        of host affine points.  All polys must share one length: the host
        window fold below uses a single window size c derived from it, and
        a mixed-length batch straddling a c boundary would silently fold
        with the wrong c."""
        B = len(polys)
        m = polys[0].shape[0]
        assert all(polys[i].shape[0] == m for i in range(B)), (
            "commit_many requires uniform-length polynomials"
        )
        if self._use_host(m):
            coeff_rows = np.asarray(polys)
            if self._native_available():
                from .. import _native

                aff, inf = self._native_srs(m)
                return [
                    _native.g1_msm(aff, inf, _native.limbs16_to_u64(coeff_rows[i]))
                    for i in range(B)
                ]
            from ..curves import curve_host as ch

            srs = self._host_srs(m)
            out = []
            spec = self.ck.ctx.fr_spec
            for i in range(B):
                scalars = spec.decode(coeff_rows[i])
                acc = ch.msm(srs, scalars)
                out.append(None if acc is None else (int(acc[0]), int(acc[1])))
            return out
        stacked = polys if hasattr(polys, "shape") else jnp.stack(list(polys))
        totals = np.asarray(
            self._jit_totals_batch(stacked, self.ck.powers, self.ck.b3)
        )  # ONE dispatch + ONE device_get for the whole batch
        c = msm.msm_window_size(m)
        Fq = self.ck.ctx.Fq
        return [
            msm.fold_windows_host(self.ck.ctx.fq_spec, Fq, totals[i], c)
            for i in range(B)
        ]


def commitment_to_host(ck: CommitterKey, point) -> Optional[Tuple[int, int]]:
    return ec.to_affine_host(ck.ctx.fq_spec, np.asarray(point))[0]


def divide_by_linear(
    fr_spec, coeffs: jnp.ndarray, xi_powers: jnp.ndarray, xi_inv_powers: jnp.ndarray
) -> jnp.ndarray:
    """(P(X) - P(xi)) / (X - xi) on device.

    q_i = xi^{-(i+1)} * Σ_{j>i} c_j xi^j — an elementwise multiply, a
    log-depth suffix-sum scan, and another elementwise multiply.
    xi_powers: (m, L) = [1, xi, ...]; xi_inv_powers: (m, L) = [xi^-1, xi^-2, ...].
    """
    u = fd.mul(fr_spec, coeffs, xi_powers)  # c_j xi^j
    suf = _suffix_sums(fr_spec, u)  # Σ_{j>=i} u_j
    suf_excl = jnp.concatenate([suf[1:], fd.zeros(fr_spec, (1,))], axis=0)
    return fd.mul(fr_spec, suf_excl, xi_inv_powers)


def _suffix_sums(spec, x):
    n = x.shape[0]
    idx = jnp.arange(n)[:, None]
    y = x
    d = 1
    while d < n:
        shifted = jnp.roll(y, -d, axis=0)
        summed = fd.add(spec, y, shifted)
        y = jnp.where(idx < n - d, summed, y)
        d <<= 1
    return y


# ---------------------------------------------------------------------------
# check (host pairing)
# ---------------------------------------------------------------------------


def check(
    cvk: VerifierKeyKZG,
    commitments: Sequence[Optional[Tuple[int, int]]],
    point: int,
    values: Sequence[int],
    proof_w: Optional[Tuple[int, int]],
    eta: int,
) -> bool:
    """Batched single-point KZG check:
    e(Σ eta^i C_i - (Σ eta^i v_i) G1 + xi W, H) == e(W, tau H).
    """
    ctx = cvk.ctx
    r = ctx.curve.fr.modulus
    Fq = ctx.Fq

    def to_pt(c):
        if c is None:
            return None
        return (Fq(c[0]), Fq(c[1]))

    acc = None
    v_agg = 0
    power = 1
    for c, v in zip(commitments, values):
        acc = ch.add(acc, ch.scalar_mul(to_pt(c), power))
        v_agg = (v_agg + power * v) % r
        power = power * eta % r

    lhs = ch.add(acc, ch.scalar_mul(ctx.g1, (-v_agg) % r))
    w = to_pt(proof_w)
    lhs = ch.add(lhs, ch.scalar_mul(w, point % r))
    return pairing_mod.pairing_product_is_one(
        ctx, [(lhs, cvk.g2), (ch.neg(w), cvk.tau_g2)]
    )
