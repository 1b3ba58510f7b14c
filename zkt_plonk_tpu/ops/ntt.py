"""Radix-2 NTT / iNTT / coset-NTT over limb arrays — the core device primitive.

Replaces ark-poly's radix-2 FFT used everywhere in the reference
(``plonk-core/src/util.rs:63-140``).  Design notes (TPU-first):

* all log2(n) DIT butterfly stages run under ONE ``fori_loop`` body whose
  partner/twiddle indices are computed arithmetically (i XOR half,
  (i & (half-1)) * n/m) — O(1) compile cost in n, no index tables;
* a single static bit-reversal gather up front;
* multi-chip: the same code runs SPMD under a mesh (gathers/rolls become
  collectives via GSPMD); a shard_map transpose schedule is the planned
  optimization.

All precomputed tables travel in an ``NttPlan`` pytree that callers MUST
pass as jit arguments — closed-over arrays become XLA constants, and
constant operands in the limb outer-product multiply cause pathological
constant folding (see CLAUDE.md).

Layout: polynomials are ``uint32[..., n, L]`` limb arrays; the polynomial
axis is -2.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..fields import device as fd
from ..fields.limbs import FieldSpec


class NttPlan(NamedTuple):
    """Precomputed tables for one domain size (a jax pytree)."""

    bitrev: jnp.ndarray  # (n,) int32
    tw: jnp.ndarray  # (n/2, L) powers of w
    tw_inv: jnp.ndarray  # (n/2, L) powers of w^-1
    n_inv: jnp.ndarray  # (L,)
    coset_pow: jnp.ndarray  # (n, L) powers of the coset generator g
    coset_ipow: jnp.ndarray  # (n, L) powers of g^-1
    # mixed-radix pallas-kernel plans (ops/ntt_mr.MrPlanSet) — present for
    # sizes >= 2^MR_MIN_LOG; used when the pallas path is enabled
    mr: Optional[object] = None


# log-size window for the mixed-radix pallas path.  DEFAULT-ON within the
# window on TPU (r3): with MUL_CHUNK_ROWS=16 and radix <= 128 passes the
# kernels fit Mosaic's scoped-vmem budget and compile at every prover
# size; measured v5e: 3.6 ms at 2^14, 5.6 ms at 2^16 (the fori-gather
# path degrades to 173 ms there).
MR_MIN_LOG = 12
MR_MAX_LOG = 20


# Read ONCE at import: the gate's scope is process-wide and pre-trace
# (flipping the env var after a round program has been traced would
# silently do nothing).  Flip programmatically with ``enable_mr()``
# BEFORE any jit tracing.  ZKT_PLONK_NTT_MR=0 force-disables, =1
# force-enables (any size); unset follows the size window.
import os as _os

_MR_ENV = _os.environ.get("ZKT_PLONK_NTT_MR", "")
_MR_ENABLED: Optional[bool] = (
    True if _MR_ENV == "1" else False if _MR_ENV == "0" else None
)


def enable_mr(on: Optional[bool] = True) -> None:
    """Force the mixed-radix pallas NTT path on/off (None = auto window).

    Must be called before any round program is traced — the flag is read
    at trace time and baked into the compiled executable.
    """
    global _MR_ENABLED
    _MR_ENABLED = on


def _use_mr(plan: NttPlan) -> bool:
    if plan.mr is None:
        return False
    if _MR_ENABLED is False:
        return False
    if _MR_ENABLED is None and plan.mr.fwd.n > (1 << MR_MAX_LOG):
        return False
    from ..fields import pallas as fp

    return fp.use_pallas()


def _butterfly_stages(spec: FieldSpec, x: jnp.ndarray, tw_flat: jnp.ndarray) -> jnp.ndarray:
    *batch, n, L = x.shape
    if n == 1:
        return x
    log_n = n.bit_length() - 1
    i = jnp.arange(n, dtype=jnp.int32)

    def body(s, x):
        half = jnp.int32(1) << s
        partner = i ^ half
        is_u = (i & half) == 0
        j = i & (half - 1)
        tw_idx = j * (jnp.int32(n) >> (s + 1))
        tw = jnp.take(tw_flat, tw_idx, axis=0)  # (n, L)
        xp = jnp.take(x, partner, axis=-2)
        operand = jnp.where(is_u[:, None], xp, x)
        m1 = fd.mul(spec, tw, operand)
        return jnp.where(is_u[:, None], fd.add(spec, x, m1), fd.sub(spec, xp, m1))

    return jax.lax.fori_loop(0, log_n, body, x)


def fft(spec: FieldSpec, plan: NttPlan, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Coefficients -> evaluations at [1, w, w^2, ...] (natural order)."""
    if _use_mr(plan):
        from . import ntt_mr

        return ntt_mr.transform(spec, plan.mr.fwd, coeffs)
    x = jnp.take(coeffs, plan.bitrev, axis=-2)
    return _butterfly_stages(spec, x, plan.tw)


def ifft(spec: FieldSpec, plan: NttPlan, evals: jnp.ndarray) -> jnp.ndarray:
    """Evaluations -> coefficients."""
    if _use_mr(plan):
        from . import ntt_mr

        return ntt_mr.transform(spec, plan.mr.inv, evals)
    x = jnp.take(evals, plan.bitrev, axis=-2)
    x = _butterfly_stages(spec, x, plan.tw_inv)
    return fd.mul(spec, x, plan.n_inv)


def coset_fft(spec: FieldSpec, plan: NttPlan, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluations over the coset g*H (arkworks ``coset_fft`` semantics)."""
    if _use_mr(plan):
        from . import ntt_mr

        return ntt_mr.transform(spec, plan.mr.coset_fwd, coeffs)
    return fft(spec, plan, fd.mul(spec, coeffs, plan.coset_pow))


def coset_ifft(spec: FieldSpec, plan: NttPlan, evals: jnp.ndarray) -> jnp.ndarray:
    if _use_mr(plan):
        from . import ntt_mr

        return ntt_mr.transform(spec, plan.mr.coset_inv, evals)
    return fd.mul(spec, ifft(spec, plan, evals), plan.coset_ipow)


class Coset4Plan(NamedTuple):
    """Tables for the interleaved 4n-coset transform (``Domain.quarter_plan``)."""

    pow4: jnp.ndarray  # (4, n, L) — (g*w4n^j)^i
    ipow4: jnp.ndarray  # (4, n, L) — (g*w4n^j)^-i
    gn4: jnp.ndarray  # (4, L) — (g*w4n^j)^n (tail-fold scalars)
    mix: jnp.ndarray  # (4, 4, L) — M[t][j] = i4^(-jt) * g^(-tn) / 4


def coset4_fft(spec: FieldSpec, plan: NttPlan, q4: Coset4Plan, coeffs: jnp.ndarray):
    """Evals of P (up to n+4 coefficients) on the 4n coset, INTERLEAVED.

    Returns (..., 4, n, L) with out[..., j, k, :] = P(g * w4n^j * w_n^k)
    — global 4n-coset index i = 4k + j.  Equivalent to zero-padding to 4n
    and running a 4n coset FFT (``quotient_poly.rs:52-96``), but as 4
    batched n-size NTTs: P(g_j w_n^k) = NTT_n(h_j)[k] with
    h_j[i] = g_j^i * (c_i + g_j^n * c_{i+n}).
    """
    n = q4.pow4.shape[1]
    head = coeffs[..., :n, :]
    ntail = coeffs.shape[-2] - n
    assert 0 <= ntail <= 4, "coset4_fft supports at most n+4 coefficients"
    head4 = jnp.broadcast_to(
        head[..., None, :, :], (*head.shape[:-2], 4, n, head.shape[-1])
    )
    if ntail:
        tail = coeffs[..., n:, :]  # (..., ntail, L)
        t4 = fd.mul(spec, q4.gn4[:, None, :], tail[..., None, :, :])
        folded = fd.add(spec, head4[..., :ntail, :], t4)
        head4 = jnp.concatenate([folded, head4[..., ntail:, :]], axis=-2)
    h = fd.mul(spec, head4, q4.pow4)
    return fft(spec, plan, h)


def coset4_ifft(spec: FieldSpec, plan: NttPlan, q4: Coset4Plan, evals: jnp.ndarray):
    """Interleaved 4n-coset evals (..., 4, n, L) -> coefficient ROWS
    (..., 4, n, L): row t holds q[t*n : (t+1)*n] of the 4n-coefficient
    polynomial.  Inverse of ``coset4_fft``: per-subdomain iNTT + unscale,
    then a 4-point inverse DFT across subdomains (16 scalar muls/element).
    """
    u = ifft(spec, plan, evals)
    v = fd.mul(spec, u, q4.ipow4)  # (..., 4j, n, L)
    terms = fd.mul(spec, v[..., None, :, :, :], q4.mix[:, :, None, :])
    t0, t1, t2, t3 = (terms[..., j, :, :] for j in range(4))
    return fd.add(spec, fd.add(spec, t0, t1), fd.add(spec, t2, t3))


def evaluate_poly(spec: FieldSpec, coeffs: jnp.ndarray, point: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial(s) at a single point via Horner (device).

    coeffs: (..., n, L); point: (L,). Returns (..., L).
    (reference ``linearization_poly.rs:55-75``)
    """
    n = coeffs.shape[-2]

    def body(i, acc):
        c = jax.lax.dynamic_index_in_dim(coeffs, n - 1 - i, axis=-2, keepdims=False)
        return fd.add(spec, fd.mul(spec, acc, point), c)

    init = fd.zeros(spec, coeffs.shape[:-2])
    return jax.lax.fori_loop(0, n, body, init)
