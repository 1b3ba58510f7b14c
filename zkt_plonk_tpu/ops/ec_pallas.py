"""Fused pallas TPU kernel for complete EC point addition.

The composed path (``ops/ec.add``) issues ~6 stacked field-mul pallas
calls plus ~14 add/sub calls per point addition; every intermediate
round-trips HBM between kernels.  This kernel runs the WHOLE
Renes–Costello–Batina complete-add formula (a=0, Algorithm 7) on a
VMEM-resident block: 14 Barrett multiplies + all additions with zero
intermediate HBM traffic.  It is the MSM hot path (bucket accumulation,
group merges, suffix scans — ``plonk-core/src/commitment.rs:31-46`` role).

Layout contract: points cross the boundary element-major
``uint32[..., 3, L]``; the wrapper flattens batch axes, transposes to
coordinate-major limb-major ``(3, L, N)`` blocks (limbs on sublanes,
points on lanes), pads N to a block multiple and undoes it all on exit.
Consecutive EC ops inside one jit cancel the transposes at XLA level.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import pallas as fp
from ..fields.limbs import FieldSpec

U32 = jnp.uint32

# Lane block: 256 keeps peak VMEM (~intermediates of 6-way stacked muls on
# (6, L, B) tiles) comfortably under the Mosaic scoped-vmem budget.
BLOCK = 256
# Below this many points the composed jnp/pallas field-op path wins.
MIN_POINTS = 512


_B3_INT: dict = {}


def register_b3(spec: FieldSpec, v: int) -> None:
    """Record the integer value of the curve constant 3b for ``spec`` so
    the fused kernel can specialize the layer-2 multiply (all supported
    curves have tiny 3b: 9 / 12 / 3)."""
    _B3_INT[spec] = v


def _add_lm_body(px, qx, p_arr, mu, b3, L, b3_small=None):
    """RCB complete add on coordinate-major (3, L, B) tiles (in VMEM)."""
    X1, Y1, Z1 = px[0], px[1], px[2]
    X2, Y2, Z2 = qx[0], qx[1], qx[2]
    a_ = lambda a, b: fp._add_lm(a, b, p_arr, L)
    s_ = lambda a, b: fp._sub_lm(a, b, p_arr, L)
    mul = lambda a, b: fp._barrett_mul_lm(a, b, p_arr, mu, L)

    # layer 1: 6 independent products, stacked into one Barrett pipeline
    lhs = jnp.stack([X1, Y1, a_(X1, Y1), a_(Y1, Z1), a_(X1, Z1), Z1])
    rhs = jnp.stack([X2, Y2, a_(X2, Y2), a_(Y2, Z2), a_(X2, Z2), Z2])
    prod1 = mul(lhs, rhs)
    t0, t1, sxy, syz, sxz, t2 = (prod1[k] for k in range(6))

    t3 = s_(s_(sxy, t0), t1)  # X1Y2 + X2Y1
    t4 = s_(s_(syz, t1), t2)  # Y1Z2 + Y2Z1
    t5 = s_(s_(sxz, t0), t2)  # X1Z2 + X2Z1

    # layer 2: multiplies by the curve constant 3b — shift-add short
    # multiply + 1-limb-quotient reduction when 3b is statically small
    if b3_small is not None:
        prod2 = fp._small_mul_lm(jnp.stack([t2, t5]), b3_small, p_arr, mu, L)
    else:
        b3b = jnp.broadcast_to(b3, (1, L, t2.shape[-1]))
        prod2 = mul(jnp.stack([t2, t5]), jnp.concatenate([b3b, b3b]))
    b3t2, b3t5 = prod2[0], prod2[1]

    m3t0 = a_(a_(t0, t0), t0)  # 3 X1X2
    zs = a_(t1, b3t2)  # Y1Y2 + b3 Z1Z2
    td = s_(t1, b3t2)  # Y1Y2 - b3 Z1Z2

    # layer 3: 6 products collapsing pairwise into X3/Y3/Z3 — computed as
    # three fused (a*b + c*d) mod p with ONE reduction each (the X3
    # subtraction becomes an addition of the negated operand, and
    # 0 - x == p - x with the 0 -> 0 case handled by _sub_lm's borrow fix)
    nb3t5 = s_(jnp.zeros_like(b3t5), b3t5)
    out3 = fp._mul2_lm(
        jnp.stack([t3, b3t5, zs]),
        jnp.stack([td, m3t0, t4]),
        jnp.stack([t4, td, m3t0]),
        jnp.stack([nb3t5, zs, t3]),
        p_arr,
        mu,
        L,
    )
    return out3


@lru_cache(maxsize=None)
def _add_call(spec: FieldSpec, b3_small, interpret: bool):
    L = spec.n_limbs

    def kernel(p_ref, mu_ref, b3_ref, a_ref, b_ref, o_ref):
        o_ref[...] = _add_lm_body(
            a_ref[...], b_ref[...], p_ref[...], mu_ref[...], b3_ref[...], L,
            b3_small=b3_small,
        )

    p_spec = pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((L * L + 4, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    pt_spec = pl.BlockSpec((3, L, BLOCK), lambda j: (0, 0, j), memory_space=pltpu.VMEM)

    def call(p_arr, mu, b3, a_cm, b_cm):
        n = a_cm.shape[-1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, L, n), U32),
            grid=(n // BLOCK,),
            in_specs=[p_spec, mu_spec, p_spec, pt_spec, pt_spec],
            out_specs=pt_spec,
            interpret=interpret,
        )(p_arr, mu, b3, a_cm, b_cm)

    return call


def _consts(spec: FieldSpec, b3):
    p_arr = jnp.asarray(np.asarray(spec.modulus_limbs, np.uint32)[:, None])
    return p_arr, fp.fold_const(spec), jnp.reshape(b3, (spec.n_limbs, 1))


def eligible(p, q) -> bool:
    shape = np.broadcast_shapes(p.shape, q.shape)
    n = int(np.prod(shape[:-2], dtype=np.int64))
    return n >= MIN_POINTS


def add(spec: FieldSpec, b3, p, q, *, interpret: bool = False):
    """Complete projective add via the fused kernel.

    p, q: element-major ``uint32[..., 3, L]`` (broadcastable). Returns the
    broadcast shape. Caller decides eligibility (``eligible``).
    """
    L = spec.n_limbs
    p, q = jnp.broadcast_arrays(p, q)
    shape = p.shape
    n = int(np.prod(shape[:-2], dtype=np.int64))
    a_cm = p.reshape(n, 3, L).transpose(1, 2, 0)  # (3, L, n)
    b_cm = q.reshape(n, 3, L).transpose(1, 2, 0)
    pad = (-n) % BLOCK
    if pad:
        a_cm = jnp.pad(a_cm, ((0, 0), (0, 0), (0, pad)))
        b_cm = jnp.pad(b_cm, ((0, 0), (0, 0), (0, pad)))
    p_arr, mu, b3c = _consts(spec, b3)
    b3v = _B3_INT.get(spec)
    b3_small = b3v if (b3v is not None and 1 <= b3v < 16) else None
    out = _add_call(spec, b3_small, interpret)(p_arr, mu, b3c, a_cm, b_cm)
    if pad:
        out = out[..., :n]
    return out.transpose(2, 0, 1).reshape(shape)
