"""Device elliptic-curve point arithmetic (complete projective formulas).

Points are ``uint32[..., 3, L]`` projective (X:Y:Z) coordinates over the
base field, identity = (0:1:0).  Addition uses the Renes–Costello–Batina
complete formulas for a=0 short-Weierstrass curves: branch-free, valid for
ANY inputs (identity, doubling, inverses) — exactly what associative scans
and masked bucket accumulation on TPU need.  12 field muls per add.

Replaces arkworks ``ark-ec`` group arithmetic used by the reference's MSM
(``plonk-core/src/commitment.rs:31-46``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields import device as fd
from ..fields.limbs import FieldSpec, ints_to_array


def identity(spec: FieldSpec, shape=()) -> jnp.ndarray:
    """(0 : 1 : 0)."""
    pt = np.zeros((3, spec.n_limbs), dtype=np.uint32)
    pt[1, 0] = 1
    return jnp.broadcast_to(jnp.asarray(pt), (*shape, 3, spec.n_limbs))


def from_affine_host(spec: FieldSpec, points) -> np.ndarray:
    """Host affine points [(x, y) or None] -> (n, 3, L) projective array."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0), ys.append(1), zs.append(0)
        else:
            xs.append(int(pt[0])), ys.append(int(pt[1])), zs.append(1)
    arr = np.stack(
        [
            ints_to_array(xs, spec.n_limbs),
            ints_to_array(ys, spec.n_limbs),
            ints_to_array(zs, spec.n_limbs),
        ],
        axis=1,
    )
    return arr


def to_affine_host(spec: FieldSpec, arr: np.ndarray):
    """(..., 3, L) device array -> list of host affine points/None."""
    flat = np.asarray(arr).reshape(-1, 3, arr.shape[-1])
    out = []
    p = spec.modulus
    for pt in flat:
        x, y, z = (int(v) for v in _limbs_to_int_rows(pt))
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, p)
            out.append((x * zi % p, y * zi % p))
    return out


def _limbs_to_int_rows(rows: np.ndarray):
    from ..fields.limbs import limbs_to_int

    return [limbs_to_int(r) for r in rows]


def add(spec: FieldSpec, b3: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete projective addition (RCB 2015, Algorithm 7, a=0).

    ``b3`` is the limb array of 3*b (curve constant).  Shapes broadcast.

    The 12 field multiplies are grouped into 3 *stacked* multiplies (the
    expression DAG has 3 multiplicative layers): this keeps the number of
    distinct mul subgraphs — and therefore XLA compile time — constant, and
    gives the VPU larger fused batches at runtime.

    Large batches on TPU route to the fused single-kernel pallas add
    (``ops/ec_pallas.py``): the whole formula stays in VMEM instead of
    round-tripping HBM between ~20 field-op kernels.
    """
    from ..fields import pallas as fp

    if fp.use_pallas():
        from . import ec_pallas

        if ec_pallas.eligible(p, q):
            return ec_pallas.add(spec, b3, p, q)
    p, q = jnp.broadcast_arrays(p, q)
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    X2, Y2, Z2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]
    a_ = lambda a, b: fd.add(spec, a, b)
    s_ = lambda a, b: fd.sub(spec, a, b)

    # layer 1: 6 independent products (stacked)
    # [X1X2, Y1Y2, (X1+Y1)(X2+Y2), (Y1+Z1)(Y2+Z2), (X1+Z1)(X2+Z2), Z1Z2]
    lhs = jnp.stack([X1, Y1, a_(X1, Y1), a_(Y1, Z1), a_(X1, Z1), Z1])
    rhs = jnp.stack([X2, Y2, a_(X2, Y2), a_(Y2, Z2), a_(X2, Z2), Z2])
    prod1 = fd.mul(spec, lhs, rhs)
    t0, t1, sxy, syz, sxz, t2 = (prod1[k] for k in range(6))

    t3 = s_(s_(sxy, t0), t1)  # X1Y2 + X2Y1
    t4 = s_(s_(syz, t1), t2)  # Y1Z2 + Y2Z1
    t5 = s_(s_(sxz, t0), t2)  # X1Z2 + X2Z1

    # layer 2: multiplies by the constant b3 (stacked)
    prod2 = fd.mul(spec, jnp.stack([t2, t5]), b3)
    b3t2, b3t5 = prod2[0], prod2[1]

    m3t0 = a_(a_(t0, t0), t0)  # 3 X1X2
    zs = a_(t1, b3t2)  # Y1Y2 + b3 Z1Z2
    td = s_(t1, b3t2)  # Y1Y2 - b3 Z1Z2

    # layer 3: 6 independent products (stacked)
    prod3 = fd.mul(
        spec,
        jnp.stack([t3, t4, b3t5, td, zs, m3t0]),
        jnp.stack([td, b3t5, m3t0, zs, t4, t3]),
    )
    X3 = s_(prod3[0], prod3[1])
    Y3 = a_(prod3[2], prod3[3])
    Z3 = a_(prod3[4], prod3[5])
    return jnp.stack([X3, Y3, Z3], axis=-2)


def double(spec: FieldSpec, b3: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return add(spec, b3, p, p)


def neg(spec: FieldSpec, p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [p[..., 0, :], fd.neg(spec, p[..., 1, :]), p[..., 2, :]], axis=-2
    )


def select(cond: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """cond ? p : q with cond shaped like p[..., 0, 0] (no point/limb axes)."""
    return jnp.where(cond[..., None, None], p, q)


def is_identity(spec: FieldSpec, p: jnp.ndarray) -> jnp.ndarray:
    return fd.is_zero(spec, p[..., 2, :])


def b3_const(spec: FieldSpec, b: int) -> jnp.ndarray:
    from ..fields.limbs import int_to_limbs
    from . import ec_pallas

    v = (3 * b) % spec.modulus
    ec_pallas.register_b3(spec, v)
    return jnp.asarray(int_to_limbs(v, spec.n_limbs), jnp.uint32)
