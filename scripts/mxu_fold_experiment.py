"""Scratch experiment: MXU-dot fold for the Barrett reduction.

The fold step of _reduce_2l is V = t_lo + sum_i t_hi[i] * C_i with a
CONSTANT (L,L) limb matrix C — i.e. S = C^T @ t_hi, a matmul with a
shared LHS.  With 8-bit splits (tl + 256*th, Cl + 256*Ch) every partial
dot stays < 2^22, exact in f32, so three small f32 dots ride the MXU:
  S0  = Cl^T @ tl                      (scale 1)
  S8  = Ch^T @ tl + Cl^T @ th          (scale 2^8, one 32-contraction dot)
  S16 = Ch^T @ th                      (scale 2^16)
Measures correctness (CPU interpret) and throughput (TPU) vs the
production kernel.
"""
import os, sys, time
import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if MODE == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from zkt_plonk_tpu.fields import pallas as fp
from zkt_plonk_tpu.fields.limbs import LIMB_BITS, LIMB_MASK, make_spec, fold_limbs
from zkt_plonk_tpu.fields.params import BN254_FR

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)
spec = make_spec(BN254_FR)
L = spec.n_limbs
BLOCK = fp.BLOCK


def _fold_mats(spec):
    """(L, 2L) f32: [:, :L] = Cl^T, [:, L:] = Ch^T (C[i,j] = limb j of C_i)."""
    flat = fold_limbs(spec)
    C = flat[: L * L].reshape(L, L).astype(np.int64)  # C[i, j]
    Cl = (C & 0xFF).T.astype(np.float32)
    Ch = (C >> 8).T.astype(np.float32)
    return np.concatenate([Cl, Ch], axis=1)


def _reduce_2l_mxu(t, p_arr, fold, fm, L):
    """_reduce_2l with the fold loop replaced by 3 MXU dots."""
    a = t
    t_lo, t_hi = t[..., :L, :], t[..., L:, :]

    tl = (t_hi & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
    th = (t_hi >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32)
    Cl = fm[:, :L]
    Ch = fm[:, L:]
    S0 = jnp.dot(Cl, tl, preferred_element_type=jnp.float32)
    S8 = jnp.dot(
        jnp.concatenate([Ch, Cl], axis=1),
        jnp.concatenate([tl, th], axis=0),
        preferred_element_type=jnp.float32,
    )
    S16 = jnp.dot(Ch, th, preferred_element_type=jnp.float32)
    S0 = S0.astype(jnp.int32).astype(U32)    # <= 2^20
    S8 = S8.astype(jnp.int32).astype(U32)    # <= 2^21
    S16 = S16.astype(jnp.int32).astype(U32)  # <= 2^20

    # col_j += S0 + (S8 & 0xFF) << 8 ; col_{j+1} += (S8 >> 8) + S16
    lo_part = S0 + ((S8 & jnp.uint32(0xFF)) << 8) + t_lo
    hi_part = (S8 >> jnp.uint32(8)) + S16
    z1 = jnp.zeros(a.shape[:-2] + (1, a.shape[-1]), U32)
    z2 = jnp.concatenate([z1, z1], axis=-2)
    cols = jnp.concatenate([lo_part, z2], axis=-2) + jnp.concatenate(
        [z1, hi_part, z1], axis=-2
    )
    V = fp._carry_propagate(cols, L + 2)

    w = V[..., L - 2 :, :]
    mu3 = fp._bcast_const(fold[L * L : L * L + 4], a, 4)
    m = fp._carry_propagate(fp._mul_columns(w, mu3, 8), 8)
    qhat = m[..., 4:6, :]
    qp = fp._carry_propagate(
        fp._mul_columns(qhat, fp._bcast_const(p_arr, a, L), L + 2), L + 2
    )
    r, _ = fp._sub_with_borrow(V, qp)
    r = r[..., : L + 1, :]
    p_pad = jnp.concatenate([fp._bcast_const(p_arr, a, L), z1], axis=-2)
    r = fp._cond_sub(fp._cond_sub(r, p_pad), p_pad)
    return r[..., :L, :]


def _mul_mxu_lm(a, b, p_arr, fold, fm, L):
    a, b = jnp.broadcast_arrays(a, b)
    return _reduce_2l_mxu(
        fp._carry_propagate(fp._mul_columns(a, b, 2 * L), 2 * L), p_arr, fold, fm, L
    )


def make_mxu_call(interpret):
    def kernel(p_ref, mu_ref, fm_ref, a_ref, b_ref, o_ref):
        o_ref[:] = _mul_mxu_lm(a_ref[:], b_ref[:], p_ref[:], mu_ref[:], fm_ref[:], L)

    p_spec = pl.BlockSpec((L, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    mu_spec = pl.BlockSpec((L * L + 4, 1), lambda j: (0, 0), memory_space=pltpu.VMEM)
    fm_spec = pl.BlockSpec((L, 2 * L), lambda j: (0, 0), memory_space=pltpu.VMEM)
    data_spec = pl.BlockSpec((L, BLOCK), lambda j: (0, j), memory_space=pltpu.VMEM)

    def call(p_arr, mu, fm, a_lm, b_lm):
        n = a_lm.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), U32),
            grid=(n // BLOCK,),
            in_specs=[p_spec, mu_spec, fm_spec, data_spec, data_spec],
            out_specs=data_spec,
            interpret=interpret,
        )(p_arr, mu, fm, a_lm, b_lm)

    return call


def to_lm(x_int, n):
    arr = np.zeros((L, n), np.uint32)
    for i, v in enumerate(x_int):
        for l in range(L):
            arr[l, i] = (v >> (16 * l)) & 0xFFFF
    return arr


def from_lm(arr):
    n = arr.shape[1]
    out = []
    for i in range(n):
        v = 0
        for l in range(L):
            v |= int(arr[l, i]) << (16 * l)
        out.append(v)
    return out


p_arr = jnp.asarray(np.asarray(spec.modulus_limbs, np.uint32)[:, None])
mu = fp.fold_const(spec)
fm = jnp.asarray(_fold_mats(spec))

if MODE == "cpu":
    rng = np.random.default_rng(0)
    n = BLOCK
    av = [int.from_bytes(rng.bytes(31), "little") % spec.modulus for _ in range(n)]
    bv = [int.from_bytes(rng.bytes(31), "little") % spec.modulus for _ in range(n)]
    a_lm = jnp.asarray(to_lm(av, n))
    b_lm = jnp.asarray(to_lm(bv, n))
    out = make_mxu_call(True)(p_arr, mu, fm, a_lm, b_lm)
    got = from_lm(np.asarray(out))
    exp = [(x * y) % spec.modulus for x, y in zip(av, bv)]
    bad = sum(g != e for g, e in zip(got, exp))
    print(f"correctness: {n - bad}/{n} match")
    sys.exit(0 if bad == 0 else 1)

# --- TPU perf ---
assert jax.default_backend() == "tpu", jax.devices()
n = 1 << 20
rng = np.random.default_rng(0)
a_np = rng.integers(0, 1 << 16, size=(L, n), dtype=np.uint32)
a_np[L - 1] &= 0x3FFF  # keep < p
a_lm = jnp.asarray(a_np)
b_lm = jnp.asarray(np.roll(a_np, 1, axis=1))

ITERS = 8
prod_call = fp._kernel_fn(spec, "mul", False)
mxu_call = make_mxu_call(False)


@jax.jit
def chain_prod(a, b):
    def body(i, x):
        return prod_call((p_arr, mu), x, b)
    return jax.lax.fori_loop(0, ITERS, body, a)


@jax.jit
def chain_mxu(a, b):
    def body(i, x):
        return mxu_call(p_arr, mu, fm, x, b)
    return jax.lax.fori_loop(0, ITERS, body, a)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:4]))


def bench(f, label):
    sync(f(a_lm, b_lm))  # compile + warm
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(f(a_lm, b_lm))
    dt = (time.perf_counter() - t0) / reps
    per_mul = dt / ITERS
    print(f"{label}: {per_mul*1e3:.3f} ms / {n} muls -> {n/per_mul/1e9:.3f} G mul/s")
    return per_mul


# floor calibration
@jax.jit
def nop(a):
    return a + jnp.uint32(0)

sync(nop(a_lm))
t0 = time.perf_counter()
for _ in range(5):
    sync(nop(a_lm))
floor = (time.perf_counter() - t0) / 5
print(f"dispatch floor: {floor*1e3:.1f} ms (NOT subtracted; both chains pay it)")

# parity check on TPU too
o1 = np.asarray(jax.device_get(chain_prod(a_lm, b_lm)))
o2 = np.asarray(jax.device_get(chain_mxu(a_lm, b_lm)))
print("TPU parity:", "OK" if np.array_equal(o1, o2) else "MISMATCH")

t_prod = bench(chain_prod, "prod (VPU fold)")
t_mxu = bench(chain_mxu, "mxu  (dot fold)")
print(f"speedup: {t_prod / t_mxu:.3f}x")
