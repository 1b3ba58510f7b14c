import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, random
import jax, jax.numpy as jnp

from zkt_plonk_tpu.fields import BN254_FR, make_spec
from zkt_plonk_tpu.fields.limbs import ints_to_array
from zkt_plonk_tpu.ops import ntt, ntt_mr
from zkt_plonk_tpu.utils.domain import make_domain

# this repro exercises the MR pallas kernel: opt in BEFORE tracing
ntt.enable_mr(True)

logn = int(sys.argv[1]) if len(sys.argv) > 1 else 12
spec = make_spec(BN254_FR)
p = spec.modulus
rng = random.Random(0)
n = 1 << logn
dom = make_domain(BN254_FR, n)
vals = [rng.randrange(p) for _ in range(min(n, 1024))]
coeffs = jnp.asarray(np.tile(ints_to_array(vals, spec.n_limbs), (n // len(vals), 1)))
plan = dom.plan_device()
assert plan.mr is not None, "no mr plan at this size"

# kernel side explicitly, so parity below is kernel-vs-jnp regardless of gates
fftf = jax.jit(
    lambda pl_, c: ntt_mr.transform(dom.spec, pl_.mr.fwd, c, use_kernel=True)
)
t0 = time.time()
out = fftf(plan, coeffs)
got = np.asarray(jax.device_get(out))
print(f"compile+run ok in {time.time()-t0:.1f}s")

# correctness vs jnp column-transform path
ref = jax.jit(lambda pl_, c: ntt_mr.transform(dom.spec, pl_.mr.fwd, c, use_kernel=False))(plan, coeffs)
refh = np.asarray(jax.device_get(ref))
assert np.array_equal(got, refh), "MISMATCH kernel vs jnp"
print("parity ok")

# timing
t0 = time.time()
iters = 10
o = coeffs
for _ in range(iters):
    o = fftf(plan, o)
np.asarray(jax.device_get(o.ravel()[:4]))
dt = (time.time() - t0) / iters
print(f"NTT 2^{logn}: {dt*1e3:.2f} ms")
