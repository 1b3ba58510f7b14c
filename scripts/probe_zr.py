"""Compile ONLY the zr program cold; flags come from XLA_FLAGS env."""
import os, sys, time
os.environ["ZKT_PLONK_XLA_CACHE"] = "/tmp/zrcache_%d" % os.getpid()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.sharding import Mesh
from __graft_entry__ import _build_tiny_prover
from zkt_plonk_tpu.parallel.prover import ShardedProver

which = sys.argv[1] if len(sys.argv) > 1 else "zr"
prover, args, ex = _build_tiny_prover(table_size=64)
mesh = Mesh(np.asarray(jax.devices()[:8]), ("poly",))
sp = ShardedProver(prover, mesh, msm_groups=2)
m, L = sp.m, prover.spec.n_limbs
z = lambda *s: jnp.zeros(s, jnp.uint32)
t0 = time.time()
if which == "zr":
    r = sp._zr(sp._st, sp._tables, z(3, 8*m, L), z(8*m, L), z(8*m, L),
               z(8*m, L), z(8*m, L), z(8, L), z(2, 4, L))
elif which == "qr":
    r = sp._qr(sp._st, sp._q4, sp._tables, z(7, 8*m, L), z(7, 4, L),
               z(2, 8*m, L), z(2, 4, L), z(7, L), z(7, L), z(2, L))
elif which == "ev":
    r = sp._ev(z(8, 8*m, L), z(8, 4, L), z(4, 8*m, L), z(4, 4, L), z(L), z(L))
elif which == "opn":
    r = sp._opn(z(13, 8*m, L), z(13, 4, L), z(13, L), z(8, 8*m, L), z(8, 4, L),
                z(4, 8*m, L), z(4, 4, L), z(9, L), z(4, L), z(L), z(L), z(L), z(L))
elif which == "r12":
    r = sp._r12(sp._st, z(3, 8*m, L), z(3, 8*m, L), z(8*m, L), z(3, 4, L), z(3, 4, L))
elif which == "commit1":
    r = sp._commit1(sp._pwb, sp._pwt, sp._b3, z(8*m, L), z(4, L))
jax.tree_util.tree_map(np.asarray, r)
print(f"{which} compile+run: {time.time()-t0:.1f}s", flush=True)
