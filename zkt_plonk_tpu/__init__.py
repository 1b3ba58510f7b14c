"""zkt_plonk_tpu — TPU-native PLONK+Plookup proving stack (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of ZKTLabs/zkt-plonk
(see SURVEY.md at the repo root) designed TPU-first: limb-vectorized field
arithmetic, device NTT/MSM, shard_map multi-chip scaling, host-side circuit
building and byte-exact Fiat-Shamir transcripts.
"""

import os as _os

import jax as _jax

# Deep uint32 limb-arithmetic graphs are expensive to compile; persist
# compiled executables across processes so provers/tests pay compile once.
_cache_dir = _os.environ.get(
    "ZKT_PLONK_XLA_CACHE", _os.path.expanduser("~/.cache/zkt_plonk_tpu/xla")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"
