import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding
# (shard_map collectives) is exercised without TPU hardware — see SURVEY.md §4.
#
# NOTE: the env var alone is not enough — the installed TPU ("axon") PJRT
# plugin overrides JAX_PLATFORMS at import, so we also force it via
# jax.config after import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's region-analysis copy insertion is superlinear in program size
# on the limb graphs (zr program: ~12 min with it, 28 s without — measured
# r5); disabling it only adds conservative runtime copies.
if "xla_cpu_copy_insertion_use_region_analysis" not in _flags:
    _flags += " --xla_cpu_copy_insertion_use_region_analysis=false"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
