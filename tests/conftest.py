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
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
