"""Test harness config: force an 8-device virtual CPU platform so multi-chip
sharding paths (mesh / shard_map / psum) are exercised without TPU hardware,
per SURVEY.md §4.

Note: the environment's sitecustomize imports jax at interpreter startup (to
register the axon TPU plugin), so setting JAX_PLATFORMS via os.environ here is
too late. jax.config.update works as long as no backend has initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# keep Pallas kernels testable on CPU via interpret mode
os.environ.setdefault("GITPU_PALLAS_INTERPRET", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
