"""Test harness: force an 8-device virtual CPU mesh BEFORE importing jax so
multi-chip sharding logic is testable without a pod (SURVEY.md §4d)."""

import os
import sys

# FORCE (not setdefault): the shell environment exports JAX_PLATFORMS=axon
# (the real TPU), and tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The env-var route is unreliable here: the shell exports JAX_PLATFORMS=axon
# and the axon plugin wins over os.environ tweaks. Config updates before the
# first backend use are authoritative. jax 0.9 also ignores
# --xla_force_host_platform_device_count; jax_num_cpu_devices is the
# supported way to get the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
