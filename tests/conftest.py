"""Test configuration: run tests on 8 virtual CPU devices so the full
multi-chip sharding path executes without TPU hardware (SURVEY §4: the CPU
device mesh is our 'fake backend').

Note the local 'axon' TPU plugin registers itself regardless of JAX_PLATFORMS,
so we pin the default device to CPU explicitly instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def cpu_devices():
    return jax.devices("cpu")
