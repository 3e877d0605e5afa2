"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

Multi-chip sharding (element partitioning + halo exchange, scenario batching)
is exercised without TPU hardware by forcing the host platform to expose 8
devices — the same mechanism the driver's dryrun uses. The environment pins
``JAX_PLATFORMS=axon`` (the TPU tunnel); tests must override it *forcibly*
or every eager op pays a network round trip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
