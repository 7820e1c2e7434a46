"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated here without TPU hardware, per
the framework's test strategy (SURVEY.md §4): unit kernels vs numpy
oracles + mesh-of-N degeneracy checks on the host platform.
"""
import os
import sys

# force CPU: the session env pins JAX_PLATFORMS=axon (remote TPU tunnel),
# which makes eager micro-op tests pathologically slow; the axon
# sitecustomize overrides the env var, so set the config flag too
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
