"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The image's sitecustomize pins JAX_PLATFORMS=axon (one real TPU chip through a
relay); tests must run on CPU with 8 virtual devices, so we override both the
env var and the jax config before any jax backend initializes.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
