"""Test configuration: run everything on CPU with 8 virtual devices.

The analog of the reference CI running the same test binary under both
``./testbin/test`` and ``mpirun -np 4`` (``.travis.yml:25-26``): multi-device
behavior is exercised on a virtual 8-device CPU mesh.

Note: this image's sitecustomize registers an 'axon' TPU backend in every
python process and sets JAX_PLATFORMS=axon; ``jax.config.update`` below
overrides it reliably.
"""

import os
import sys

# Must happen before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))
