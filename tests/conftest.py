"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the same way the driver
does it — JAX host-platform device multiplication. Pallas kernels run in
interpreter mode on CPU (see llamavk_tpu.ops.pallas_backend).
"""

import os

# Must be set before jax initializes its backends. Note: the JAX_PLATFORMS
# env var is ignored under the axon TPU terminal, but the config knob works.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
