"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on ``xla_force_host_platform_device_count=8``
virtual CPU devices (real TPU hardware is exercised by the driver's bench and
``dryrun_multichip``). The environment boots jax with a forced TPU platform via
sitecustomize, so overriding the platform requires ``jax.config.update`` — the
env var alone is not honored.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
