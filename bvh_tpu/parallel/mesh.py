"""Device mesh construction helpers."""

from __future__ import annotations

import jax


def make_mesh(n_devices: int | None = None, scene_shards: int = 1):
    """A ('rays', 'scene') mesh over the first ``n_devices`` devices.

    ``scene_shards`` devices along the scene (primitive range) axis, the rest
    along the ray (data-parallel) axis. Collectives ride ICI when the mesh is
    laid out on a physical slice; on multi-host deployments call
    ``jax.distributed.initialize()`` first and pass the global device count.
    """
    n = n_devices or jax.device_count()
    if n % scene_shards:
        raise ValueError(f"{n} devices not divisible by scene_shards={scene_shards}")
    return jax.make_mesh((n // scene_shards, scene_shards), ("rays", "scene"))
