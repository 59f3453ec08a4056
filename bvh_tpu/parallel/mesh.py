"""Device mesh construction: single-host, and multi-process (multi-host).

The reference has no distributed component at all (survey §2.23); these
helpers are the TPU framework's comm-backend layer: process-group init via
``jax.distributed``, then a ('rays', 'scene') mesh whose collectives ride
ICI within a slice and DCN across hosts. The hot loop (parallel/tight.py)
is zero-traffic, so rays-across-hosts placement makes DCN latency
irrelevant; only gradient psums cross hosts in training.
"""

from __future__ import annotations

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None, **kw) -> int:
    """Initializes the multi-process JAX runtime (call once per process,
    before any other JAX API, on every host of the pod).

    On TPU pods the arguments are auto-detected from the metadata server —
    ``init_distributed()`` with no arguments is the normal call; on CPU/GPU
    fleets pass coordinator/process explicitly. Returns the process count.
    Safe to call on a single host (no-op if already initialized or
    single-process).
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id, **kw)
    except ValueError as e:
        # no cluster environment to auto-detect (single host, no
        # coordinator): the documented safe no-op case
        if coordinator_address is None and "coordinator_address" in str(e):
            return jax.process_count()
        raise
    except RuntimeError as e:
        # tolerate ONLY the benign double-init; a real init failure on a
        # pod must not silently degrade the job to 1/N of its hosts
        if "already" not in str(e).lower():
            raise
    return jax.process_count()


def make_mesh(n_devices: int | None = None, scene_shards: int = 1):
    """A ('rays', 'scene') mesh over the first ``n_devices`` devices.

    ``scene_shards`` devices along the scene (primitive range) axis, the rest
    along the ray (data-parallel) axis. Collectives ride ICI when the mesh is
    laid out on a physical slice. For a mesh spanning multiple hosts use
    ``make_multihost_mesh`` (DCN-aware ordering).
    """
    n = n_devices or jax.device_count()
    if n % scene_shards:
        raise ValueError(f"{n} devices not divisible by scene_shards={scene_shards}")
    return jax.make_mesh((n // scene_shards, scene_shards), ("rays", "scene"))


def make_multihost_mesh(scene_shards: int = 1):
    """A ('rays', 'scene') mesh over ALL processes' devices.

    Call ``init_distributed()`` first on every host. Layout: the scene
    axis is kept *within* a host's slice (its min-reduce of closest hits
    rides ICI); the ray axis spans hosts — by construction the traversal
    hot loop has no cross-shard traffic, so the DCN only carries the
    training-step gradient psum.
    """
    n = jax.device_count()
    if n % scene_shards:
        raise ValueError(f"{n} devices not divisible by scene_shards={scene_shards}")
    rays = n // scene_shards
    procs = jax.process_count()
    if procs > 1 and rays % procs == 0:
        try:
            from jax.experimental import mesh_utils

            devices = mesh_utils.create_hybrid_device_mesh(
                (rays // procs, scene_shards), (procs, 1))
        except ValueError:
            # single-slice backends (CPU fleets, multi-process tests) have
            # no slice topology for the hybrid layout to read; order
            # process-major by hand, scene axis within a process's devices
            import numpy as np

            devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
            devices = np.array(devs).reshape(rays, scene_shards)
        return jax.sharding.Mesh(devices, ("rays", "scene"))
    return make_mesh(n, scene_shards=scene_shards)
