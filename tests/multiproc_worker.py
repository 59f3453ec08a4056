"""Worker for test_multiprocess.py: one simulated host of a 2-process mesh.

Each process owns 4 virtual CPU devices; together they form the 8-device
('rays', 'scene') multihost mesh. Run via the test, not directly.
"""
import os
import sys

port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the documented contract: process-group init before any other JAX API
from bvh_tpu.parallel import init_distributed

n = init_distributed(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert n == nproc, f"process_count {n} != {nproc}"
assert jax.device_count() == 4 * nproc, jax.device_count()
assert len(jax.local_devices()) == 4

import numpy as np

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.trace import trace_closest_hit_tight
from bvh_tpu.parallel import make_multihost_mesh, multihost_trace_closest_hit

mesh = make_multihost_mesh()
assert mesh.shape["rays"] == 4 * nproc

# identical deterministic scene + global ray batch on every host
a, b, c = tb.create_n_cubes(40)
scene = build_tight_scene(np.asarray(a), np.asarray(b), np.asarray(c),
                          use_native=False)
seed = tb.seed_state_after(40)
o, d = tb.create_rays(8192, seed=seed)
half = 8192 // nproc
sl = slice(pid * half, (pid + 1) * half)
local = Ray.create(o[sl], d[sl])

hit = multihost_trace_closest_hit(mesh, scene, local, packet=1024,
                                  interpret=True)

# oracle: the single-device kernel on this host's shard
want = trace_closest_hit_tight(scene, local, packet=1024, interpret=True)
np.testing.assert_array_equal(np.asarray(hit.t), np.asarray(want.t))
np.testing.assert_array_equal(np.asarray(hit.shape_id),
                              np.asarray(want.shape_id))
print(f"WORKER_OK {pid}", flush=True)
