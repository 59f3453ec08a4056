"""Multi-chip scaling: device meshes, sharded traversal, gradient collectives.

The reference's only parallelism is in-process work stealing
(``src/bvh/bvh_impl.rs:525-543``). The TPU framework's first-class axes:

* ``rays``  — data parallelism over the query batch (each chip traces a slice)
* ``scene`` — range-sharding of primitives: each chip holds a triangle range
  and a BVH over it; closest hits are min-reduced across the axis over ICI.

Vertex gradients are summed back with ``psum`` during the backward pass.
"""

from .mesh import init_distributed, make_mesh, make_multihost_mesh
from .scaling import ray_scaling_report
from .shard import (
    shard_scene,
    sharded_loss_and_grads,
    sharded_render_depth,
    sharded_train_step,
)
from .tight import (multihost_trace_closest_hit, sharded_trace_any_hit,
                    sharded_trace_closest_hit)

__all__ = [
    "make_mesh",
    "make_multihost_mesh",
    "init_distributed",
    "ray_scaling_report",
    "shard_scene",
    "sharded_render_depth",
    "sharded_loss_and_grads",
    "sharded_train_step",
    "multihost_trace_closest_hit",
    "sharded_trace_closest_hit",
    "sharded_trace_any_hit",
]
