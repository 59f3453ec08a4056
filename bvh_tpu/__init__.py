"""bvh_tpu — a TPU-native bounding volume hierarchy framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Rust crate
``svenstaro/bvh`` (rays, AABBs, SAH-quality BVHs, stackless flat traversal,
refit, nearest-neighbor queries), re-architected for TPU: SoA flat arrays,
batched branch-free intersection kernels, device-side LBVH construction, a
differentiable hit layer, and multi-chip ray sharding over a device mesh.
"""

from .aabb import Aabb
from .ball import Ball, Circle, Sphere
from .config import DEFAULT_CONFIG, BvhConfig
from .queries import AabbQuery, BallQuery, PointQuery, RayQuery
from .ray import Intersection, Ray, intersection_slice_for_aabb, ray_intersects_aabb, ray_intersects_triangle

__version__ = "0.1.0"

__all__ = [
    "Aabb",
    "Ball",
    "Circle",
    "Sphere",
    "Ray",
    "Intersection",
    "ray_intersects_aabb",
    "ray_intersects_triangle",
    "intersection_slice_for_aabb",
    "RayQuery",
    "AabbQuery",
    "PointQuery",
    "BallQuery",
    "BvhConfig",
    "DEFAULT_CONFIG",
]
