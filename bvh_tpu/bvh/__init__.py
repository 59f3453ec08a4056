"""BVH construction, traversal and maintenance."""

from .flat import LEAF, FlatBvh
from .lbvh import build_lbvh
from .ordered import farthest_traverse, nearest_traverse, ordered_traverse
from .refit import refit, update_shapes
from .sah_build import build_sah
from .tree import Bvh
from .traverse import (
    HitRecord,
    any_hit_triangles,
    brute_force_closest_hit,
    brute_force_collect,
    closest_hit_triangles,
    nearest_to,
    nearest_to_triangles,
    traverse,
    traverse_all,
)
from .validate import assert_consistent, assert_tight, check_consistent, check_tight

__all__ = [
    "FlatBvh",
    "LEAF",
    "Bvh",
    "build_sah",
    "build_lbvh",
    "refit",
    "update_shapes",
    "ordered_traverse",
    "nearest_traverse",
    "farthest_traverse",
    "traverse",
    "traverse_all",
    "HitRecord",
    "closest_hit_triangles",
    "any_hit_triangles",
    "nearest_to",
    "nearest_to_triangles",
    "brute_force_closest_hit",
    "brute_force_collect",
    "assert_consistent",
    "assert_tight",
    "check_consistent",
    "check_tight",
]
