"""IO: persistence (the reference's serde analog) and mesh loading."""

from .obj import load_obj_triangles
from .serialize import load_bvh, load_cluster_scene, save_bvh, save_cluster_scene

__all__ = [
    "save_bvh",
    "load_bvh",
    "save_cluster_scene",
    "load_cluster_scene",
    "load_obj_triangles",
]
