"""Checkpointing of acceleration structures.

The reference's only persistence is optional serde derives on
``Aabb``/``Bvh``/``BvhNode`` (Cargo.toml:19, survey §5). Flat SoA arrays
serialize trivially: one compressed npz per structure, with a format version
for forward compatibility. (For training-state checkpointing of the
differentiable pipeline, use orbax on the pytrees directly — these helpers
cover the acceleration structures.)
"""

from __future__ import annotations

import numpy as np

from ..bvh.flat import FlatBvh
from ..ops.cluster import ClusterScene

_BVH_VERSION = 1
_SCENE_VERSION = 1


def save_bvh(path: str, flat: FlatBvh, shape_to_node=None) -> None:
    f = flat.to_host()
    payload = {name: getattr(f, name) for name in FlatBvh._fields}
    payload["__version__"] = np.int64(_BVH_VERSION)
    if shape_to_node is not None:
        payload["shape_to_node"] = np.asarray(shape_to_node)
    np.savez_compressed(path, **payload)


def load_bvh(path: str):
    """Returns (FlatBvh, shape_to_node or None)."""
    with np.load(path) as z:
        version = int(z["__version__"])
        if version > _BVH_VERSION:
            raise ValueError(f"bvh file version {version} is newer than supported")
        flat = FlatBvh(*(z[name] for name in FlatBvh._fields))
        s2n = z["shape_to_node"] if "shape_to_node" in z.files else None
    return flat, s2n


def save_cluster_scene(path: str, scene: ClusterScene) -> None:
    np.savez_compressed(
        path,
        __version__=np.int64(_SCENE_VERSION),
        smem_nodes=scene.smem_nodes,
        smem_cc=scene.smem_cc,
        tris_rel=scene.tris_rel,
        tri_map=scene.tri_map,
        num_clusters=np.int64(scene.num_clusters),
        num_nodes=np.int64(scene.num_nodes),
        relative=np.bool_(scene.relative),
    )


def load_cluster_scene(path: str) -> ClusterScene:
    with np.load(path) as z:
        version = int(z["__version__"])
        if version > _SCENE_VERSION:
            raise ValueError(f"scene file version {version} is newer than supported")
        return ClusterScene(
            smem_nodes=z["smem_nodes"],
            smem_cc=z["smem_cc"],
            tris_rel=z["tris_rel"],
            tri_map=z["tri_map"],
            num_clusters=int(z["num_clusters"]),
            num_nodes=int(z["num_nodes"]),
            relative=bool(z["relative"]),
        )


_TIGHT_VERSION = 3  # v2: optional bilinear forms; v3: wide-walk tables


def save_tight_scene(path: str, scene) -> None:
    """Persists a ``TightScene`` (one compressed npz)."""
    extra = {}
    if getattr(scene, "bgroups", None) is not None:
        extra["bgroups"] = np.asarray(scene.bgroups)
    if getattr(scene, "sweep_nodes", None) is not None:
        extra["sweep_nodes"] = np.asarray(scene.sweep_nodes)
    if getattr(scene, "packed_nodes", None) is not None:
        extra["packed_nodes"] = np.asarray(scene.packed_nodes)
    if getattr(scene, "gnodes", None) is not None:
        extra["gnodes"] = np.asarray(scene.gnodes)
        extra["gslot"] = np.asarray(scene.gslot)
        extra["gdepth"] = np.int64(scene.gdepth)
    if getattr(scene, "masked", False):
        extra["masked"] = np.int64(1)
    np.savez_compressed(
        path,
        __tight_version__=np.int64(_TIGHT_VERSION),
        smem_nodes=scene.smem_nodes,
        groups=scene.groups,
        tri_map=scene.tri_map,
        num_clusters=np.int64(scene.num_clusters),
        num_nodes=np.int64(scene.num_nodes),
        width=np.int64(scene.width),
        **extra,
    )


def load_tight_scene(path: str):
    from ..ops.cluster import TightScene

    with np.load(path) as z:
        version = int(z["__tight_version__"])
        if version > _TIGHT_VERSION:
            raise ValueError(f"tight scene version {version} is newer than supported")
        return TightScene(
            smem_nodes=z["smem_nodes"],
            groups=z["groups"],
            tri_map=z["tri_map"],
            num_clusters=int(z["num_clusters"]),
            num_nodes=int(z["num_nodes"]),
            width=int(z["width"]),
            bgroups=z["bgroups"] if "bgroups" in z.files else None,
            sweep_nodes=z["sweep_nodes"] if "sweep_nodes" in z.files else None,
            packed_nodes=z["packed_nodes"] if "packed_nodes" in z.files else None,
            gnodes=z["gnodes"] if "gnodes" in z.files else None,
            gslot=z["gslot"] if "gslot" in z.files else None,
            masked=bool(z["masked"]) if "masked" in z.files else False,
            gdepth=int(z["gdepth"]) if "gdepth" in z.files else 0,
        )


_CHAINED_VERSION = 1


def save_chained_scene(path: str, chained) -> None:
    """Persists a ``ChainedScene``: every part's TightScene tables plus the
    part-local -> global triangle id maps, in one compressed npz (the last
    structure the serde layer was missing; the reference persists everything
    it builds via its serde feature, Cargo.toml:19)."""
    payload = {
        "__chained_version__": np.int64(_CHAINED_VERSION),
        "n_parts": np.int64(len(chained.parts)),
    }
    for i, (part, ids) in enumerate(zip(chained.parts, chained.orig_ids)):
        payload[f"p{i}_smem_nodes"] = part.smem_nodes
        payload[f"p{i}_groups"] = part.groups
        payload[f"p{i}_tri_map"] = part.tri_map
        payload[f"p{i}_num_clusters"] = np.int64(part.num_clusters)
        payload[f"p{i}_num_nodes"] = np.int64(part.num_nodes)
        payload[f"p{i}_width"] = np.int64(part.width)
        payload[f"p{i}_orig_ids"] = np.asarray(ids)
        for opt in ("bgroups", "sweep_nodes", "packed_nodes", "gnodes",
                    "gslot"):
            v = getattr(part, opt, None)
            if v is not None:
                payload[f"p{i}_{opt}"] = np.asarray(v)
        payload[f"p{i}_gdepth"] = np.int64(getattr(part, "gdepth", 0))
        if getattr(part, "masked", False):
            payload[f"p{i}_masked"] = np.int64(1)
    np.savez_compressed(path, **payload)


def load_chained_scene(path: str):
    from ..ops.cluster import ChainedScene, TightScene

    with np.load(path) as z:
        version = int(z["__chained_version__"])
        if version > _CHAINED_VERSION:
            raise ValueError(
                f"chained scene version {version} is newer than supported")
        parts, ids = [], []
        for i in range(int(z["n_parts"])):
            parts.append(TightScene(
                smem_nodes=z[f"p{i}_smem_nodes"],
                groups=z[f"p{i}_groups"],
                tri_map=z[f"p{i}_tri_map"],
                num_clusters=int(z[f"p{i}_num_clusters"]),
                num_nodes=int(z[f"p{i}_num_nodes"]),
                width=int(z[f"p{i}_width"]),
                bgroups=z[f"p{i}_bgroups"] if f"p{i}_bgroups" in z.files else None,
                sweep_nodes=(z[f"p{i}_sweep_nodes"]
                             if f"p{i}_sweep_nodes" in z.files else None),
                packed_nodes=(z[f"p{i}_packed_nodes"]
                              if f"p{i}_packed_nodes" in z.files else None),
                gnodes=z[f"p{i}_gnodes"] if f"p{i}_gnodes" in z.files else None,
                gslot=z[f"p{i}_gslot"] if f"p{i}_gslot" in z.files else None,
                gdepth=(int(z[f"p{i}_gdepth"])
                        if f"p{i}_gdepth" in z.files else 0),
                masked=(bool(z[f"p{i}_masked"])
                        if f"p{i}_masked" in z.files else False),
            ))
            ids.append(z[f"p{i}_orig_ids"])
    return ChainedScene(tuple(parts), tuple(ids))
