"""Serialization + OBJ loader tests."""

import numpy as np

from bvh_tpu import testbase as tb
from bvh_tpu.bvh import build_sah
from bvh_tpu.io import (
    load_bvh,
    load_cluster_scene,
    load_obj_triangles,
    save_bvh,
    save_cluster_scene,
)
from bvh_tpu.ops import build_cluster_scene


def test_bvh_roundtrip(tmp_path):
    a, b, c = tb.create_n_cubes(20)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, s2n = build_sah(mn, mx)
    p = str(tmp_path / "t.npz")
    save_bvh(p, flat, s2n)
    flat2, s2n2 = load_bvh(p)
    for name in flat._fields:
        assert np.array_equal(np.asarray(getattr(flat, name)), getattr(flat2, name))
    assert np.array_equal(s2n, s2n2)


def test_cluster_scene_roundtrip(tmp_path):
    a, b, c = tb.create_n_cubes(20)
    scene = build_cluster_scene(a, b, c)
    p = str(tmp_path / "s.npz")
    save_cluster_scene(p, scene)
    s2 = load_cluster_scene(p)
    assert np.array_equal(scene.smem_nodes, s2.smem_nodes)
    assert np.array_equal(scene.tris_rel, s2.tris_rel)
    assert scene.num_clusters == s2.num_clusters and scene.relative == s2.relative


def test_obj_loader(tmp_path):
    obj = """
# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 1.0 1.0 0.0
v 0.0 1.0 0.0
f 1 2 3 4
f -4//1 -3/2/1 -2
"""
    p = tmp_path / "quad.obj"
    p.write_text(obj)
    a, b, c = load_obj_triangles(str(p))
    # quad fan-triangulates into 2 + the second face into 1 triangle
    assert a.shape == (3, 3)
    assert np.allclose(a[0], [0, 0, 0]) and np.allclose(b[0], [1, 0, 0])
    assert np.allclose(c[1], [0, 1, 0])
    assert np.allclose(a[2], [0, 0, 0]) and np.allclose(c[2], [1, 1, 0])


def test_tight_scene_roundtrip(tmp_path):
    from bvh_tpu.io import load_tight_scene, save_tight_scene
    from bvh_tpu.ops.cluster import build_tight_scene

    a, b, c = tb.create_n_cubes(20)
    scene = build_tight_scene(a, b, c, use_native=False)
    path = str(tmp_path / "scene.npz")
    save_tight_scene(path, scene)
    back = load_tight_scene(path)
    assert back.width == scene.width
    assert back.num_clusters == scene.num_clusters
    np.testing.assert_array_equal(back.smem_nodes, scene.smem_nodes)
    np.testing.assert_array_equal(back.groups, scene.groups)
    np.testing.assert_array_equal(back.tri_map, scene.tri_map)


def test_chained_scene_roundtrip(tmp_path):
    from bvh_tpu.io import load_chained_scene, save_chained_scene
    from bvh_tpu.ops.cluster import build_chained_scene

    a, b, c = tb.create_n_cubes(60)
    ch = build_chained_scene(a, b, c, max_part=200, use_native=False)
    path = str(tmp_path / "chained.npz")
    save_chained_scene(path, ch)
    back = load_chained_scene(path)
    assert len(back.parts) == len(ch.parts)
    for p0, p1, i0, i1 in zip(ch.parts, back.parts, ch.orig_ids, back.orig_ids):
        assert p1.width == p0.width
        assert p1.num_clusters == p0.num_clusters
        np.testing.assert_array_equal(p1.smem_nodes, p0.smem_nodes)
        np.testing.assert_array_equal(p1.groups, p0.groups)
        np.testing.assert_array_equal(p1.tri_map, p0.tri_map)
        np.testing.assert_array_equal(i1, i0)
