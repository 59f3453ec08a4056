"""Incremental update tests: device refit + host pointer-tree surgery.

Mirrors the reference's optimization tests (src/bvh/optimization.rs:392-670),
e.g. moving most of a scene then asserting consistent + tight.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh import build_sah
from bvh_tpu.bvh.refit import refit, update_shapes
from bvh_tpu.bvh.tree import Bvh
from bvh_tpu.bvh.traverse import brute_force_closest_hit, closest_hit_triangles
from bvh_tpu.bvh.validate import assert_consistent, assert_tight


def moved_scene(n_cubes=50, frac=0.5, seed=99):
    a, b, c = tb.create_n_cubes(n_cubes)
    n = a.shape[0]
    a2, b2, c2, idx = tb.randomly_transform_scene(a, b, c, int(n * frac), seed=seed)
    return (a, b, c), (a2, b2, c2), idx


def test_device_refit_consistent_tight():
    (a, b, c), (a2, b2, c2), idx = moved_scene()
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    mn2, mx2 = tb.tri_aabbs(a2, b2, c2)
    new = refit(flat.to_device(), jnp.asarray(mn2), jnp.asarray(mx2))
    new = new.to_host()
    assert_consistent(new, mn2, mx2)
    assert_tight(new)
    # topology unchanged
    assert np.array_equal(new.entry, np.asarray(flat.entry))


def test_refit_traversal_still_correct():
    (a, b, c), (a2, b2, c2), idx = moved_scene(30, 0.4)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    mn2, mx2 = tb.tri_aabbs(a2, b2, c2)
    new = update_shapes(flat.to_device(), jnp.asarray(mn2), jnp.asarray(mx2))

    centers = a2.reshape(-1, 12, 3).mean(axis=1)
    origins = (centers + np.array([700.0, 350.0, -500.0], np.float32)).astype(np.float32)
    aim = centers + np.array([0.11, 0.07, -0.13], np.float32)
    rays = Ray.create(jnp.asarray(origins), jnp.asarray((aim - origins).astype(np.float32)))
    a2j, b2j, c2j = jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2)
    got = closest_hit_triangles(new, rays, a2j, b2j, c2j)
    want = brute_force_closest_hit(rays, a2j, b2j, c2j)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-6)


def test_tree_add_remove_roundtrip():
    a, b, c = tb.create_n_cubes(10)
    mn, mx = tb.tri_aabbs(a, b, c)
    t = Bvh(mn, mx)
    t.assert_consistent()
    t.assert_tight()
    n = mn.shape[0]
    # remove a third of the shapes
    removed = list(range(0, n, 3))
    for i in removed:
        t.remove_shape(i)
    t.assert_consistent()
    # re-add them
    for i in removed:
        t.add_shape(i)
    t.assert_consistent()
    t.assert_tight()
    assert t.count == 2 * n - 1


def test_tree_update_shapes_like_reference_bench():
    """Move 75% of 1,200 triangles, update, verify, and traverse correctly
    (reference test moves 9k of 12k then asserts; scaled down for CI)."""
    (a, b, c), (a2, b2, c2), idx = moved_scene(100, 0.75)
    mn, mx = tb.tri_aabbs(a, b, c)
    t = Bvh(mn, mx)
    mn2, mx2 = tb.tri_aabbs(a2, b2, c2)
    t.update_shapes(idx.tolist(), mn2[idx], mx2[idx])
    t.assert_consistent()
    t.assert_tight()

    flat, s2n = t.flatten()
    assert_consistent(flat, mn2, mx2)
    assert_tight(flat)

    centers = a2.reshape(-1, 12, 3).mean(axis=1)[:64]
    origins = (centers + np.array([900.0, -400.0, 600.0], np.float32)).astype(np.float32)
    aim = centers + np.array([0.11, 0.07, -0.13], np.float32)
    rays = Ray.create(jnp.asarray(origins), jnp.asarray((aim - origins).astype(np.float32)))
    a2j, b2j, c2j = jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2)
    got = closest_hit_triangles(flat.to_device(), rays, a2j, b2j, c2j)
    want = brute_force_closest_hit(rays, a2j, b2j, c2j)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-6)


def test_tree_remove_all_then_rebuild():
    mn = np.arange(12, dtype=np.float32).reshape(4, 3)
    mx = mn + 1.0
    t = Bvh(mn, mx)
    for i in range(4):
        t.remove_shape(i)
    assert t.count == 0
    for i in range(4):
        t.add_shape(i)
    t.assert_consistent()
    t.assert_tight()
    assert t.count == 7


def test_tree_single_and_empty():
    t = Bvh(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32))
    assert t.count == 0
    t.add_shape(0) if t.shape_to_node.shape[0] else None
    t2 = Bvh(np.zeros((1, 3), np.float32), np.ones((1, 3), np.float32))
    assert t2.count == 1
    t2.remove_shape(0)
    assert t2.count == 0
