"""Differentiable hit layer: gradient correctness vs finite differences."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh import build_sah
from bvh_tpu.diff import camera_rays, render_depth, render_hits


@pytest.fixture(scope="module")
def small_scene():
    a, b, c = tb.create_n_cubes(8)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    return jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), flat.to_device()


def test_depth_gradient_wrt_vertices_fd(small_scene):
    a, b, c, flat = small_scene
    centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)
    origin = (centers[0] + np.array([40.0, 25.0, -30.0], np.float32)).astype(np.float32)
    aim = centers[0] + np.array([0.13, 0.08, -0.11], np.float32)
    rays = Ray.create(jnp.asarray(origin[None]), jnp.asarray((aim - origin)[None]))

    def depth_sum(a_):
        d, _ = render_depth(flat, rays, a_, b, c)
        return jnp.sum(d)

    g = jax.grad(depth_sum)(a)
    hit = render_hits(flat, rays, a, b, c)
    tri = int(hit.shape_id[0])
    assert tri >= 0
    ga = np.asarray(g)
    # gradient concentrated on the hit triangle's 'a' vertex
    assert np.abs(ga[tri]).sum() > 0
    others = np.delete(ga, tri, axis=0)
    assert np.abs(others).sum() == 0.0

    # finite differences on the hit vertex (vertex coords are O(100k):
    # f64 FD via numpy recompute would be ideal; h=0.02 works in f32)
    h = 0.05
    for axis in range(3):
        ap = np.asarray(a).copy()
        ap[tri, axis] += h
        am = np.asarray(a).copy()
        am[tri, axis] -= h
        # coordinates are O(100k): the realized f32 step is quantized, so use it
        h_eff = float(ap[tri, axis]) - float(am[tri, axis])
        fd = (float(depth_sum(jnp.asarray(ap))) - float(depth_sum(jnp.asarray(am)))) / h_eff
        assert fd == pytest.approx(float(ga[tri, axis]), rel=0.08, abs=5e-3)


def test_depth_gradient_wrt_ray_origin(small_scene):
    a, b, c, flat = small_scene
    centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)
    origin = (centers[0] + np.array([40.0, 25.0, -30.0], np.float32)).astype(np.float32)
    aim = centers[0] + np.array([0.13, 0.08, -0.11], np.float32)
    d = (aim - origin).astype(np.float32)
    d = d / np.linalg.norm(d)

    def depth_of(o):
        rays = Ray(o[None], jnp.asarray(d)[None], jnp.asarray(1.0 / d)[None])
        dep, _ = render_depth(flat, rays, a, b, c)
        return dep[0]

    g = np.asarray(jax.grad(depth_of)(jnp.asarray(origin)))
    # moving the origin along the ray direction reduces distance 1:1
    assert float(np.dot(g, d)) == pytest.approx(-1.0, rel=1e-3)


def test_camera_render(small_scene):
    a, b, c, flat = small_scene
    centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)
    eye = centers[0] + np.array([3.0, 2.0, -4.0], np.float32)
    rays = camera_rays(eye, centers[0], np.array([0.0, 1.0, 0.0]), 45.0, 32, 24)
    assert rays.origin.shape == (32 * 24, 3)
    depth, mask = render_depth(flat, rays, a, b, c)
    m = np.asarray(mask).reshape(24, 32)
    dep = np.asarray(depth).reshape(24, 32)
    assert m.any(), "camera aimed at a cube must see it"
    assert not m.all(), "cube must not fill the whole frame"
    dist = np.linalg.norm(eye - centers[0])
    hits = dep[m]
    assert hits.min() > dist - 2 and hits.max() < dist + 2


def test_miss_lanes_zero_gradient(small_scene):
    a, b, c, flat = small_scene
    origin = np.array([500000.0, 0.0, 0.0], np.float32)
    rays = Ray.create(jnp.asarray(origin[None]), jnp.asarray(np.array([[1.0, 0, 0]], np.float32)))

    def f(a_):
        d, _ = render_depth(flat, rays, a_, b, c, background=7.0)
        return jnp.sum(d)

    val, g = jax.value_and_grad(f)(a)
    assert float(val) == 7.0
    assert np.abs(np.asarray(g)).sum() == 0.0
