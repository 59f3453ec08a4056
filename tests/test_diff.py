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


def test_fast_path_matches_slow_gradients():
    """render_depth_fast (Pallas hard pass) vs render_depth: same loss and
    gradients up to the ~1% of grazing rays whose winner differs between the
    bilinear-form kernel and direct Moller-Trumbore."""
    from bvh_tpu.diff import render_depth_fast
    from bvh_tpu.ops import build_tight_scene

    a, b, c = tb.create_n_cubes(40)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    dev = flat.to_device()
    scene = build_tight_scene(a, b, c, use_native=False)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 1024
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(5)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 40.0).astype(np.float32)
    d = (centers[idx] + 0.23 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    tgt = jnp.full((n,), 40.0, jnp.float32)

    def loss_slow(av):
        depth, hit = render_depth(dev, rays, av, bj, cj)
        return jnp.sum(jnp.where(hit, (depth - tgt) ** 2, 0.0))

    def loss_fast(av):
        depth, hit = render_depth_fast(scene, rays, av, bj, cj, packet=1024, interpret=True)
        return jnp.sum(jnp.where(hit, (depth - tgt) ** 2, 0.0))

    vs, gs = jax.value_and_grad(loss_slow)(aj)
    vf, gf = jax.value_and_grad(loss_fast)(aj)
    assert np.isfinite(float(vf))
    assert abs(float(vs) - float(vf)) / float(vs) < 2e-2
    gs, gf = np.asarray(gs), np.asarray(gf)
    assert abs(np.abs(gs).sum() - np.abs(gf).sum()) / np.abs(gs).sum() < 2e-2
    # vertices of triangles whose winner agrees get identical gradients
    agree = np.isclose(gs, gf, rtol=1e-4, atol=1e-6).mean()
    assert agree > 0.97
