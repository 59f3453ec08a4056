"""f64 scalars and 2-D/4-D spaces on the pure-JAX path.

The reference is generic over ``T: BHValue`` (f32/f64) and ``const D``
(2/3/4+) — ``src/bounding_hierarchy.rs:18-46``, ``src/ball.rs:11-23``,
``src/ray/intersect_simd.rs:99-270``. The TPU build keeps the Pallas kernels
f32/3-D (the hardware path) and supports f64 and other dimensions on the
pure-JAX build/traverse/query path, exercised here:

* 2-D grid-mode differential fuzz: build + all four query traversals vs
  brute force (exact agreement), nearest_to with a box-distance hook,
  refit after mutation.
* f64 3-D: build in f64, closest-hit vs an f64 brute-force oracle at
  tolerances f32 could not reach, nearest_to, refit invariants.
* 4-D build + query smoke test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bvh_tpu import Aabb, AabbQuery, Ball, BallQuery, PointQuery, Ray, RayQuery
from bvh_tpu.bvh import (
    brute_force_closest_hit,
    brute_force_collect,
    build_sah,
    check_consistent,
    check_tight,
    closest_hit_triangles,
    nearest_to,
    traverse,
    update_shapes,
)


def _grid_boxes_2d(rng, n):
    centers = rng.integers(-40, 40, size=(n, 2)).astype(np.float32) * 4.0
    half = rng.integers(1, 3, size=(n, 1)).astype(np.float32)
    return centers - half, centers + half


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_2d_grid(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(4, 64))
    mn, mx = _grid_boxes_2d(rng, n)

    for _round in range(3):
        flat, s2n = build_sah(mn, mx)
        assert flat.ndim_space == 2
        assert check_consistent(flat, mn, mx) == []
        assert check_tight(flat) == []
        dev = flat.to_device()
        mnj, mxj = jnp.asarray(mn), jnp.asarray(mx)

        # grid-mode queries: integer coords, axis-parallel rays => exact
        o = rng.integers(-200, 200, size=(8, 2)).astype(np.float32)
        d = np.zeros((8, 2), np.float32)
        axis = rng.integers(0, 2, size=8)
        d[np.arange(8), axis] = rng.choice([-1.0, 1.0], size=8)
        rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
        queries = [
            RayQuery(rays),
            AabbQuery(Aabb(jnp.asarray(o - 16.0), jnp.asarray(o + 16.0))),
            PointQuery(jnp.asarray(o * 0.25)),
            BallQuery(Ball(jnp.asarray(o * 0.5), jnp.full((8,), 24.0, jnp.float32))),
        ]
        for q in queries:
            hits, count = traverse(dev, q, max_hits=max(n, 8))
            want_mask = np.asarray(brute_force_collect(q, mnj, mxj))
            got_sets = [set(int(s) for s in row[row >= 0]) for row in np.asarray(hits)]
            want_sets = [set(np.nonzero(row)[0].tolist()) for row in want_mask]
            assert got_sets == want_sets, type(q).__name__

        # nearest box to each point (exact box distance as the shape hook —
        # the PointDistance analog for 2-D box shapes)
        def box_d2(pts, si):
            q = jnp.maximum(jnp.maximum(mnj[si] - pts, pts - mxj[si]), 0.0)
            return jnp.sum(q * q, axis=-1)

        pts = jnp.asarray(rng.uniform(-150, 150, size=(8, 2)).astype(np.float32))
        nid, ndist = nearest_to(dev, pts, box_d2)
        qq = np.maximum(np.maximum(mn[None] - np.asarray(pts)[:, None],
                                   np.asarray(pts)[:, None] - mx[None]), 0.0)
        want = np.sqrt((qq * qq).sum(-1).min(axis=1))
        np.testing.assert_allclose(np.asarray(ndist), want, rtol=1e-5, atol=1e-5)

        # mutation + refit
        k = int(rng.integers(1, n + 1))
        moved = rng.choice(n, size=k, replace=False)
        delta = rng.integers(-10, 10, size=(k, 2)).astype(np.float32) * 4.0
        mn = mn.copy(); mx = mx.copy()
        mn[moved] += delta
        mx[moved] += delta
        refitted = update_shapes(dev, jnp.asarray(mn), jnp.asarray(mx))
        assert check_consistent(refitted.to_host(), mn, mx) == []
        assert check_tight(refitted.to_host()) == []


def test_f64_build_and_closest_hit():
    """f64 end-to-end: the tree, slab tests, and Moller-Trumbore all run in
    f64 and resolve features far below f32 resolution."""
    from bvh_tpu import testbase as tb

    rng = np.random.default_rng(7)
    with jax.enable_x64(True):
        a32, b32, c32 = tb.create_n_cubes(40)
        # separate two nearly-coincident triangles by ~1e-9 along x:
        # f32 (eps ~1.2e-7 relative) cannot tell them apart, f64 must.
        a = a32.astype(np.float64); b = b32.astype(np.float64); c = c32.astype(np.float64)
        base = np.array([[0.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0]])
        eps9 = 1e-9
        a = np.concatenate([a, [base[0] + [2e5, 0, 0]], [base[0] + [2e5 + eps9, 0, 0]]])
        b = np.concatenate([b, [base[1] + [2e5, 0, 0]], [base[1] + [2e5 + eps9, 0, 0]]])
        c = np.concatenate([c, [base[2] + [2e5, 0, 0]], [base[2] + [2e5 + eps9, 0, 0]]])
        mn, mx = tb.tri_aabbs(a, b, c)
        assert mn.dtype == np.float64
        flat, _ = build_sah(mn, mx)
        assert flat.aabb_min.dtype == np.float64
        assert check_consistent(flat, mn, mx) == []
        assert check_tight(flat) == []
        dev = flat.to_device()
        aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
        assert aj.dtype == jnp.float64

        # rays at the two near-coincident triangles from +x: the nearer (by
        # 1e-9) must win, and t must carry f64 resolution
        o = np.array([[2e5 + 50.0, 1.0, 1.0]] * 2)
        d = np.array([[-1.0, 0.0, 0.0]] * 2)
        rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
        got = closest_hit_triangles(dev, rays, aj, bj, cj)
        assert got.t.dtype == jnp.float64
        assert int(got.shape_id[0]) == a.shape[0] - 1  # the +eps9 one is nearer
        # f64 MT at 2e5-scale coords carries ~1e-11 absolute error; f32
        # would be ~1e-2 here
        assert abs(float(got.t[0]) - (50.0 - eps9)) < 1e-9

        # random rays vs f64 brute force at f64-only tolerance
        o = rng.uniform(-500, 500, size=(16, 3))
        centers = a[: 40 * 12].reshape(-1, 12, 3).mean(axis=1)
        d = centers[rng.integers(0, 40, size=16)] + 0.1 - o
        rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
        got = closest_hit_triangles(dev, rays, aj, bj, cj)
        want = brute_force_closest_hit(rays, aj, bj, cj)
        np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t),
                                   rtol=1e-12, equal_nan=True)

        # refit stays f64-tight
        shift = np.float64(1e-7)
        refitted = update_shapes(dev, jnp.asarray(mn + shift), jnp.asarray(mx + shift))
        assert refitted.aabb_min.dtype == jnp.float64
        assert check_consistent(refitted.to_host(), mn + shift, mx + shift) == []
        assert check_tight(refitted.to_host()) == []


def test_4d_build_and_queries():
    rng = np.random.default_rng(11)
    n = 64
    centers = rng.uniform(-50, 50, size=(n, 4)).astype(np.float32)
    half = rng.uniform(0.5, 3.0, size=(n, 1)).astype(np.float32)
    mn, mx = centers - half, centers + half
    flat, _ = build_sah(mn, mx)
    assert flat.ndim_space == 4
    assert check_consistent(flat, mn, mx) == []
    assert check_tight(flat) == []
    dev = flat.to_device()
    mnj, mxj = jnp.asarray(mn), jnp.asarray(mx)

    pts = jnp.asarray(rng.uniform(-60, 60, size=(8, 4)).astype(np.float32))
    for q in (PointQuery(pts),
              AabbQuery(Aabb(pts - 10.0, pts + 10.0)),
              BallQuery(Ball(pts, jnp.full((8,), 15.0, jnp.float32)))):
        hits, count = traverse(dev, q, max_hits=n)
        want_mask = np.asarray(brute_force_collect(q, mnj, mxj))
        got_sets = [set(int(s) for s in row[row >= 0]) for row in np.asarray(hits)]
        want_sets = [set(np.nonzero(row)[0].tolist()) for row in want_mask]
        assert got_sets == want_sets, type(q).__name__
