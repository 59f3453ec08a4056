"""Traversal differential tests: BVH vs brute-force oracles.

The reference's fuzz harness compares all traversal variants against each
other and against brute force (fuzz/fuzz_targets/fuzz.rs:299-376). Here the
same idea: grid scenes (well-separated unit cubes, no boundary grazing) must
agree EXACTLY; random scenes compare closest-hit distances allclose.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import Ball, BallQuery, PointQuery, Ray, RayQuery, AabbQuery, Aabb
from bvh_tpu import testbase as tb
from bvh_tpu.bvh import (
    brute_force_closest_hit,
    brute_force_collect,
    build_sah,
    closest_hit_triangles,
    any_hit_triangles,
    nearest_to_triangles,
    traverse,
)
from bvh_tpu.tri import point_triangle_distance_squared


@pytest.fixture(scope="module")
def cube_scene():
    a, b, c = tb.create_n_cubes(100)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    return (
        jnp.asarray(a),
        jnp.asarray(b),
        jnp.asarray(c),
        mn,
        mx,
        flat.to_device(),
    )


@pytest.fixture(scope="module")
def grid_scene():
    """Unit cubes at well-separated integer grid positions: exact-agreement mode."""
    k = 4  # 64 cubes
    centers = np.stack(
        np.meshgrid(*[np.arange(k) * 4.0] * 3, indexing="ij"), axis=-1
    ).reshape(-1, 3).astype(np.float32)
    tris = centers[:, None, None, :] + tb._CUBE_TRIS[None]
    tris = tris.reshape(-1, 3, 3)
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    return jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), mn, mx, flat.to_device(), centers


def test_ray_traverse_exact_vs_brute(grid_scene):
    a, b, c, mn, mx, flat, centers = grid_scene
    # axis-parallel rays through cube rows, offset 0.1 to avoid face grazing
    origins = np.array(
        [[-10.0, y, z] for y in [0.1, 4.1, 8.3] for z in [0.2, 4.2, 12.3]],
        np.float32,
    )
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (len(origins), 1))
    rays = Ray.create(jnp.asarray(origins), jnp.asarray(dirs))
    q = RayQuery(rays)
    hits, count = traverse(flat, q, max_hits=256)
    oracle = np.asarray(brute_force_collect(q, jnp.asarray(mn), jnp.asarray(mx)))
    for i in range(len(origins)):
        got = set(np.asarray(hits[i][: int(count[i])]).tolist())
        want = set(np.nonzero(oracle[i])[0].tolist())
        assert got == want, f"ray {i}: {got ^ want}"


def test_closest_hit_matches_brute(cube_scene):
    a, b, c, mn, mx, flat = cube_scene
    centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)[:50]
    origins = centers + np.array([900.0, 333.0, -555.0], np.float32)
    dirs = centers - origins
    rays = Ray.create(jnp.asarray(origins.astype(np.float32)), jnp.asarray(dirs.astype(np.float32)))
    got = closest_hit_triangles(flat, rays, a, b, c)
    want = brute_force_closest_hit(rays, a, b, c)
    npt = np.asarray
    assert np.all(np.isfinite(npt(want.t)))  # aimed rays must hit
    np.testing.assert_allclose(npt(got.t), npt(want.t), rtol=1e-6)
    # same triangle or an equally-distant one
    same = npt(got.shape_id) == npt(want.shape_id)
    if not same.all():
        alt = np.isclose(npt(got.t)[~same], npt(want.t)[~same], rtol=1e-6)
        assert alt.all()
    np.testing.assert_allclose(npt(got.u), npt(want.u), rtol=1e-4, atol=1e-6)


def test_closest_hit_miss_is_inf(cube_scene):
    a, b, c, mn, mx, flat = cube_scene
    origins = jnp.array([[200000.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)  # points away from scene
    rays = Ray.create(origins, dirs)
    got = closest_hit_triangles(flat, rays, a, b, c)
    assert np.isinf(np.asarray(got.t)[0])
    assert int(got.shape_id[0]) == -1


def test_any_hit(cube_scene):
    a, b, c, mn, mx, flat = cube_scene
    centers = np.asarray(a).reshape(-1, 12, 3).mean(axis=1)[:10]
    origins = centers + np.array([100.0, 50.0, -75.0], np.float32)
    hit_dirs = centers - origins
    rays = Ray.create(jnp.asarray(origins.astype(np.float32)), jnp.asarray(hit_dirs.astype(np.float32)))
    assert np.asarray(any_hit_triangles(flat, rays, a, b, c)).all()
    away = Ray.create(
        jnp.asarray((centers + np.array([300000.0, 0, 0])).astype(np.float32)),
        jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (10, 1)).astype(np.float32)),
    )
    assert not np.asarray(any_hit_triangles(flat, away, a, b, c)).any()


def test_aabb_query_vs_brute(cube_scene):
    a, b, c, mn, mx, flat = cube_scene
    lo = mn.min(axis=0)
    hi = mx.max(axis=0)
    span = hi - lo
    boxes_min = (lo + span * np.array([[0.1, 0.1, 0.1], [0.4, 0.2, 0.3]], np.float32)).astype(np.float32)
    boxes_max = boxes_min + span[None] * 0.25
    q = AabbQuery(Aabb(jnp.asarray(boxes_min), jnp.asarray(boxes_max)))
    hits, count = traverse(flat, q, max_hits=1200)
    oracle = np.asarray(brute_force_collect(q, jnp.asarray(mn), jnp.asarray(mx)))
    for i in range(2):
        got = set(np.asarray(hits[i][: int(count[i])]).tolist())
        want = set(np.nonzero(oracle[i])[0].tolist())
        assert got == want


def test_point_and_ball_query(grid_scene):
    a, b, c, mn, mx, flat, centers = grid_scene
    # point on the +x face of a cube: inside the AABBs of that face's triangles
    p = jnp.asarray(centers[:3] + np.array([0.5, 0.2, -0.1], np.float32))
    q = PointQuery(p)
    hits, count = traverse(flat, q, max_hits=64)
    oracle = np.asarray(brute_force_collect(q, jnp.asarray(mn), jnp.asarray(mx)))
    for i in range(3):
        got = set(np.asarray(hits[i][: int(count[i])]).tolist())
        assert got == set(np.nonzero(oracle[i])[0].tolist())
        assert len(got) >= 2  # the two +x-face triangles at least

    ball = Ball.create(jnp.asarray(centers[:3]), jnp.asarray(np.full(3, 0.75, np.float32)))
    qb = BallQuery(ball)
    hits, count = traverse(flat, qb, max_hits=64)
    oracle = np.asarray(brute_force_collect(qb, jnp.asarray(mn), jnp.asarray(mx)))
    for i in range(3):
        got = set(np.asarray(hits[i][: int(count[i])]).tolist())
        assert got == set(np.nonzero(oracle[i])[0].tolist())


def test_nearest_to_matches_brute(cube_scene):
    a, b, c, mn, mx, flat = cube_scene
    rng = np.random.default_rng(3)
    pts = rng.uniform(-100000, 100000, (20, 3)).astype(np.float32)
    sid, dist = nearest_to_triangles(flat, jnp.asarray(pts), a, b, c)
    d2_all = np.asarray(
        point_triangle_distance_squared(
            jnp.asarray(pts)[:, None, :], a[None], b[None], c[None]
        )
    )
    best = d2_all.min(axis=1)
    np.testing.assert_allclose(np.asarray(dist) ** 2, best, rtol=1e-4)


def test_traverse_overflow_reported(grid_scene):
    a, b, c, mn, mx, flat, centers = grid_scene
    # a box covering everything with a tiny buffer => count exceeds max_hits
    q = AabbQuery(
        Aabb(
            jnp.asarray(mn.min(axis=0)[None] - 1),
            jnp.asarray(mx.max(axis=0)[None] + 1),
        )
    )
    hits, count = traverse(flat, q, max_hits=8)
    assert int(count[0]) == mn.shape[0]  # true count reported
    assert hits.shape[-1] == 8


def test_empty_bvh_traversal():
    from bvh_tpu.bvh import FlatBvh

    flat = FlatBvh.empty(3).to_device()
    rays = Ray.create(jnp.zeros((4, 3)), jnp.ones((4, 3)))
    hits, count = traverse(flat, RayQuery(rays), max_hits=4)
    assert np.all(np.asarray(count) == 0)
    e = jnp.zeros((0, 3), jnp.float32)
    got = closest_hit_triangles(flat, rays, e, e, e)
    assert np.all(np.isinf(np.asarray(got.t)))


def test_nearest_to_generic_balls():
    """Shape-generic nearest_to with a user distance hook (reference
    PointDistance, src/point_query.rs:7-10): balls as shapes, solid-ball
    distance, verified against brute force."""
    from bvh_tpu.bvh import build_sah, nearest_to

    rng = np.random.default_rng(3)
    n = 200
    centers_b = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    radii = rng.uniform(0.5, 4.0, size=(n,)).astype(np.float32)
    mn = centers_b - radii[:, None]
    mx = centers_b + radii[:, None]
    flat, _ = build_sah(mn, mx)
    flat = flat.to_device()

    cb = jnp.asarray(centers_b)
    rb = jnp.asarray(radii)

    def ball_d2(pts, si):
        d = jnp.linalg.norm(pts - cb[si], axis=-1) - rb[si]
        return jnp.maximum(d, 0.0) ** 2

    pts = rng.uniform(-60, 60, size=(64, 3)).astype(np.float32)
    sid, dist = nearest_to(flat, jnp.asarray(pts), ball_d2)

    d_all = np.linalg.norm(pts[:, None, :] - centers_b[None], axis=-1) - radii[None]
    d2_all = np.maximum(d_all, 0.0) ** 2
    best = d2_all.min(axis=1)
    np.testing.assert_allclose(np.asarray(dist) ** 2, best, rtol=1e-4, atol=1e-6)
    # winning ids must achieve the best distance (ties legal)
    got_d2 = d2_all[np.arange(64), np.asarray(sid)]
    np.testing.assert_allclose(got_d2, best, rtol=1e-4, atol=1e-6)


def test_traverse_all_auto_grows(grid_scene):
    from bvh_tpu.bvh import traverse_all

    a, b, c, mn, mx, flat, centers = grid_scene
    q = AabbQuery(
        Aabb(
            jnp.asarray(mn.min(axis=0)[None] - 1),
            jnp.asarray(mx.max(axis=0)[None] + 1),
        )
    )
    hits, count = traverse_all(flat, q, max_hits=8)
    n = mn.shape[0]
    assert int(count[0]) == n
    assert hits.shape[-1] >= n  # buffer grew until everything fit
    got = sorted(int(x) for x in np.asarray(hits[0]) if x >= 0)
    assert got == list(range(n))  # every shape collected exactly once
