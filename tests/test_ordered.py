"""Ordered traversal: monotone distances + set-equality with plain traverse
(the reference fuzzer's checks, fuzz/fuzz_targets/fuzz.rs:484-520)."""

import numpy as np

import jax.numpy as jnp

from bvh_tpu import Ray, RayQuery
from bvh_tpu import testbase as tb
from bvh_tpu.bvh import build_sah, traverse
from bvh_tpu.bvh.ordered import farthest_traverse, nearest_traverse
from bvh_tpu.ray import intersection_slice_for_aabb


def setup():
    a, b, c = tb.create_n_cubes(40)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    centers = a.reshape(-1, 12, 3).mean(axis=1)[:32]
    origins = (centers + np.array([600.0, 300.0, -450.0], np.float32)).astype(np.float32)
    aim = centers + np.array([0.11, 0.07, -0.13], np.float32)
    rays = Ray.create(jnp.asarray(origins), jnp.asarray((aim - origins).astype(np.float32)))
    return mn, mx, flat.to_device(), rays


def test_nearest_monotone_and_matches_unordered():
    mn, mx, flat, rays = setup()
    ids, dist, count = nearest_traverse(flat, rays, max_hits=64)
    hits_u, count_u = traverse(flat, RayQuery(rays), max_hits=64)
    ids, dist, count = map(np.asarray, (ids, dist, count))
    for i in range(ids.shape[0]):
        k = int(count[i])
        assert k == int(count_u[i])
        assert set(ids[i][:k].tolist()) == set(np.asarray(hits_u[i])[: k].tolist())
        d = dist[i][:k]
        assert np.all(np.diff(d) >= 0), "ascending order violated"
        # distances match per-shape slab entry distances
        for j in range(k):
            hit, t0, t1 = intersection_slice_for_aabb(
                Ray(rays.origin[i], rays.direction[i], rays.inv_direction[i]),
                jnp.asarray(mn[ids[i][j]]),
                jnp.asarray(mx[ids[i][j]]),
            )
            assert bool(hit)
            assert float(t0) == d[j]


def test_farthest_monotone():
    mn, mx, flat, rays = setup()
    ids, dist, count = farthest_traverse(flat, rays, max_hits=64)
    ids, dist, count = map(np.asarray, (ids, dist, count))
    for i in range(ids.shape[0]):
        k = int(count[i])
        d = dist[i][:k]
        assert np.all(np.diff(d) <= 0), "descending order violated"


def test_ordered_overlapping_children():
    """Regression analog: heavily overlapping boxes must still order exactly
    (reference distance_traverse.rs:292-322)."""
    rng = np.random.default_rng(5)
    mn = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    mx = mn + rng.uniform(1.0, 4.0, (16, 3)).astype(np.float32)  # big overlaps
    flat, _ = build_sah(mn, mx)
    rays = Ray.create(
        jnp.asarray(np.array([[-10.0, 0.0, 0.0]], np.float32)),
        jnp.asarray(np.array([[1.0, 0.05, 0.02]], np.float32)),
    )
    ids, dist, count = nearest_traverse(flat.to_device(), rays, max_hits=32)
    k = int(count[0])
    d = np.asarray(dist)[0][:k]
    assert np.all(np.diff(d) >= 0)
