"""LBVH device build: structural invariants + traversal parity with SAH."""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh import assert_consistent, assert_tight, build_sah
from bvh_tpu.bvh.lbvh import build_lbvh, morton_codes
from bvh_tpu.bvh.traverse import brute_force_closest_hit, closest_hit_triangles


def test_morton_order():
    # codes are monotone along each axis in the unit cube
    pts = jnp.array([[0.0, 0, 0], [0.9, 0, 0], [0, 0.9, 0], [0, 0, 0.9]], jnp.float32)
    mn = jnp.zeros(3)
    mx = jnp.ones(3)
    codes = np.asarray(morton_codes(pts, mn, mx))
    assert codes[0] == 0
    assert codes[1] > codes[2] > codes[3]  # x highest bit, then y, then z


@pytest.mark.parametrize("n_cubes", [1, 2, 5, 64, 333])
def test_lbvh_structure(n_cubes):
    a, b, c = tb.create_n_cubes(n_cubes)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, s2n = build_lbvh(jnp.asarray(mn), jnp.asarray(mx))
    flat = flat.to_host()
    n = mn.shape[0]
    assert flat.num_nodes == 2 * n - 1
    assert_consistent(flat, mn, mx)
    assert_tight(flat)
    s2n = np.asarray(s2n)
    assert np.all(flat.shape[s2n] == np.arange(n))


def test_lbvh_duplicate_centroids():
    # identical centroids: duplicate Morton codes exercise the index tiebreak
    mn = np.zeros((37, 3), np.float32)
    mx = np.ones((37, 3), np.float32)
    flat, _ = build_lbvh(jnp.asarray(mn), jnp.asarray(mx))
    flat = flat.to_host()
    assert flat.num_nodes == 73
    assert_consistent(flat, mn, mx)
    assert_tight(flat)


def test_lbvh_traversal_matches_sah():
    a, b, c = tb.create_n_cubes(200)
    mn, mx = tb.tri_aabbs(a, b, c)
    lb, _ = build_lbvh(jnp.asarray(mn), jnp.asarray(mx))
    sah, _ = build_sah(mn, mx)

    centers = a.reshape(-1, 12, 3).mean(axis=1)[:64]
    origins = (centers + np.array([1500.0, -777.0, 912.0], np.float32)).astype(np.float32)
    aim = centers + np.array([0.13, 0.09, -0.07], np.float32)
    rays = Ray.create(jnp.asarray(origins), jnp.asarray((aim - origins).astype(np.float32)))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    h_lb = closest_hit_triangles(lb, rays, aj, bj, cj)
    h_sah = closest_hit_triangles(sah.to_device(), rays, aj, bj, cj)
    h_bf = brute_force_closest_hit(rays, aj, bj, cj)
    np.testing.assert_allclose(np.asarray(h_lb.t), np.asarray(h_bf.t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h_lb.t), np.asarray(h_sah.t), rtol=1e-6)
