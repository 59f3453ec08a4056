"""Differential fuzzing — the analog of the reference's libFuzzer target.

The reference fuzzer (``fuzz/fuzz_targets/fuzz.rs``) generates an arbitrary
workload (shapes + ray + point + aabb + ball + mutations), then on every
iteration asserts tree invariants, flattens, checks all traversal variants
agree with each other and with brute force, and applies a mutation. Here the
workload is driven by seeded numpy randomness (deterministic, like the
reference's Grid mode trick of using exact-agreement-friendly geometry), and
each iteration checks:

* build (numpy SAH, native SAH, LBVH) => ``check_consistent`` + ``check_tight``
* ``traverse`` (flat stackless) vs brute-force AABB collection, for
  Ray/Aabb/Point/Ball queries
* ``closest_hit_triangles`` vs ``brute_force_closest_hit``
* ``nearest_to_triangles`` vs brute-force point-triangle distance
* mutation: move a random subset of shapes, ``update_shapes`` refit, recheck
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import AabbQuery, BallQuery, PointQuery, Ray, RayQuery
from bvh_tpu import testbase as tb
from bvh_tpu.bvh import (
    brute_force_closest_hit,
    brute_force_collect,
    build_lbvh,
    build_sah,
    check_consistent,
    check_tight,
    closest_hit_triangles,
    nearest_to_triangles,
    traverse,
    update_shapes,
)
from bvh_tpu.native import build_sah_auto
from bvh_tpu.tri import point_triangle_distance_squared


def _grid_scene(rng, n_cubes):
    """Integer-coordinate cubes (the fuzzer's Grid mode): exact agreement."""
    centers = rng.integers(-40, 40, size=(n_cubes, 3)).astype(np.float32) * 4.0
    tris = centers[:, None, None, :] + tb._CUBE_TRIS[None, :, :, :]
    tris = tris.reshape(n_cubes * 12, 3, 3).astype(np.float32)
    return tris[:, 0, :], tris[:, 1, :], tris[:, 2, :]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_workload(seed):
    rng = np.random.default_rng(seed)
    n_cubes = int(rng.integers(2, 30))
    a, b, c = _grid_scene(rng, n_cubes)
    n = a.shape[0]

    for round_i in range(3):
        mn, mx = tb.tri_aabbs(a, b, c)
        mnj, mxj = jnp.asarray(mn), jnp.asarray(mx)

        # --- builds + invariants (reference: assert_consistent/assert_tight)
        flat, s2n = build_sah(mn, mx)
        assert check_consistent(flat, mn, mx) == []
        assert check_tight(flat) == []
        flat_native, _ = build_sah_auto(mn, mx)
        assert check_consistent(flat_native, mn, mx) == []
        assert check_tight(flat_native) == []
        lb, _ = build_lbvh(mnj, mxj)
        assert check_consistent(lb.to_host(), mn, mx) == []
        assert check_tight(lb.to_host()) == []
        # kernel-path tables get the same treatment (ops/validate_scene.py)
        from bvh_tpu.ops import build_tight_scene, check_tight_scene

        assert check_tight_scene(
            build_tight_scene(a, b, c, use_native=False), a, b, c) == []

        dev = flat.to_device()

        # --- query workload (ray + aabb + point + ball, like Workload)
        o = rng.uniform(-200, 200, size=(8, 3)).astype(np.float32)
        d = rng.normal(size=(8, 3)).astype(np.float32)
        rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
        from bvh_tpu import Aabb, Ball

        queries = [
            RayQuery(rays),
            AabbQuery(Aabb(jnp.asarray(o - 20.0), jnp.asarray(o + 20.0))),
            PointQuery(jnp.asarray(o * 0.1)),
            BallQuery(Ball(jnp.asarray(o * 0.2), jnp.full((8,), 30.0, jnp.float32))),
        ]
        for q in queries:
            hits, count = traverse(dev, q, max_hits=max(n, 8))
            want_mask = np.asarray(brute_force_collect(q, mnj, mxj))
            got_sets = [
                set(int(s) for s in row[row >= 0]) for row in np.asarray(hits)
            ]
            want_sets = [set(np.nonzero(row)[0].tolist()) for row in want_mask]
            assert got_sets == want_sets, type(q).__name__

        # --- closest hit vs brute force
        aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
        got = closest_hit_triangles(dev, rays, aj, bj, cj)
        want = brute_force_closest_hit(rays, aj, bj, cj)
        assert (np.isfinite(np.asarray(got.t)) == np.isfinite(np.asarray(want.t))).all()
        both = np.isfinite(np.asarray(got.t))
        np.testing.assert_allclose(
            np.asarray(got.t)[both], np.asarray(want.t)[both], rtol=1e-5
        )

        # --- nearest_to vs brute force (reference: nearest_to within epsilon)
        pts = jnp.asarray(rng.uniform(-150, 150, size=(8, 3)).astype(np.float32))
        nid, ndist = nearest_to_triangles(dev, pts, aj, bj, cj)
        d2_all = point_triangle_distance_squared(
            pts[:, None, :], aj[None], bj[None], cj[None]
        )
        want_d = np.sqrt(np.asarray(d2_all).min(axis=1))
        np.testing.assert_allclose(np.asarray(ndist), want_d, rtol=1e-4, atol=1e-4)

        # --- mutation: move a subset of cubes, refit, invariants must hold
        k = int(rng.integers(1, n_cubes + 1))
        moved = rng.choice(n_cubes, size=k, replace=False)
        delta = rng.integers(-10, 10, size=(k, 1, 3)).astype(np.float32) * 4.0
        sel = (np.arange(n).reshape(n_cubes, 12)[moved]).ravel()
        a = a.copy(); b = b.copy(); c = c.copy()
        a[sel] += np.repeat(delta, 12, axis=1).reshape(-1, 3)
        b[sel] += np.repeat(delta, 12, axis=1).reshape(-1, 3)
        c[sel] += np.repeat(delta, 12, axis=1).reshape(-1, 3)
        mn2, mx2 = tb.tri_aabbs(a, b, c)
        refitted = update_shapes(dev, jnp.asarray(mn2), jnp.asarray(mx2))
        assert check_consistent(refitted.to_host(), mn2, mx2) == []
        assert check_tight(refitted.to_host()) == []
