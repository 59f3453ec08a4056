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


def _chaos_scene(rng, n_cubes):
    """Arbitrary-float geometry (the fuzzer's Chaos mode): log-uniform cube
    scales (0.05 .. 2e3), random rotations, centers anywhere in the
    reference's ±1e5 bounds. No exact-agreement guarantee — the chaos test
    gates its assertions by tolerance classes instead (reference mode
    split: fuzz/fuzz_targets/fuzz.rs:253-268, mode-gated checks 440-462)."""
    centers = rng.uniform(-1e5, 1e5, size=(n_cubes, 3)).astype(np.float32)
    scales = np.exp(rng.uniform(np.log(0.05), np.log(2e3),
                                size=(n_cubes, 1, 1, 1))).astype(np.float32)
    q, _ = np.linalg.qr(rng.normal(size=(n_cubes, 3, 3)))
    tris = np.einsum("nij,ntvj->ntvi", q.astype(np.float32),
                     tb._CUBE_TRIS[None] * scales)
    tris = (tris + centers[:, None, None, :]).reshape(-1, 3, 3)
    tris = tris.astype(np.float32)
    return tris[:, 0, :], tris[:, 1, :], tris[:, 2, :]


def _mt_hits(o, d, a, b, c, eps):
    """Möller–Trumbore hit mask [R, T] with barycentric boundary slack
    ``eps`` (negative shrinks the acceptance region, positive relaxes it) —
    the instrument the chaos fuzzer uses to decide whether a mask
    disagreement is in the grazing class. Pure numpy float64 so the
    tolerance probe itself has ~no rounding of its own."""
    o = o.astype(np.float64)[:, None, :]
    d = d.astype(np.float64)[:, None, :]
    a = a.astype(np.float64)[None]
    e1 = b.astype(np.float64)[None] - a
    e2 = c.astype(np.float64)[None] - a
    p = np.cross(d, e2)
    det = np.sum(p * e1, axis=-1)
    safe = np.abs(det) > 1e-300
    inv = np.where(safe, 1.0 / np.where(safe, det, 1.0), 0.0)
    tv = o - a
    u = np.sum(tv * p, axis=-1) * inv
    q = np.cross(tv, e1)
    v = np.sum(d * q, axis=-1) * inv
    t = np.sum(e2 * q, axis=-1) * inv
    # scale-aware slack on the t >= 0 boundary (t is in world units)
    t_eps = np.abs(eps) * (1.0 + np.abs(t))
    t_ok = t >= (-t_eps if eps > 0 else t_eps)
    return (safe & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps) & t_ok)


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


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_fuzz_chaos_workload(seed):
    """Chaos-mode differential fuzzing: arbitrary float coordinates through
    the same build→invariants→traversals→closest-hit→nearest→mutate loop,
    with TOLERANCE-GATED assertions (the reference fuzzer's Chaos mode,
    fuzz/fuzz_targets/fuzz.rs:253-268: exact cross-variant agreement is only
    asserted in Grid mode; chaos iterations still assert invariants and
    epsilon-gated nearest distances, :440-462 and fuzz_nearest_to).

    Tolerance classes (each one a documented deviation class of this repo,
    PARITY.md "Known deviations"):
    * Aabb/Point queries: EXACT even in chaos — box-overlap and containment
      tests are pure comparisons, exactly monotone under the (exact)
      min/max box union, so pruning can never drop a true leaf hit.
    * Ray/Ball queries: got ⊆ want exactly (traversal re-tests each leaf
      box with the same arithmetic brute force uses); any leaf in
      want − got must be a GRAZING hit — shrinking the leaf box by a
      scale-aware epsilon must turn it into a miss.
    * Closest-hit masks: disagreements must be in the barycentric grazing
      class (strict/relaxed Möller–Trumbore probe, _mt_hits); agreeing
      rays' t within rel 1e-3 (the documented bilinear-vs-MT class).
    * Nearest: distance within rel 1e-3 + scale-aware atol of brute force
      (the reference gates at abs 0.001 on unit-ish scenes).
    """
    from bvh_tpu import Aabb, Ball
    from bvh_tpu.ops import build_tight_scene, check_tight_scene
    from bvh_tpu.ops.trace import trace_closest_hit_tight
    from bvh_tpu.ray import ray_intersects_aabb

    rng = np.random.default_rng(seed)
    n_cubes = int(rng.integers(2, 24))
    a, b, c = _chaos_scene(rng, n_cubes)
    n = a.shape[0]

    for round_i in range(3):
        mn, mx = tb.tri_aabbs(a, b, c)
        mnj, mxj = jnp.asarray(mn), jnp.asarray(mx)
        extent = float(np.max(mx) - np.min(mn))
        # grazing window: a few ulps at coordinate scale, per box
        box_eps = 1e-4 * (np.abs(mn) + np.abs(mx) + 1.0)

        # --- builds + invariants: asserted in BOTH reference modes
        flat, s2n = build_sah(mn, mx)
        assert check_consistent(flat, mn, mx) == []
        assert check_tight(flat) == []
        flat_native, _ = build_sah_auto(mn, mx)
        assert check_consistent(flat_native, mn, mx) == []
        assert check_tight(flat_native) == []
        lb, _ = build_lbvh(mnj, mxj)
        assert check_consistent(lb.to_host(), mn, mx) == []
        assert check_tight(lb.to_host()) == []
        scene = build_tight_scene(a, b, c, use_native=False)
        # packed-row reconstruction rounds with the cluster frame shift:
        # scale the geometric atol to the scene's coordinate magnitude
        assert check_tight_scene(scene, a, b, c,
                                 atol=max(0.1, 1e-5 * extent)) == []

        dev = flat.to_device()

        # --- query workload: chaos rays/points/aabbs/balls
        o = rng.uniform(-2e5, 2e5, size=(8, 3)).astype(np.float32)
        d = rng.normal(size=(8, 3)).astype(np.float32)
        rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
        qa = Aabb(jnp.asarray(o - rng.uniform(1.0, 5e4)),
                  jnp.asarray(o + rng.uniform(1.0, 5e4)))
        queries = [
            RayQuery(rays),
            AabbQuery(qa),
            PointQuery(jnp.asarray(o * rng.uniform(0.01, 0.9))),
            BallQuery(Ball(jnp.asarray(o * 0.3),
                           jnp.full((8,), rng.uniform(10.0, 5e4), jnp.float32))),
        ]
        exact = {1, 2}  # AabbQuery, PointQuery — comparison-only tests
        for qi, q in enumerate(queries):
            hits, count = traverse(dev, q, max_hits=max(n, 8))
            want_mask = np.asarray(brute_force_collect(q, mnj, mxj))
            got_sets = [
                set(int(s) for s in row[row >= 0]) for row in np.asarray(hits)
            ]
            want_sets = [set(np.nonzero(row)[0].tolist()) for row in want_mask]
            if qi in exact:
                assert got_sets == want_sets, type(q).__name__
                continue
            for r, (gs, ws) in enumerate(zip(got_sets, want_sets)):
                # pruning can only DROP; the leaf test itself is shared
                assert gs <= ws, (type(q).__name__, r, gs - ws)
                for miss in ws - gs:
                    # dropped leaves must be grazing: the shrunk box misses
                    smn = mn[miss] + box_eps[miss]
                    smx = mx[miss] - box_eps[miss]
                    if qi == 0:
                        rr = Ray(rays.origin[r:r + 1], rays.direction[r:r + 1],
                                 rays.inv_direction[r:r + 1])
                        still = bool(np.asarray(ray_intersects_aabb(
                            rr, jnp.asarray(smn[None]), jnp.asarray(smx[None])))[0])
                    else:  # Ball: same intersects_aabb arithmetic, one row
                        bq = Ball(q.ball.center[r:r + 1], q.ball.radius[r:r + 1])
                        still = bool(np.asarray(bq.intersects_aabb(
                            jnp.asarray(smn[None]), jnp.asarray(smx[None])))[0])
                    assert not still, (
                        type(q).__name__, r, miss, "non-grazing leaf dropped")

        # --- closest hit: pure-JAX path AND the Pallas kernel (interpret)
        aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
        o64, d64 = np.asarray(rays.origin), np.asarray(rays.direction)
        strict = _mt_hits(o64, d64, a, b, c, -1e-3).any(axis=1)
        relaxed = _mt_hits(o64, d64, a, b, c, +1e-3).any(axis=1)
        want = brute_force_closest_hit(rays, aj, bj, cj)
        tw = np.asarray(want.t)
        for label, got_t in (
            ("pure", np.asarray(closest_hit_triangles(dev, rays, aj, bj, cj).t)),
            ("kernel", np.asarray(trace_closest_hit_tight(
                scene, rays, packet=128, interpret=True).t)),
        ):
            hit_g, hit_w = np.isfinite(got_t), np.isfinite(tw)
            for r in np.nonzero(hit_g != hit_w)[0]:
                if hit_w[r]:  # path missed a brute hit: must be grazing-only
                    assert not strict[r], (label, r, "solid hit dropped")
                else:  # path hit where brute missed: relaxed MT must accept
                    assert relaxed[r], (label, r, "hit with no near-triangle")
            both = hit_g & hit_w
            np.testing.assert_allclose(got_t[both], tw[both], rtol=1e-3,
                                       err_msg=label)

        # --- nearest vs brute force, epsilon-gated (fuzz_nearest_to)
        pts = jnp.asarray(rng.uniform(-1e5, 1e5, size=(8, 3)).astype(np.float32))
        nid, ndist = nearest_to_triangles(dev, pts, aj, bj, cj)
        d2_all = point_triangle_distance_squared(
            pts[:, None, :], aj[None], bj[None], cj[None]
        )
        want_d = np.sqrt(np.asarray(d2_all).min(axis=1))
        np.testing.assert_allclose(np.asarray(ndist), want_d, rtol=1e-3,
                                   atol=1e-5 * extent)

        # --- mutation: arbitrary float moves, refit, invariants (exact)
        k = int(rng.integers(1, n_cubes + 1))
        moved = rng.choice(n_cubes, size=k, replace=False)
        delta = rng.uniform(-3e4, 3e4, size=(k, 1, 3)).astype(np.float32)
        sel = (np.arange(n).reshape(n_cubes, 12)[moved]).ravel()
        a = a.copy(); b = b.copy(); c = c.copy()
        a[sel] += np.repeat(delta, 12, axis=1).reshape(-1, 3)
        b[sel] += np.repeat(delta, 12, axis=1).reshape(-1, 3)
        c[sel] += np.repeat(delta, 12, axis=1).reshape(-1, 3)
        mn2, mx2 = tb.tri_aabbs(a, b, c)
        refitted = update_shapes(dev, jnp.asarray(mn2), jnp.asarray(mx2))
        assert check_consistent(refitted.to_host(), mn2, mx2) == []
        assert check_tight(refitted.to_host()) == []


@pytest.mark.parametrize("seed", [20, 21])
def test_fuzz_chaos_add_remove(seed):
    """Chaos-mode Add/Remove mutations through the host tree — the
    reference fuzzer's ArbitraryMutation loop (fuzz.rs:246-250, applied
    :556-580): push a new arbitrary-float shape / remove a random one,
    re-assert invariants, and spot-check a traversal after each step."""
    from bvh_tpu.bvh.tree import Bvh

    rng = np.random.default_rng(seed)
    n0 = int(rng.integers(2, 10))
    a, b, c = _chaos_scene(rng, n0)
    mn, mx = tb.tri_aabbs(a, b, c)
    # one shape per cube (12-triangle groups move together in this fuzz):
    # collapse to per-cube boxes so add/remove mutate whole shapes
    mn = mn.reshape(n0, 12, 3).min(axis=1)
    mx = mx.reshape(n0, 12, 3).max(axis=1)
    tree = Bvh(mn, mx)
    alive = set(range(n0))

    for step in range(8):
        if len(alive) > 1 and rng.random() < 0.4:
            idx = int(rng.choice(sorted(alive)))
            tree.remove_shape(idx)
            alive.discard(idx)
        else:
            na, nb, nc = _chaos_scene(rng, 1)
            nmn, nmx = tb.tri_aabbs(na, nb, nc)
            nmn, nmx = nmn.min(axis=0), nmx.max(axis=0)
            new_idx = tree.shape_min.shape[0]
            tree.shape_min = np.concatenate([tree.shape_min, nmn[None]])
            tree.shape_max = np.concatenate([tree.shape_max, nmx[None]])
            tree.add_shape(new_idx)
            alive.add(new_idx)
        tree.assert_consistent()
        tree.assert_tight()

        # spot-check: point containment traversal is exact in any mode
        ref = sorted(alive)[int(rng.integers(0, len(alive)))]
        pt = tree.shape_min[ref] * 0.5 + tree.shape_max[ref] * 0.5
        q = PointQuery(jnp.asarray(pt[None].astype(np.float32)))
        flat, _ = tree.flatten()
        hits, _ = traverse(flat.to_device(), q, max_hits=max(len(alive), 8))
        got = set(int(s) for s in np.asarray(hits)[0] if s >= 0)
        inside = {
            i for i in alive
            if ((tree.shape_min[i] <= pt) & (pt <= tree.shape_max[i])).all()
        }
        assert got == inside
