"""Kernel-speed ordered traversal: K closest hits by depth peeling.

Oracle: full Moller-Trumbore of every ray against every triangle, hits
sorted ascending; the peel must reproduce the first K (front-facing)
hits within the documented eps-merge class. Re-designs the consumption
pattern of /root/reference/src/bvh/distance_traverse.rs:100-133.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops import (build_chained_scene, build_tight_scene,
                         trace_k_closest, trace_k_closest_chained)
from bvh_tpu.ray import Ray as R
from bvh_tpu.ray import ray_intersects_triangle


def _oracle_all_hits(rays, a, b, c):
    """[R, n] ascending hit distances (inf-padded) and matching ids."""
    inter = ray_intersects_triangle(
        R(jnp.asarray(rays.origin)[:, None, :],
          jnp.asarray(rays.direction)[:, None, :],
          1.0 / jnp.asarray(rays.direction)[:, None, :]),
        jnp.asarray(a)[None], jnp.asarray(b)[None], jnp.asarray(c)[None])
    t = np.asarray(inter.distance)
    order = np.argsort(t, axis=1)
    return np.take_along_axis(t, order, axis=1), order


@pytest.fixture(scope="module")
def stacked_scene():
    """Cubes stacked along +z so straight rays cross several of them."""
    rng = np.random.default_rng(71)
    a, b, c = tb.create_n_cubes(60)
    a, b, c = np.asarray(a).copy(), np.asarray(b).copy(), np.asarray(c).copy()
    # re-place cube i at z = 8*i on a small xy jitter: guaranteed stacking
    for i in range(60):
        sl = slice(12 * i, 12 * (i + 1))
        ctr = (a[sl] + b[sl] + c[sl]).mean(axis=0) / 3.0
        new = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                        8.0 * i], np.float32)
        for arr in (a, b, c):
            arr[sl] += new - ctr
    scene = build_tight_scene(a, b, c)
    n = 256
    o = np.concatenate([rng.uniform(-1, 1, (n, 2)), np.full((n, 1), -30.0)],
                       axis=1).astype(np.float32)
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = 1.0
    d[:, :2] = rng.normal(scale=0.01, size=(n, 2))
    return a, b, c, scene, Ray.create(o, d)


def test_k_closest_matches_oracle(stacked_scene):
    a, b, c, scene, rays = stacked_scene
    k = 5
    t, sid, count = trace_k_closest(scene, rays, k=k, interpret=True,
                                    tris=(jnp.asarray(a), jnp.asarray(b),
                                          jnp.asarray(c)))
    t, sid, count = np.asarray(t), np.asarray(sid), np.asarray(count)
    bt, bid = _oracle_all_hits(rays, a, b, c)
    assert (count > 1).any()  # the workload does cross multiple surfaces
    for i in range(rays.origin.shape[0]):
        finite = bt[i][np.isfinite(bt[i])]
        # drop oracle hits inside the eps-merge window of their predecessor
        keep = []
        for tv in finite:
            if not keep or tv > keep[-1] * (1 + 2e-4) + 2e-6:
                keep.append(tv)
        want = np.asarray(keep[:k], np.float32)
        got = t[i][np.isfinite(t[i])]
        assert len(got) >= min(len(want), k) - 1, (i, got, want)
        m = min(len(got), len(want))
        if m:
            np.testing.assert_allclose(got[:m], want[:m], rtol=5e-3,
                                       err_msg=str(i))
    # ascending order invariant
    fin = np.isfinite(t)
    for i in range(t.shape[0]):
        row = t[i][fin[i]]
        assert (np.diff(row) > 0).all(), i


def test_k_closest_ids_are_real_hits(stacked_scene):
    a, b, c, scene, rays = stacked_scene
    t, sid, count = trace_k_closest(scene, rays, k=3, interpret=True)
    t, sid = np.asarray(t), np.asarray(sid)
    fin = np.isfinite(t)
    assert ((sid >= 0) == fin).all()
    # each reported id must intersect at ~the reported distance
    bt, _ = _oracle_all_hits(rays, a, b, c)
    inter = ray_intersects_triangle(
        R(jnp.asarray(rays.origin)[:, None, :],
          jnp.asarray(rays.direction)[:, None, :],
          1.0 / jnp.asarray(rays.direction)[:, None, :]),
        jnp.asarray(a)[None], jnp.asarray(b)[None], jnp.asarray(c)[None])
    tall = np.asarray(inter.distance)
    ii, kk = np.nonzero(fin)
    np.testing.assert_allclose(tall[ii, sid[ii, kk]], t[ii, kk], rtol=5e-3)


def test_k_closest_chained(stacked_scene):
    a, b, c, scene, rays = stacked_scene
    ch = build_chained_scene(a, b, c, max_part=300)
    assert len(ch.parts) >= 2
    t1, s1, c1 = trace_k_closest(scene, rays, k=3, interpret=True)
    t2, s2, c2 = trace_k_closest_chained(ch, rays, k=3, interpret=True)
    t1, t2 = np.asarray(t1), np.asarray(t2)
    m = np.isfinite(t1) & np.isfinite(t2)
    assert (np.isfinite(t1) == np.isfinite(t2)).mean() > 0.99
    np.testing.assert_allclose(t1[m], t2[m], rtol=1e-2)


def test_k_closest_misses():
    a, b, c = tb.create_n_cubes(10)
    scene = build_tight_scene(np.asarray(a), np.asarray(b), np.asarray(c))
    o = np.full((64, 3), 5e4, np.float32)
    d = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (64, 1))
    t, sid, count = trace_k_closest(scene, Ray.create(o, d), k=3,
                                    interpret=True)
    assert (count == 0).all() if not np.isfinite(np.asarray(t)).any() else True
    assert (np.asarray(sid)[np.asarray(count) == 0] == -1).all()
