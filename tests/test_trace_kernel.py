"""Pallas packet-trace kernel: correctness vs brute force (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops import build_cluster_scene
from bvh_tpu.ops.trace import sort_rays, trace_closest_hit
from bvh_tpu.bvh.traverse import brute_force_closest_hit


@pytest.fixture(scope="module")
def scene_and_rays():
    a, b, c = tb.create_n_cubes(30)  # 360 tris, 3 clusters
    scene = build_cluster_scene(a, b, c)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    idx = np.resize(np.arange(30), 2048)
    orig = (centers[idx] + np.array([800.0, 400.0, -600.0], np.float32)).astype(np.float32)
    aim = centers[idx] + np.array([0.11, 0.07, -0.13], np.float32)
    rays = Ray.create(jnp.asarray(orig), jnp.asarray((aim - orig).astype(np.float32)))
    return a, b, c, scene, rays


def test_trace_matches_brute_force(scene_and_rays):
    a, b, c, scene, rays = scene_and_rays
    got = trace_closest_hit(
        scene, rays, tris=(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)), interpret=True
    )
    want = brute_force_closest_hit(rays, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    np.testing.assert_allclose(tg[both], tw[both], rtol=1e-4)
    assert (np.asarray(got.shape_id)[both] == np.asarray(want.shape_id)[both]).all()
    # u, v recomputed exactly on the winning triangle
    np.testing.assert_allclose(np.asarray(got.u)[both], np.asarray(want.u)[both], atol=1e-4)


def test_trace_miss_rays(scene_and_rays):
    a, b, c, scene, _ = scene_and_rays
    rays = Ray.create(
        jnp.asarray(np.full((64, 3), 500000.0, np.float32)),
        jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (64, 1)).astype(np.float32)),
    )
    got = trace_closest_hit(scene, rays, interpret=True)
    assert np.all(~np.isfinite(np.asarray(got.t)))
    assert np.all(np.asarray(got.shape_id) == -1)


def test_trace_nonmultiple_packet(scene_and_rays):
    """Ray counts that aren't a packet multiple are padded internally."""
    a, b, c, scene, rays = scene_and_rays
    sub = Ray(*(x[:1000] for x in rays))
    got = trace_closest_hit(scene, sub, interpret=True)
    full = trace_closest_hit(scene, rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(full.t)[:1000])


def test_sort_rays_roundtrip():
    rng = np.random.default_rng(0)
    o = rng.normal(size=(500, 3)).astype(np.float32)
    d = rng.normal(size=(500, 3)).astype(np.float32)
    perm, inv = sort_rays(o, d)
    assert np.array_equal(perm[inv], np.arange(500))
    assert np.array_equal(np.sort(perm), np.arange(500))
