"""Fused sort-into-pack (perm=): bit-identity with pre-sorted rays.

The perm path folds the coherence-sort permutation into per-field gathers
that write the slab/lmat kernel layouts directly (no XLA transposes); the
contract is bit-identical outputs to sorting the rays first. Interpret mode.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_chained_scene, build_tight_scene
from bvh_tpu.ops.trace import (
    _pack_rays_tight,
    sort_rays_device,
    trace_any_hit_chained,
    trace_any_hit_tight,
    trace_closest_hit_chained,
    trace_closest_hit_tight,
)


@pytest.fixture(scope="module")
def scene_and_rays():
    a, b, c = tb.create_n_cubes(40)  # 480 tris
    scene = build_tight_scene(a, b, c, use_native=False)
    seed = tb.seed_state_after(40)
    o, d = tb.create_rays(1500, seed=seed)  # deliberately not a packet multiple
    perm, inv = sort_rays_device(jnp.asarray(o), jnp.asarray(d), bits=2)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    rays_sorted = Ray.create(jnp.asarray(o)[perm], jnp.asarray(d)[perm])
    return a, b, c, scene, rays, rays_sorted, perm, inv


def test_pack_bit_identical(scene_and_rays):
    _, _, _, _, rays, rays_sorted, perm, _ = scene_and_rays
    p0, rp0, slab0, lmat0 = _pack_rays_tight(rays_sorted, 1024, None)
    p1, rp1, slab1, lmat1 = _pack_rays_tight(rays, 1024, None, perm=perm)
    assert (p0, rp0) == (p1, rp1)
    np.testing.assert_array_equal(np.asarray(slab0), np.asarray(slab1))
    np.testing.assert_array_equal(np.asarray(lmat0), np.asarray(lmat1))


def test_pack_bit_identical_per_ray_tmax(scene_and_rays):
    _, _, _, _, rays, rays_sorted, perm, _ = scene_and_rays
    tm = np.linspace(5.0, 400.0, rays.origin.shape[0]).astype(np.float32)
    tmj = jnp.asarray(tm)
    _, _, slab0, _ = _pack_rays_tight(rays_sorted, 1024, tmj[perm])
    _, _, slab1, _ = _pack_rays_tight(rays, 1024, tmj, perm=perm)
    np.testing.assert_array_equal(np.asarray(slab0), np.asarray(slab1))


def test_closest_hit_perm_matches_presorted(scene_and_rays):
    a, b, c, scene, rays, rays_sorted, perm, inv = scene_and_rays
    want = trace_closest_hit_tight(scene, rays_sorted, packet=1024,
                                   interpret=True)
    got = trace_closest_hit_tight(scene, rays, packet=1024, interpret=True,
                                  perm=perm)
    np.testing.assert_array_equal(np.asarray(want.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(want.shape_id),
                                  np.asarray(got.shape_id))
    # and un-permuting recovers original ray order
    t_orig = np.asarray(got.t)[np.asarray(inv)]
    direct = trace_closest_hit_tight(scene, rays, packet=1024, interpret=True)
    np.testing.assert_array_equal(t_orig, np.asarray(direct.t))


def test_closest_hit_perm_sweep_and_tris(scene_and_rays):
    a, b, c, scene, rays, rays_sorted, perm, _ = scene_and_rays
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    want = trace_closest_hit_tight(scene, rays_sorted, tris=(aj, bj, cj),
                                   packet=1024, interpret=True, sweep=True)
    got = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj),
                                  packet=1024, interpret=True, sweep=True,
                                  perm=perm)
    for f in ("t", "u", "v", "shape_id"):
        np.testing.assert_array_equal(np.asarray(getattr(want, f)),
                                      np.asarray(getattr(got, f)), err_msg=f)


def test_any_hit_perm_matches_presorted(scene_and_rays):
    _, _, _, scene, rays, rays_sorted, perm, _ = scene_and_rays
    tm = np.full((rays.origin.shape[0],), 150.0, np.float32)
    tmj = jnp.asarray(tm)
    want = trace_any_hit_tight(scene, rays_sorted, t_max=tmj[perm],
                               packet=1024, interpret=True)
    got = trace_any_hit_tight(scene, rays, t_max=tmj, packet=1024,
                              interpret=True, perm=perm)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_chained_perm_matches_presorted():
    a, b, c = tb.create_n_cubes(120)  # 1440 tris across parts
    chained = build_chained_scene(a, b, c, max_part=500, use_native=False)
    seed = tb.seed_state_after(120)
    o, d = tb.create_rays(1200, seed=seed)
    perm, inv = sort_rays_device(jnp.asarray(o), jnp.asarray(d), bits=2)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    rays_sorted = Ray.create(jnp.asarray(o)[perm], jnp.asarray(d)[perm])

    want = trace_closest_hit_chained(chained, rays_sorted, packet=1024,
                                     interpret=True)
    got = trace_closest_hit_chained(chained, rays, packet=1024,
                                    interpret=True, perm=perm)
    np.testing.assert_array_equal(np.asarray(want.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(want.shape_id),
                                  np.asarray(got.shape_id))

    occ_w = trace_any_hit_chained(chained, rays_sorted, t_max=200.0,
                                  packet=1024, interpret=True)
    occ_g = trace_any_hit_chained(chained, rays, t_max=200.0, packet=1024,
                                  interpret=True, perm=perm)
    np.testing.assert_array_equal(np.asarray(occ_w), np.asarray(occ_g))


def test_morton_sort_mode(scene_and_rays):
    """mode="morton": valid permutation, spatially interleaved key (cells,
    not x-slabs), and identical trace results through the perm path."""
    a, b, c, scene, rays, _, _, _ = scene_and_rays
    o, d = rays.origin, rays.direction
    perm, inv = sort_rays_device(o, d, mode="morton")
    pn, invn = np.asarray(perm), np.asarray(inv)
    n = len(pn)
    assert sorted(pn) == list(range(n))
    assert (pn[invn] == np.arange(n)).all()
    want = trace_closest_hit_tight(scene, rays, packet=1024, interpret=True)
    got = trace_closest_hit_tight(scene, rays, packet=1024, interpret=True,
                                  perm=perm)
    np.testing.assert_array_equal(np.asarray(want.t),
                                  np.asarray(got.t[inv]))
    np.testing.assert_array_equal(np.asarray(want.shape_id),
                                  np.asarray(got.shape_id[inv]))
    # morton cells: consecutive sorted origins are near each other far more
    # often than under an x-major lexicographic slab key
    os_ = np.asarray(o)[pn]
    step = np.linalg.norm(np.diff(os_, axis=0), axis=1)
    ext = np.linalg.norm(np.asarray(o).max(0) - np.asarray(o).min(0))
    assert np.median(step) < 0.25 * ext
