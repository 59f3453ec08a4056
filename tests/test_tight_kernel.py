"""Tight-cluster trace kernel: SAH-cut leaves, per-lane pruning (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh.traverse import brute_force_closest_hit
from bvh_tpu.ops.cluster import TIGHT, build_tight_scene, cut_clusters
from bvh_tpu.ops.trace import trace_closest_hit_tight


@pytest.fixture(scope="module")
def cube_scene():
    a, b, c = tb.create_n_cubes(40)  # 480 tris
    scene = build_tight_scene(a, b, c, use_native=False)
    return a, b, c, scene


def test_cut_clusters_partition():
    """Every triangle lands in exactly one cluster; clusters are <= TIGHT."""
    a, b, c = tb.create_n_cubes(25)
    scene = build_tight_scene(a, b, c, use_native=False)
    ids = scene.tri_map[scene.tri_map >= 0]
    assert sorted(ids.tolist()) == list(range(25 * 12))
    # per-cluster occupancy <= TIGHT
    occupied = (scene.tri_map.reshape(-1, TIGHT) >= 0).sum(axis=1)
    assert occupied[: scene.num_clusters].max() <= TIGHT


def test_tight_leaves_are_tight():
    """SAH-cut leaves hug the geometry: unit cubes => ~unit leaf boxes."""
    a, b, c = tb.create_n_cubes(60)
    scene = build_tight_scene(a, b, c, use_native=False)
    nodes = scene.smem_nodes
    leaf = nodes[6] < 0
    ext = (nodes[3:6] - nodes[0:3])[:, leaf]
    assert np.median(ext) <= 2.0  # Morton-128 clusters measured ~4000 here


def test_tight_matches_brute_force(cube_scene):
    a, b, c, scene = cube_scene
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 1024
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(3)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 40.0).astype(np.float32)
    d = (centers[idx] + 0.17 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    got = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj), packet=1024, interpret=True)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    assert both.mean() > 0.9  # aimed rays should nearly all hit
    # Rays grazing a triangle edge may resolve to the adjacent triangle (the
    # MXU bilinear form rounds differently from direct Moller-Trumbore at the
    # u/v boundary — the float-boundary class the reference fuzzer's Grid mode
    # exists to sidestep). Everything must still agree to 0.3% in distance,
    # and >99% of rays must agree exactly on the winning triangle.
    np.testing.assert_allclose(tg[both], tw[both], rtol=3e-3)
    ids_agree = np.asarray(got.shape_id)[both] == np.asarray(want.shape_id)[both]
    assert ids_agree.mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(got.u)[both][ids_agree], np.asarray(want.u)[both][ids_agree], atol=1e-4
    )
    exact = ids_agree
    np.testing.assert_allclose(tg[both][exact], tw[both][exact], rtol=1e-4)


def test_tight_grid_exact():
    """Grid-mode oracle: axis-parallel rays at face centers agree exactly."""
    a, b, c = tb.create_n_cubes(32)
    scene = build_tight_scene(a, b, c, use_native=False)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = len(centers)
    o = centers + np.array([37.0, 0.0, 0.0], np.float32)  # off +x face center
    d = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (n, 1))
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    got = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj), packet=512, interpret=True)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    assert (np.isfinite(np.asarray(got.t)) == np.isfinite(np.asarray(want.t))).all()
    both = np.isfinite(np.asarray(got.t))
    assert (np.asarray(got.shape_id)[both] == np.asarray(want.shape_id)[both]).all()
    np.testing.assert_allclose(np.asarray(got.t)[both], np.asarray(want.t)[both], rtol=1e-6)


def test_tight_miss_and_padding(cube_scene):
    a, b, c, scene = cube_scene
    # 100 rays (pads to one packet), pointing away from the scene: all miss.
    o = np.full((100, 3), 250_000.0, np.float32)
    d = np.tile(np.array([[1.0, 0.5, 0.25]], np.float32), (100, 1))
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    got = trace_closest_hit_tight(scene, rays, packet=1024, interpret=True)
    assert not np.isfinite(np.asarray(got.t)).any()
    assert (np.asarray(got.shape_id) == -1).all()


def test_tight_multi_packet(cube_scene):
    """Results are identical whether rays fit one packet or span several."""
    a, b, c, scene = cube_scene
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 512
    idx = np.resize(np.arange(len(centers)), n)
    o = (centers[idx] + np.array([90.0, 60.0, -70.0], np.float32)).astype(np.float32)
    d = (centers[idx] - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    one = trace_closest_hit_tight(scene, rays, packet=512, interpret=True)
    four = trace_closest_hit_tight(scene, rays, packet=128, interpret=True)
    np.testing.assert_allclose(np.asarray(one.t), np.asarray(four.t), rtol=1e-5)
    assert (np.asarray(one.shape_id) == np.asarray(four.shape_id)).all()


def test_tight_width32_dense_mesh():
    """32-wide clusters (dense-scene mode) agree with brute force."""
    a, b, c = tb.create_dense_mesh(res=24, extent=20.0)  # 1058 tris
    scene = build_tight_scene(a, b, c, leaf_size=32, use_native=False)
    assert scene.width == 32
    # camera above the heightfield looking down
    n = 512
    rng = np.random.default_rng(9)
    ox = rng.uniform(-18, 18, n).astype(np.float32)
    oz = rng.uniform(-18, 18, n).astype(np.float32)
    o = np.stack([ox, np.full(n, 50.0, np.float32), oz], axis=1)
    d = np.tile(np.array([[0.01, -1.0, 0.02]], np.float32), (n, 1))
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    got = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj), packet=512, interpret=True)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    assert both.mean() > 0.95  # downward rays over the field almost all hit
    np.testing.assert_allclose(tg[both], tw[both], rtol=3e-3)
    ids_agree = (np.asarray(got.shape_id)[both] == np.asarray(want.shape_id)[both]).mean()
    assert ids_agree > 0.99


def _aimed_rays(a, n, seed, dist=40.0, tweak=0.21):
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(seed)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * dist).astype(np.float32)
    d = (centers[idx] + tweak - o).astype(np.float32)
    return Ray.create(jnp.asarray(o), jnp.asarray(d))


def test_any_hit_matches_closest(cube_scene):
    """Occlusion query: exactly the rays whose closest hit is inside t_max.

    The reference for occlusion is the kernel's own closest-hit (identical
    narrowphase numerics — this isolates the any-mode logic); the brute-force
    oracle check is statistical, excluding only the documented grazing-edge
    float-boundary class.
    """
    from bvh_tpu.ops.trace import trace_any_hit_tight

    a, b, c, scene = cube_scene
    n = 1024
    rays = _aimed_rays(a, n, seed=5)
    closest = trace_closest_hit_tight(scene, rays, packet=512, interpret=True)
    ct = np.asarray(closest.t)

    got = trace_any_hit_tight(scene, rays, packet=512, interpret=True)
    assert (np.asarray(got) == np.isfinite(ct)).all()

    # statistical agreement with the brute-force oracle (grazing edges may
    # round differently in the bilinear form — same tolerance as closest-hit)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    wt = np.asarray(brute_force_closest_hit(rays, aj, bj, cj).t)
    assert (np.asarray(got) == np.isfinite(wt)).mean() > 0.995

    # per-ray t_max: occluded iff the closest hit is strictly inside the bound
    rng = np.random.default_rng(6)
    tm = np.where(np.isfinite(ct), ct, 40.0).astype(np.float32)
    scalefac = rng.choice([0.5, 2.0], size=n).astype(np.float32)
    tm = tm * scalefac
    got_tm = trace_any_hit_tight(scene, rays, t_max=jnp.asarray(tm), packet=512, interpret=True)
    want_tm = np.isfinite(ct) & (ct < tm)
    assert (np.asarray(got_tm) == want_tm).all()


def test_any_hit_grid_exact():
    """Grid-mode oracle: axis-parallel occlusion queries agree exactly."""
    from bvh_tpu.ops.trace import trace_any_hit_tight

    a, b, c = tb.create_n_cubes(32)
    scene = build_tight_scene(a, b, c, use_native=False)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = len(centers)
    o = centers + np.array([37.0, 0.0, 0.0], np.float32)
    d = np.tile(np.array([[-1.0, 0.0, 0.0]], np.float32), (n, 1))
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    wt = np.asarray(brute_force_closest_hit(rays, aj, bj, cj).t)
    got = np.asarray(trace_any_hit_tight(scene, rays, packet=512, interpret=True))
    assert (got == np.isfinite(wt)).all()
    # t_max halfway to the cube: nothing occludes; t_max past it: all hits do
    before = np.asarray(trace_any_hit_tight(
        scene, rays, t_max=jnp.full((n,), 18.0), packet=512, interpret=True))
    assert not before.any()
    after = np.asarray(trace_any_hit_tight(
        scene, rays, t_max=jnp.full((n,), 37.5), packet=512, interpret=True))
    assert (after == np.isfinite(wt)).all()


def test_closest_hit_t_max(cube_scene):
    """t_max on the closest-hit path: in-range hits unchanged, rest are misses."""
    a, b, c, scene = cube_scene
    n = 512
    rays = _aimed_rays(a, n, seed=8)
    full = trace_closest_hit_tight(scene, rays, packet=512, interpret=True)
    ft = np.asarray(full.t)
    tm = np.full(n, np.median(ft[np.isfinite(ft)]), np.float32)
    capped = trace_closest_hit_tight(
        scene, rays, packet=512, interpret=True, t_max=jnp.asarray(tm)
    )
    ct = np.asarray(capped.t)
    inside = np.isfinite(ft) & (ft < tm)
    np.testing.assert_allclose(ct[inside], ft[inside], rtol=1e-6)
    assert (np.asarray(capped.shape_id)[inside] == np.asarray(full.shape_id)[inside]).all()
    assert not np.isfinite(ct[~inside]).any()
    assert (np.asarray(capped.shape_id)[~inside] == -1).all()


def test_seeded_matches_plain(cube_scene):
    """Hint seeding only tightens pruning bounds: results identical."""
    from bvh_tpu.ops.trace import trace_closest_hit_seeded

    a, b, c, scene = cube_scene
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 1024
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(12)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 30.0).astype(np.float32)
    d = (centers[idx] + 0.29 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    plain = trace_closest_hit_tight(scene, rays, packet=512, interpret=True)
    seeded = trace_closest_hit_seeded(
        scene, rays, packet=512, sample_stride=32, k_hints=8, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(plain.t), np.asarray(seeded.t), rtol=1e-6, equal_nan=True
    )
    assert (np.asarray(plain.shape_id) == np.asarray(seeded.shape_id)).all()


@pytest.mark.parametrize("leaf", [16, 32])
def test_bmat_path_matches_default(leaf):
    """Precomputed bilinear forms (bmat=True, opt-in) must trace identically
    to the in-kernel construction — same tree, same winners, same t."""
    a, b, c = tb.create_n_cubes(30)
    sc_def = build_tight_scene(a, b, c, leaf_size=leaf, use_native=False, bmat=False)
    sc_bm = build_tight_scene(a, b, c, leaf_size=leaf, use_native=False, bmat=True)
    assert sc_bm.bgroups is not None and sc_def.bgroups is None
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 512
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(5)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 30.0).astype(np.float32)
    d = (centers[idx] + 0.19 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    got = trace_closest_hit_tight(sc_bm, rays, packet=128, interpret=True)
    want = trace_closest_hit_tight(sc_def, rays, packet=128, interpret=True)
    assert (np.asarray(got.shape_id) == np.asarray(want.shape_id)).all()
    # t agrees to float rounding (bmat entries are f64-derived)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    both = np.isfinite(tg) & np.isfinite(tw)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    np.testing.assert_allclose(tg[both], tw[both], rtol=1e-5)


def test_device_seeder_matches_host():
    """make_seeder (jittable, on-device) must reproduce compute_seed_hints
    (host numpy) exactly — same packets, same hint sets, same order."""
    from bvh_tpu.ops.trace import compute_seed_hints, make_seeder

    a, b, c = tb.create_n_cubes(60)
    scene = build_tight_scene(a, b, c, use_native=False)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 2048
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(1)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 40).astype(np.float32)
    d = (centers[idx] + 0.12 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    h_np = compute_seed_hints(scene, rays, packet=512, sample_stride=32,
                              k_hints=16, interpret=True)
    h_dev = make_seeder(scene, packet=512, sample_stride=32, k_hints=16,
                        interpret=True)(rays)
    np.testing.assert_array_equal(np.asarray(h_np), np.asarray(h_dev))


def test_packed_node_table_traces_correctly():
    """bf16-pair node tables (packed=True): conservative boxes, exact hit
    results vs the f32-table path and the brute-force oracle."""
    from bvh_tpu.bvh.traverse import brute_force_closest_hit

    a, b, c = tb.create_n_cubes(50)
    s32 = build_tight_scene(a, b, c, use_native=False)
    sp = build_tight_scene(a, b, c, use_native=False, packed=True)
    assert sp.packed_nodes is not None and sp.packed_nodes.shape[0] == 5
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 1024
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(7)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 40.0).astype(np.float32)
    d = (centers[idx] + 0.15 - o).astype(np.float32)
    flip = rng.random(n) < 0.3
    d[flip] = offs[flip]
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    got = trace_closest_hit_tight(sp, rays, packet=128, interpret=True)
    want = brute_force_closest_hit(rays, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    # grazing-edge class, slightly widened by the bf16 cluster-frame shift
    np.testing.assert_allclose(tg[both], tw[both], rtol=5e-3)
    assert (np.abs(tg[both] / tw[both] - 1) < 3e-3).mean() > 0.97
    # sweep-gated packed path agrees exactly with plain packed
    got2 = trace_closest_hit_tight(sp, rays, packet=128, interpret=True, sweep=True)
    np.testing.assert_array_equal(np.asarray(got2.t), tg)
    # where the winner agrees with the f32-table path, t matches closely
    ref = trace_closest_hit_tight(s32, rays, packet=128, interpret=True)
    same = np.asarray(ref.shape_id) == np.asarray(got.shape_id)
    assert same.mean() > 0.9
    np.testing.assert_allclose(tg[both & same], np.asarray(ref.t)[both & same],
                               rtol=2e-4)


def test_seeded_bmat_scene_hint_format():
    """Regression: bmat scenes trace through the entry/exit kernel, so the
    seeder must emit node-table ids there, NOT wide slot ids (the scene
    still carries gnodes). Wrong-format hints read out-of-range cursors."""
    from bvh_tpu.ops.trace import (make_seeder, trace_closest_hit_seeded,
                                   trace_closest_hit_tight)

    a, b, c = tb.create_n_cubes(60)
    scene = build_tight_scene(a, b, c, bmat=True, use_native=False)
    assert scene.gnodes is not None and scene.bgroups is not None
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 1024
    rng = np.random.default_rng(4)
    idx = rng.integers(0, len(centers), n)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 40).astype(np.float32)
    d = (centers[idx] + 0.15 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))

    plain = trace_closest_hit_tight(scene, rays, packet=1024, interpret=True)
    seeded = trace_closest_hit_seeded(scene, rays, packet=1024,
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(plain.t), np.asarray(seeded.t))
    np.testing.assert_array_equal(np.asarray(plain.shape_id),
                                  np.asarray(seeded.shape_id))
    hints = make_seeder(scene, packet=1024, interpret=True)(rays)
    assert int(np.asarray(hints).max()) < scene.smem_nodes.shape[1]
    # explicit wide= override with hints is rejected (format mismatch)
    wide_scene = build_tight_scene(a, b, c, use_native=False)
    h2 = make_seeder(wide_scene, packet=1024, interpret=True)(rays)
    with pytest.raises(AssertionError):
        trace_closest_hit_tight(wide_scene, rays, packet=1024, interpret=True,
                                hints=h2, wide=False)
