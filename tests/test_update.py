"""Quality-preserving incremental update (mask+delta, ``ops/update.py``).

The contract re-designed from the reference's ``Bvh::update_shapes``
(/root/reference/src/bvh/optimization.rs:304-315): after any churn, the
updated acceleration structure must return exactly the hits of a fresh
build over the new geometry. Here the static part keeps its original
boxes (conservative after removal) and the moved set lives in a
device-built delta part, traced chained.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops import build_tight_scene, make_updater
from bvh_tpu.ops.trace import (trace_any_hit_chained,
                               trace_closest_hit_chained,
                               trace_closest_hit_tight)
from bvh_tpu.ray import ray_intersects_triangle


def _oracle_closest(rays, a, b, c):
    # broadcast each ray against every triangle
    o = jnp.asarray(rays.origin)[:, None, :]
    d = jnp.asarray(rays.direction)[:, None, :]
    from bvh_tpu.ray import Ray as R
    inter = ray_intersects_triangle(
        R(o, d, 1.0 / d), jnp.asarray(a)[None], jnp.asarray(b)[None],
        jnp.asarray(c)[None])
    t = np.asarray(inter.distance)
    best = t.min(axis=1)
    sid = t.argmin(axis=1)
    return best, np.where(np.isfinite(best), sid, -1)


@pytest.fixture(scope="module")
def moved_setup():
    rng = np.random.default_rng(23)
    a, b, c = tb.create_n_cubes(100)  # 1200 tris
    a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
    scene = build_tight_scene(a, b, c)
    # move 3 whole cubes (36 tris) by a large offset
    moved_cubes = rng.choice(100, size=3, replace=False)
    moved = np.concatenate([np.arange(12) + 12 * k for k in moved_cubes])
    shift = rng.uniform(20, 60, size=(3,)).astype(np.float32)
    a2, b2, c2 = a.copy(), b.copy(), c.copy()
    for arr in (a2, b2, c2):
        arr[moved] += shift
    return a, b, c, scene, moved.astype(np.int32), a2, b2, c2


def _aimed_rays(a, b, c, n, rng):
    centers = np.asarray((a + b + c) / 3.0)
    o = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    d = (centers[rng.integers(0, len(a), n)] - o).astype(np.float32)
    return Ray.create(o, d)


def test_update_matches_oracle(moved_setup):
    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    rng = np.random.default_rng(7)
    upd = make_updater(scene, max_moved=64)
    pad = np.full(64, -1, np.int32)
    pad[: len(moved)] = moved
    chained = upd(a2, b2, c2, pad)
    rays = _aimed_rays(a2, b2, c2, 512, rng)
    hit = trace_closest_hit_chained(chained, rays, interpret=True)
    bt, bid = _oracle_closest(rays, a2, b2, c2)
    t = np.asarray(hit.t)
    assert (np.isfinite(t) == np.isfinite(bt)).all()
    m = np.isfinite(bt)
    assert m.any()
    np.testing.assert_allclose(t[m], bt[m], rtol=1e-2)
    # ids: allow the grazing-edge class (t ties), require t agreement instead
    sid = np.asarray(hit.shape_id)
    exact = sid[m] == bid[m]
    assert exact.mean() > 0.95


def test_update_hits_moved_geometry(moved_setup):
    """Rays aimed at the NEW positions of moved cubes must hit them."""
    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    upd = make_updater(scene, max_moved=64)
    pad = np.full(64, -1, np.int32)
    pad[: len(moved)] = moved
    chained = upd(a2, b2, c2, pad)
    centers = np.asarray((a2 + b2 + c2) / 3.0)[moved]
    o = np.full((len(moved), 3), -80.0, np.float32)
    rays = Ray.create(o, centers - o)
    hit = trace_closest_hit_chained(chained, rays, interpret=True)
    bt, _ = _oracle_closest(rays, a2, b2, c2)
    np.testing.assert_allclose(np.asarray(hit.t), bt, rtol=1e-2)
    assert np.isfinite(np.asarray(hit.t)).all()


def test_update_no_stale_hits(moved_setup):
    """Rays aimed at the OLD positions must not hit the moved triangles."""
    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    upd = make_updater(scene, max_moved=64)
    pad = np.full(64, -1, np.int32)
    pad[: len(moved)] = moved
    chained = upd(a2, b2, c2, pad)
    centers = np.asarray((a + b + c) / 3.0)[moved]  # OLD centers
    o = np.full((len(moved), 3), -80.0, np.float32)
    rays = Ray.create(o, centers - o)
    hit = trace_closest_hit_chained(chained, rays, interpret=True)
    bt, bid = _oracle_closest(rays, a2, b2, c2)
    t = np.asarray(hit.t)
    assert (np.isfinite(t) == np.isfinite(bt)).all()
    m = np.isfinite(bt)
    if m.any():
        np.testing.assert_allclose(t[m], bt[m], rtol=1e-2)
    sid = np.asarray(hit.shape_id)
    assert not np.isin(sid[m], moved).any() or (
        # a moved tri may legitimately be hit at its NEW location
        np.allclose(t[m], bt[m], rtol=1e-2))


def test_update_any_hit(moved_setup):
    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    rng = np.random.default_rng(9)
    upd = make_updater(scene, max_moved=64)
    pad = np.full(64, -1, np.int32)
    pad[: len(moved)] = moved
    chained = upd(a2, b2, c2, pad)
    rays = _aimed_rays(a2, b2, c2, 256, rng)
    bt, _ = _oracle_closest(rays, a2, b2, c2)
    tmx = np.where(np.isfinite(bt), bt * 1.25, 2.0).astype(np.float32)
    occ = np.asarray(trace_any_hit_chained(chained, rays, t_max=tmx,
                                           interpret=True))
    want = np.isfinite(bt) & (bt < tmx)
    # the packed-min t class can flip hits within W ulps of t_max; compare
    # away from the boundary
    safe_band = ~np.isfinite(bt) | (np.abs(bt * 1.25 - bt) > 1e-3 * bt)
    assert (occ == want)[safe_band].all()
    assert occ.any()


def test_update_cumulative_and_cap(moved_setup):
    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    rng = np.random.default_rng(13)
    upd = make_updater(scene, max_moved=64)
    # frame 1: first cube only
    pad = np.full(64, -1, np.int32)
    pad[:12] = moved[:12]
    a1, b1, c1 = a.copy(), b.copy(), c.copy()
    for src, dst in ((a2, a1), (b2, b1), (c2, c1)):
        dst[moved[:12]] = src[moved[:12]]
    ch1 = upd(a1, b1, c1, pad)
    rays = _aimed_rays(a1, b1, c1, 256, rng)
    hit = trace_closest_hit_chained(ch1, rays, interpret=True)
    bt, _ = _oracle_closest(rays, a1, b1, c1)
    m = np.isfinite(bt)
    assert (np.isfinite(np.asarray(hit.t)) == m).all()
    np.testing.assert_allclose(np.asarray(hit.t)[m], bt[m], rtol=1e-2)
    # frame 2: cumulative set (all three cubes) against the ORIGINAL scene
    pad2 = np.full(64, -1, np.int32)
    pad2[: len(moved)] = moved
    ch2 = upd(a2, b2, c2, pad2)
    hit2 = trace_closest_hit_chained(ch2, rays, interpret=True)
    bt2, _ = _oracle_closest(rays, a2, b2, c2)
    m2 = np.isfinite(bt2)
    np.testing.assert_allclose(np.asarray(hit2.t)[m2], bt2[m2], rtol=1e-2)
    # capacity guard
    with pytest.raises(ValueError):
        upd(a2, b2, c2, np.zeros(100, np.int32))


def test_update_quality_static_visits(moved_setup):
    """The masked static part must trace with the ORIGINAL tree quality:
    identical traversal structure (same boxes), only the moved lanes gone."""
    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    upd = make_updater(scene, max_moved=64)
    pad = np.full(64, -1, np.int32)
    pad[: len(moved)] = moved
    chained = upd(a2, b2, c2, pad)
    static = chained.parts[0]
    # every box table is untouched
    assert static.smem_nodes is scene.smem_nodes
    assert static.gnodes is scene.gnodes
    assert static.sweep_nodes is scene.sweep_nodes
    # moved lanes are degenerate, all other lanes bit-identical
    g0 = np.asarray(scene.groups).transpose(0, 2, 1).reshape(-1, 16)
    g1 = np.asarray(static.groups).transpose(0, 2, 1).reshape(-1, 16)
    tri_map = np.asarray(scene.tri_map)
    moved_lane = np.isin(tri_map, moved)
    assert (g1[moved_lane] == 0).all()
    assert (g1[~moved_lane] == g0[~moved_lane]).all()


def test_update_partial_delta_skips_empty_capacity(moved_setup):
    """A delta part filled far below max_moved must not traverse its empty
    capacity: empty grid columns hold NaN (unfireable) boxes, so fires
    track LIVE clusters, not capacity (a 120/1200 fill measured 75 -> 8
    fires/packet when inverted-inf empties were firing the slab test)."""
    from bvh_tpu.ops.trace import count_visits_tight

    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    cap = 360  # 30x the live set
    upd = make_updater(scene, max_moved=cap)
    mi = np.full(cap, -1, np.int32)
    mi[:12] = moved[:12]  # one cube lives in the delta
    sc = upd(jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2),
             jnp.asarray(mi))
    delta = sc.parts[1]
    rng = np.random.default_rng(8)
    rays = _aimed_rays(a2, b2, c2, 2048, rng)
    vi, fi = count_visits_tight(delta, rays, packet=2048, interpret=True)
    live_clusters = -(-12 // delta.width)
    assert fi.sum() / len(fi) <= 4 * live_clusters, (vi.sum(), fi.sum())


def test_update_chained_sweep_perm_composition(moved_setup):
    """The bench's refit-quality composition — updater ChainedScene traced
    with sweep gating AND the perm-folded pack — must be bit-identical to
    the plain (pre-sorted, ungated) chained trace."""
    from bvh_tpu.ops.trace import sort_rays_device

    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    upd = make_updater(scene, max_moved=moved.shape[0])
    sc = upd(jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2),
             jnp.asarray(moved))
    rng = np.random.default_rng(5)
    rays = _aimed_rays(a2, b2, c2, 512, rng)
    o, d = jnp.asarray(rays.origin), jnp.asarray(rays.direction)
    perm, inv = sort_rays_device(o, d, bits=2)
    out_pf = trace_closest_hit_chained(sc, rays, packet=256, interpret=True,
                                       sweep=True, perm=perm)
    t_pf = np.asarray(out_pf.t)[np.asarray(inv)]
    id_pf = np.asarray(out_pf.shape_id)[np.asarray(inv)]
    rays_s = Ray.create(o[perm], d[perm])
    out_pl = trace_closest_hit_chained(sc, rays_s, packet=256,
                                       interpret=True, sweep=False)
    t_pl = np.asarray(out_pl.t)[np.asarray(inv)]
    id_pl = np.asarray(out_pl.shape_id)[np.asarray(inv)]
    np.testing.assert_array_equal(t_pf, t_pl)
    np.testing.assert_array_equal(id_pf, id_pl)
    assert np.isfinite(t_pf).mean() > 0.5


def test_chained_updater_matches_oracle():
    """make_chained_updater: mask+delta across a multi-part scene."""
    from bvh_tpu.ops import make_chained_updater
    from bvh_tpu.ops.cluster import build_chained_scene

    rng = np.random.default_rng(31)
    a, b, c = tb.create_n_cubes(150)  # 1800 tris
    a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
    chained = build_chained_scene(a, b, c, max_part=700, use_native=False)
    assert len(chained.parts) >= 2
    # move 4 cubes (48 tris) spread across the scene
    moved_cubes = rng.choice(150, size=4, replace=False)
    moved = np.concatenate([np.arange(12) + 12 * k for k in moved_cubes])
    a2, b2, c2 = a.copy(), b.copy(), c.copy()
    for arr in (a2, b2, c2):
        arr[moved] += rng.uniform(15, 45, size=(3,)).astype(np.float32)

    upd = make_chained_updater(chained, max_moved=64)
    pad = np.full(64, -1, np.int32)
    pad[: len(moved)] = moved.astype(np.int32)
    ch2 = upd(a2, b2, c2, pad)
    assert len(ch2.parts) == 2 * len(chained.parts)

    rays = _aimed_rays(a2, b2, c2, 400, rng)
    hit = trace_closest_hit_chained(ch2, rays, interpret=True)
    bt, bs = _oracle_closest(rays, a2, b2, c2)
    m = np.isfinite(bt)
    tg = np.asarray(hit.t)
    assert (np.isfinite(tg) == m).mean() > 0.99
    both = np.isfinite(tg) & m
    np.testing.assert_allclose(tg[both], bt[both], rtol=1e-2)
    # hits on MOVED geometry resolve to correct global ids
    sid = np.asarray(hit.shape_id)
    on_moved = both & np.isin(bs, moved)
    assert on_moved.any()
    assert (np.isin(sid[on_moved], moved)).mean() > 0.9
    # statics keep their original box tables
    for p in range(len(chained.parts)):
        assert ch2.parts[2 * p].smem_nodes is chained.parts[p].smem_nodes
    # capacity guard
    with pytest.raises(ValueError):
        upd(a2, b2, c2, np.zeros(100, np.int32))


def test_update_giant_churn_splits_delta(moved_setup, monkeypatch):
    """Churn sets beyond one SMEM table auto-route to a chained delta:
    D same-shape Morton-partitioned delta parts (``_delta_layout``).
    Forced here by shrinking the budget; hits must still match the oracle
    and every delta slice must share one table shape (one compile)."""
    from bvh_tpu.ops import update as upd_mod

    a, b, c, scene, moved, a2, b2, c2 = moved_setup
    monkeypatch.setattr(upd_mod, "_SMEM_BUDGET", 100)  # force a split
    upd = upd_mod.make_updater(scene, max_moved=64)
    assert upd.delta_parts > 1
    D = upd.delta_parts
    pad = np.full(upd.cap, -1, np.int32)
    pad[: len(moved)] = moved
    chained = upd(a2, b2, c2, pad)
    assert len(chained.parts) == 1 + D
    shapes = {p.smem_nodes.shape for p in chained.parts[1:]}
    assert len(shapes) == 1  # one compiled kernel for every delta slice
    rng = np.random.default_rng(41)
    rays = _aimed_rays(a2, b2, c2, 256, rng)
    hit = trace_closest_hit_chained(chained, rays, interpret=True)
    bt, _ = _oracle_closest(rays, a2, b2, c2)
    t = np.asarray(hit.t)
    m = np.isfinite(bt)
    assert (np.isfinite(t) == m).all()
    np.testing.assert_allclose(t[m], bt[m], rtol=1e-2)
    # rays aimed at moved geometry resolve through the split deltas
    centers = np.asarray((a2 + b2 + c2) / 3.0)[moved]
    o = np.full((len(moved), 3), -80.0, np.float32)
    rays2 = Ray.create(o, centers - o)
    hit2 = trace_closest_hit_chained(chained, rays2, interpret=True)
    assert np.isfinite(np.asarray(hit2.t)).all()


def test_update_add_remove_growth():
    """Kernel-tier scene GROWTH without a host rebuild: max_added slots let
    new triangle ids (>= n) enter the delta part; alive=False entries are
    removals (mask-only). Chained trace must match a fresh build over the
    live geometry exactly (grid-mode scene). Reference semantics being
    re-designed: add_shape's SAH-guided insert + remove_shape's sibling
    promotion, /root/reference/src/bvh/optimization.rs:70-209, 214-301."""
    rng = np.random.default_rng(31)
    a, b, c = tb.create_n_cubes(60)  # 720 tris
    a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
    n = a.shape[0]
    scene = build_tight_scene(a, b, c)

    # new geometry: 2 cubes placed on fresh grid sites
    na, nb, nc = tb.create_n_cubes(62)
    na, nb, nc = (np.asarray(x)[60 * 12:] + 7.0 for x in (na, nb, nc))
    n_add = na.shape[0]  # 24 tris

    # removals: one whole cube; moves: one whole cube shifted
    removed = (np.arange(12) + 12 * 5).astype(np.int32)
    moved = (np.arange(12) + 12 * 17).astype(np.int32)
    a_ext = np.concatenate([a, na]).astype(np.float32)
    b_ext = np.concatenate([b, nb]).astype(np.float32)
    c_ext = np.concatenate([c, nc]).astype(np.float32)
    for arr in (a_ext, b_ext, c_ext):
        arr[moved] += np.float32(31.0)

    upd = make_updater(scene, max_moved=32, max_added=32)
    ids = np.concatenate([moved, removed,
                          np.arange(n, n + n_add, dtype=np.int32)])
    alive = np.concatenate([np.ones(12, bool), np.zeros(12, bool),
                            np.ones(n_add, bool)])
    pad = upd.cap - ids.shape[0]
    ids = np.concatenate([ids, np.full(pad, -1, np.int32)])
    alive = np.concatenate([alive, np.zeros(pad, bool)])
    ch = upd(a_ext, b_ext, c_ext, jnp.asarray(ids), jnp.asarray(alive))

    # oracle: fresh build over exactly the live triangles
    live = np.ones(n + n_add, bool)
    live[removed] = False
    live_ids = np.nonzero(live)[0]
    oracle = build_tight_scene(a_ext[live], b_ext[live], c_ext[live])

    rays = _aimed_rays(a_ext[live], b_ext[live], c_ext[live], 512,
                       np.random.default_rng(5))
    got = trace_closest_hit_chained(ch, rays, packet=512, interpret=True)
    want = trace_closest_hit_tight(oracle, rays, packet=512, interpret=True)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    # packed min-key band: the winner's t carries the lane in its low
    # log2(W) bits, so chained-vs-oracle t may differ by W-1 ulps (~2e-6)
    np.testing.assert_allclose(tg[both], tw[both], rtol=4e-6)
    # ids: chained ids are GLOBAL (extended-array rows); map oracle's
    # live-subset ids back to global and compare where t is unambiguous
    sg = np.asarray(got.shape_id)
    sw = np.asarray(want.shape_id)
    sw_glob = np.where(sw >= 0, live_ids[np.clip(sw, 0, len(live_ids) - 1)], -1)
    agree = (sg[both] == sw_glob[both]).mean()
    assert agree > 0.99  # packed min-key ties may flip within ~128 ulps

    # removed geometry must be gone: no hit may report a removed id
    assert not np.isin(sg, removed).any()
    # added geometry must be hittable: aim rays at each added triangle's
    # centroid from 3 units off along its normal-ish offset
    ctr = ((na + nb + nc) / 3.0).astype(np.float32)
    o2 = (ctr + np.float32(3.0)).astype(np.float32)
    d2 = (ctr - o2).astype(np.float32)
    r2 = Ray.create(o2, d2)
    got2 = trace_closest_hit_chained(ch, r2, packet=128, interpret=True)
    assert (np.asarray(got2.shape_id) >= n).any()
