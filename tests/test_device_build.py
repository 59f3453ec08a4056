"""On-device TightScene construction (Morton clusters + cluster LBVH)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh.traverse import brute_force_closest_hit
from bvh_tpu.ops.device_build import build_tight_scene_device
from bvh_tpu.ops.trace import trace_any_hit_tight, trace_closest_hit_tight


@pytest.fixture(scope="module")
def device_scene():
    a, b, c = tb.create_n_cubes(40)  # 480 tris -> 30 clusters
    scene = build_tight_scene_device(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    return a, b, c, scene


def test_device_scene_structure(device_scene):
    a, b, c, scene = device_scene
    n = a.shape[0]
    assert scene.width == 16
    assert scene.num_clusters == -(-n // 16)
    ids = np.asarray(scene.tri_map)
    ids = ids[ids >= 0]
    assert sorted(ids.tolist()) == list(range(n)), "every triangle packed once"
    # DFS invariants of the upper table
    nodes = np.asarray(scene.smem_nodes)
    entry, exit_ = nodes[6], nodes[7].astype(np.int64)
    nn = nodes.shape[1]
    assert nn == scene.num_nodes
    for i in range(nn):
        assert exit_[i] > i and exit_[i] <= nn
        if entry[i] >= 0:
            assert int(entry[i]) == i + 1
    # every cluster appears exactly once as a leaf payload
    pay = sorted((-entry[entry < 0] - 1).astype(int).tolist())
    assert pay == list(range(scene.num_clusters))


def test_device_scene_matches_brute_force(device_scene):
    a, b, c, scene = device_scene
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 1024
    idx = np.resize(np.arange(len(centers)), n)
    rng = np.random.default_rng(17)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 40.0).astype(np.float32)
    d = (centers[idx] + 0.19 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    got = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj), packet=1024, interpret=True)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    assert both.mean() > 0.9
    np.testing.assert_allclose(tg[both], tw[both], rtol=3e-3)
    ids_agree = (np.asarray(got.shape_id)[both] == np.asarray(want.shape_id)[both]).mean()
    assert ids_agree > 0.99
    # any-hit on the device-built scene
    occ = np.asarray(trace_any_hit_tight(scene, rays, packet=1024, interpret=True))
    assert (occ == np.isfinite(tg)).all()


def test_device_build_non_multiple_of_16():
    """Triangle counts that don't fill the last cluster still trace right."""
    a, b, c = tb.create_n_cubes(3)  # 36 tris
    a, b, c = a[:29], b[:29], c[:29]
    scene = build_tight_scene_device(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert scene.num_clusters == 2
    tc = ((a + b + c) / 3.0).astype(np.float32)  # triangle centroids
    o = a.mean(axis=0, keepdims=True) + np.float32([0.0, 0.0, 25.0])
    rays = Ray.create(jnp.asarray(np.repeat(o, 29, axis=0)),
                      jnp.asarray(tc - o))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    got = trace_closest_hit_tight(scene, rays, packet=128, interpret=True)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    np.testing.assert_allclose(tg[both], tw[both], rtol=3e-3)


def test_refitter_identity():
    """Refitting with the original vertices reproduces every box exactly
    (same joins over the same members) and identical trace results."""
    from bvh_tpu.ops.cluster import build_tight_scene
    from bvh_tpu.ops.device_build import make_refitter

    a, b, c = tb.create_n_cubes(30)
    scene = build_tight_scene(a, b, c, use_native=False)
    refit = make_refitter(scene)
    re = refit(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    assert re.num_nodes == scene.num_nodes and re.width == scene.width
    orig = np.asarray(scene.smem_nodes)
    new = np.asarray(re.smem_nodes)
    np.testing.assert_allclose(new[0:6], orig[0:6], atol=1e-5)
    np.testing.assert_array_equal(new[6:8], orig[6:8])
    np.testing.assert_allclose(np.asarray(re.groups), np.asarray(scene.groups), atol=1e-5)
    # the wide group-walk table is refit too (fixed topology, recomputed
    # boxes): identity refit must reproduce it bit-for-bit, keeping the
    # refitted scene on the group-walk fast path
    assert scene.gnodes is not None and re.gnodes is not None
    np.testing.assert_array_equal(np.asarray(re.gnodes),
                                  np.asarray(scene.gnodes))
    np.testing.assert_array_equal(np.asarray(re.gslot),
                                  np.asarray(scene.gslot))
    assert re.gdepth == scene.gdepth


def test_device_build_wide_walk_matches_entry_exit():
    """Grid-built scenes now carry the group-walk tables (static topology,
    device-filled boxes): the wide walk must be bit-identical to the
    entry/exit walk on the same scene, and the table must validate."""
    from bvh_tpu.ops import assert_tight_scene
    from bvh_tpu.ops.cluster import build_tight_scene

    a, b, c = tb.create_n_cubes(40)
    scene = build_tight_scene_device(a, b, c)
    assert scene.gnodes is not None and scene.gslot is not None
    assert scene.gdepth >= 1
    assert_tight_scene(scene, a, b, c)
    cen = a.reshape(-1, 12, 3).mean(axis=1)
    n = 512
    rng = np.random.default_rng(7)
    idx = np.resize(np.arange(len(cen)), n)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (cen[idx] + offs * 30.0).astype(np.float32)
    d = (cen[idx] + 0.05 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    wide = trace_closest_hit_tight(scene, rays, interpret=True, packet=512)
    noww = trace_closest_hit_tight(
        scene._replace(gnodes=None, gslot=None, gdepth=0), rays,
        interpret=True, packet=512)
    np.testing.assert_array_equal(np.asarray(wide.t), np.asarray(noww.t))
    np.testing.assert_array_equal(np.asarray(wide.shape_id),
                                  np.asarray(noww.shape_id))
    assert np.isfinite(np.asarray(wide.t)).mean() > 0.5
    # and the host SAH scene's wide walk agrees set-wise with the grid one
    host = build_tight_scene(a, b, c, use_native=False)
    hit_h = trace_closest_hit_tight(host, rays, interpret=True, packet=512)
    assert (np.isfinite(np.asarray(hit_h.t))
            == np.isfinite(np.asarray(wide.t))).all()


def test_refit_wide_walk_matches_entry_exit():
    """The refit gnodes table is a pure perf hint: tracing the refit scene
    through the wide group walk must be bit-identical to the entry/exit
    walk on the same tables."""
    from bvh_tpu.ops.cluster import build_tight_scene
    from bvh_tpu.ops.device_build import make_refitter
    from bvh_tpu.ops.trace import trace_closest_hit_tight

    a, b, c = tb.create_n_cubes(40)
    scene = build_tight_scene(a, b, c, use_native=False)
    a2, b2, c2, _ = tb.randomly_transform_scene(a, b, c, amount=len(a) // 3,
                                                seed=11)
    re = make_refitter(scene)(jnp.asarray(a2), jnp.asarray(b2),
                              jnp.asarray(c2))
    assert re.gnodes is not None
    cen = (a2 + b2 + c2) / 3.0
    n = 512
    idx = np.resize(np.arange(len(cen)), n)
    rng = np.random.default_rng(3)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (cen[idx] + offs * 30.0).astype(np.float32)
    d = (cen[idx] + 0.05 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    wide = trace_closest_hit_tight(re, rays, interpret=True, packet=512)
    noww = trace_closest_hit_tight(
        re._replace(gnodes=None, gslot=None, gdepth=0), rays,
        interpret=True, packet=512)
    np.testing.assert_array_equal(np.asarray(wide.t), np.asarray(noww.t))
    np.testing.assert_array_equal(np.asarray(wide.shape_id),
                                  np.asarray(noww.shape_id))


def test_refitter_deformed_consistent_and_traces():
    """After deformation the tree stays consistent+tight and traces match
    brute force on the moved geometry."""
    from bvh_tpu.ops.cluster import build_tight_scene
    from bvh_tpu.ops.device_build import make_refitter

    a, b, c = tb.create_n_cubes(30)
    scene = build_tight_scene(a, b, c, use_native=False)
    refit = make_refitter(scene)
    # deform: squash y, shift x, wobble by triangle index
    rng = np.random.default_rng(5)
    wob = rng.normal(scale=0.2, size=(a.shape[0], 1, 3)).astype(np.float32)
    pts = np.stack([a, b, c], axis=1) * np.float32([1.0, 0.6, 1.0]) + wob
    pts[:, :, 0] += 7.0
    a2, b2, c2 = pts[:, 0], pts[:, 1], pts[:, 2]
    re = refit(jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2))

    # tightness: every internal box is exactly the join of its children
    # (only the logical columns; the rest are shape-bucket pads)
    nodes = np.asarray(re.smem_nodes)
    entry, exit_ = nodes[6], nodes[7].astype(np.int64)
    for i in range(re.num_nodes):
        if entry[i] >= 0:
            j = int(entry[i])
            mn = np.full(3, np.inf)
            mx = np.full(3, -np.inf)
            while j < exit_[i]:
                mn = np.minimum(mn, nodes[0:3, j])
                mx = np.maximum(mx, nodes[3:6, j])
                j = exit_[j]
            np.testing.assert_allclose(nodes[0:3, i], mn, atol=1e-5)
            np.testing.assert_allclose(nodes[3:6, i], mx, atol=1e-5)

    centers = ((a2 + b2 + c2) / 3.0).reshape(-1, 12, 3).mean(axis=1)
    n = 512
    idx = np.resize(np.arange(len(centers)), n)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 30.0).astype(np.float32)
    d = (centers[idx] + 0.21 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2)
    got = trace_closest_hit_tight(re, rays, tris=(aj, bj, cj), packet=512,
                                  interpret=True)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    # wobbled faces crack apart -> some rays graze edges; statistical bound
    # (same float-boundary class documented for the closest-hit tests)
    assert (np.isfinite(tg) == np.isfinite(tw)).mean() > 0.99
    both = np.isfinite(tg) & np.isfinite(tw)
    assert both.mean() > 0.5  # cracked faces: many aimed rays now miss
    ids_agree = np.asarray(got.shape_id)[both] == np.asarray(want.shape_id)[both]
    assert ids_agree.mean() > 0.9  # cracks produce many true edge ties
    np.testing.assert_allclose(tg[both][ids_agree], tw[both][ids_agree], rtol=3e-4)


def test_device_build_jittable_pipeline():
    """Build + trace compose under one jit (the per-frame rebuild shape)."""
    import jax

    a, b, c = tb.create_n_cubes(8)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    from bvh_tpu.ops.device_build import _build_core

    @jax.jit
    def rebuild(shift):
        return _build_core(aj + shift, bj + shift, cj + shift)

    n0, g0, m0 = rebuild(jnp.zeros((1, 3), jnp.float32))
    n1, g1, m1 = rebuild(jnp.full((1, 3), 5.0, jnp.float32))
    # shifted scene: boxes move by the shift, topology may differ; check
    # roots moved and the table is well-formed
    assert np.isfinite(np.asarray(n1)[:6]).all()
    np.testing.assert_allclose(np.asarray(n1[0:3, 0]),
                               np.asarray(n0[0:3, 0]) + 5.0, rtol=1e-5)


def test_device_chained_build_matches_brute_force():
    from bvh_tpu.ops.device_build import build_chained_scene_device
    from bvh_tpu.ops.trace import trace_closest_hit_chained

    a, b, c = tb.create_n_cubes(120)  # 1440 tris
    ch = build_chained_scene_device(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(c), max_part=500)
    assert len(ch.parts) == 3
    # same compiled shapes across parts (one kernel serves all)
    assert len({p.smem_nodes.shape for p in ch.parts}) == 1
    assert len({p.groups.shape for p in ch.parts}) == 1
    # every triangle lands in exactly one part
    all_ids = np.concatenate([np.asarray(i) for i in ch.orig_ids])
    all_ids = all_ids[all_ids >= 0]
    assert sorted(all_ids.tolist()) == list(range(a.shape[0]))

    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 512
    rng = np.random.default_rng(11)
    idx = rng.integers(0, len(centers), n)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 35.0).astype(np.float32)
    d = (centers[idx] + 0.21 - o).astype(np.float32)
    flip = rng.random(n) < 0.25
    d[flip] = offs[flip]  # some rays point away: misses
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    got = trace_closest_hit_chained(ch, rays, packet=1024, interpret=True)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).mean() > 0.99
    both = np.isfinite(tg) & np.isfinite(tw)
    assert both.sum() > 0
    np.testing.assert_allclose(tg[both], tw[both], rtol=1e-2)
    # winner ids map back to GLOBAL triangle ids
    sid = np.asarray(got.shape_id)
    wid = np.asarray(want.shape_id)
    assert (sid[both] == wid[both]).mean() > 0.9


def test_device_chained_single_part_passthrough():
    from bvh_tpu.ops.device_build import build_chained_scene_device

    a, b, c = tb.create_n_cubes(10)
    ch = build_chained_scene_device(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(c), max_part=10_000)
    assert len(ch.parts) == 1
    ids = np.asarray(ch.orig_ids[0])
    assert (ids == np.arange(120)).all()
