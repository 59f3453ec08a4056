"""Per-packet subtree entry (two-phase wide walk + planner), interpret mode.

The contract: ``start_g`` is a pure performance hint — for ANY per-packet
group id, the two-phase walk (subtree first, then a root walk that skips
the subtree) must return results identical to the single-phase wide walk.
TPU re-design of the reference's pruned descent
(/root/reference/src/bvh/bvh_node.rs:327-374).
"""

import numpy as np
import pytest

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene, wide_group_meta
from bvh_tpu.ops.trace import (count_visits_wide, make_planner,
                               trace_closest_hit_tight)


@pytest.fixture(scope="module")
def scene_rays():
    rng = np.random.default_rng(17)
    a, b, c = tb.create_n_cubes(150)  # 1800 tris
    scene = build_tight_scene(np.asarray(a), np.asarray(b), np.asarray(c))
    assert scene.gnodes is not None
    n = 2048
    centers = np.asarray((a + b + c) / 3.0)
    o = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    # first packet-half: coherent rays aimed at one cube cluster (the
    # planner's win case); rest: random aims + misses
    tgt = centers[rng.integers(0, 12, n)]  # cube 0's triangles
    d = (tgt - o).astype(np.float32)
    d[n // 2:] = (centers[rng.integers(0, len(centers), n // 2)]
                  - o[n // 2:]).astype(np.float32)
    d[7 * n // 8:] = rng.normal(size=(n // 8, 3)).astype(np.float32)
    return np.asarray(a), np.asarray(b), np.asarray(c), scene, Ray.create(o, d)


def test_group_meta_invariants(scene_rays):
    a, b, c, scene, rays = scene_rays
    parent, depth, anc = wide_group_meta(scene.gnodes)
    Gn = parent.shape[0]
    assert parent[0] == -1 and depth[0] == 0
    reach = np.nonzero(parent >= 0)[0]
    assert (depth[reach] == depth[parent[reach]] + 1).all()
    # anc[g, depth[g]] == g; anc[g, d] for d < depth[g] is parent-chain
    assert (anc[np.arange(Gn), depth] == np.arange(Gn)).all()
    for g in reach[:50]:
        d = depth[g]
        assert anc[g, d - 1] == parent[g]
        assert (anc[g, :d] == anc[parent[g], :d]).all()


def test_arbitrary_start_groups_exact(scene_rays):
    """ANY start_g must give bit-identical results (exactness pass)."""
    a, b, c, scene, rays = scene_rays
    base = trace_closest_hit_tight(scene, rays, interpret=True, wide=True)
    parent, depth, anc = wide_group_meta(scene.gnodes)
    real = np.nonzero((np.arange(len(parent)) == 0) | (parent >= 0))[0]
    rng = np.random.default_rng(3)
    p = -(-rays.origin.shape[0] // 2048)
    for trial in range(3):
        sg = rng.choice(real, size=p).astype(np.int32)
        if trial == 0:
            sg[:] = -1  # inert plan must also match
        got = trace_closest_hit_tight(scene, rays, interpret=True, wide=True,
                                      start_g=np.asarray(sg))
        assert (np.asarray(got.t) == np.asarray(base.t)).all(), trial
        assert (np.asarray(got.shape_id)
                == np.asarray(base.shape_id)).all(), trial


def test_arbitrary_start_group_pairs_exact(scene_rays):
    """ANY [p, 2] pair — disjoint, nested, equal, or inert — is exact."""
    a, b, c, scene, rays = scene_rays
    base = trace_closest_hit_tight(scene, rays, interpret=True, wide=True)
    parent, depth, anc = wide_group_meta(scene.gnodes)
    real = np.nonzero((np.arange(len(parent)) == 0) | (parent >= 0))[0]
    rng = np.random.default_rng(11)
    p = -(-rays.origin.shape[0] // 2048)
    for trial in range(4):
        sg = rng.choice(real, size=(p, 2)).astype(np.int32)
        if trial == 1:
            sg[:, 1] = sg[:, 0]  # equal pair
        if trial == 2:
            # nested: slot 1 = parent chain of slot 0 (root -> inert)
            sg[:, 1] = parent[sg[:, 0]]
        if trial == 3:
            sg[:, 0] = -1  # only the second slot set
        got = trace_closest_hit_tight(scene, rays, interpret=True, wide=True,
                                      start_g=np.asarray(sg))
        assert (np.asarray(got.t) == np.asarray(base.t)).all(), trial
        assert (np.asarray(got.shape_id)
                == np.asarray(base.shape_id)).all(), trial


def test_planner_exact_and_hits(scene_rays):
    a, b, c, scene, rays = scene_rays
    base = trace_closest_hit_tight(scene, rays, interpret=True, wide=True)
    plan = make_planner(scene, packet=1024, interpret=True)
    hints, start_g = plan(rays)
    assert start_g is not None
    got = trace_closest_hit_tight(scene, rays, interpret=True, wide=True,
                                  packet=1024, hints=hints, start_g=start_g)
    assert (np.asarray(got.t) == np.asarray(base.t)).all()
    assert (np.asarray(got.shape_id) == np.asarray(base.shape_id)).all()
    assert np.isfinite(np.asarray(got.t)).any()


def test_planner_assigns_subtrees(scene_rays):
    """Coherent packets must get a non-root start group."""
    a, b, c, scene, rays = scene_rays
    plan = make_planner(scene, packet=1024, interpret=True)
    hints, start_g = plan(rays)
    sg = np.asarray(start_g)  # [p, 2]
    assert sg.ndim == 2 and sg.shape[1] == 2
    parent, depth, anc = wide_group_meta(scene.gnodes)
    # the first packet (single-cube aims) should enter a deep subtree,
    # unless the tree is so small everything hangs off the root
    if depth.max() >= 1:
        assert sg[0, 0] >= 0
        assert depth[sg[0, 0]] >= 1
    # any assigned group must be a real group
    for g in sg[sg >= 0]:
        assert g == 0 or parent[g] >= 0
    # two-entry packets: the entries must sit in DISJOINT subtrees
    # (neither is an ancestor of the other)
    both = (sg[:, 0] > 0) & (sg[:, 1] > 0)
    for g0, g1 in zip(sg[both, 0], sg[both, 1]):
        assert anc[g1, depth[g0]] != g0, (g0, g1)
        assert anc[g0, depth[g1]] != g1, (g0, g1)


def test_subtree_entry_cuts_visits(scene_rays):
    """The planned walk must do fewer iterations on coherent packets."""
    a, b, c, scene, rays = scene_rays
    plan = make_planner(scene, packet=2048, interpret=True)
    hints, start_g = plan(rays)
    it0, f0, g0 = count_visits_wide(scene, rays, packet=2048, interpret=True)
    it1, f1, g1 = count_visits_wide(scene, rays, packet=2048, interpret=True,
                                    start_g=start_g)
    # packet 0 is the coherent one; its group tests must drop when a
    # subtree was assigned (phase 2 gets gated off by the warm bounds)
    if np.asarray(start_g)[0, 0] > 0:
        assert g1[0] < g0[0]


def test_key_planner_exact_and_engages(scene_rays):
    """make_key_planner: entries derived from packet origin bounds (no
    sampling pre-pass) keep results identical, produce valid group ids,
    and actually engage (non-root entry) on origin-clustered packets."""
    from bvh_tpu.ops.trace import make_key_planner, sort_rays_device
    import jax.numpy as jnp

    a, b, c, scene, rays = scene_rays
    packet = 512
    perm, inv = sort_rays_device(rays.origin, rays.direction, mode="morton")
    rays_s = Ray(rays.origin[perm], rays.direction[perm],
                 rays.inv_direction[perm])
    plan = make_key_planner(scene, packet=packet)
    sg = np.asarray(plan(rays_s.origin))
    Gn = np.asarray(scene.gnodes).shape[1]
    assert sg.shape == (rays.origin.shape[0] // packet, 2)
    assert (sg >= -1).all() and (sg < Gn).all()

    base = trace_closest_hit_tight(scene, rays_s, packet=packet,
                                   interpret=True)
    planned = trace_closest_hit_tight(scene, rays_s, packet=packet,
                                      start_g=jnp.asarray(sg),
                                      interpret=True)
    np.testing.assert_array_equal(np.asarray(base.t), np.asarray(planned.t))
    np.testing.assert_array_equal(np.asarray(base.shape_id),
                                  np.asarray(planned.shape_id))


def test_make_tracer_matches_percall(scene_rays):
    """make_tracer (one-jit pipeline) == the per-call public path, both
    sorted and unsorted, with and without the key planner."""
    from bvh_tpu.ops.trace import make_tracer

    a, b, c, scene, rays = scene_rays
    # make_tracer normalizes its raw (o, d) inputs via Ray.create; feed the
    # oracle the SAME once-more-normalized ray so direction bits match
    # (re-normalizing an already-unit d shifts ~1 ulp — advisor r4 class)
    want = trace_closest_hit_tight(
        scene, Ray.create(rays.origin, rays.direction), packet=512,
        interpret=True)
    tw = np.asarray(want.t)
    n = tw.shape[0]
    for kw in ({"sort": None}, {"sort": "morton", "plan": "key"},
               {"sort": "octant", "bits": 2, "sweep": True}):
        tr = make_tracer(scene, packet=512, interpret=True,
                         **{"sweep": False, **kw})
        got = tr(rays.origin, rays.direction)
        tg = np.asarray(got.t)
        assert (np.isfinite(tg) == np.isfinite(tw)).all(), kw
        both = np.isfinite(tg)
        # sorted packets visit different cluster supersets, so packed
        # min-key TIES (t within ~W ulps) may pick the other lane — t
        # agrees to the stolen low bits, ids may flip on those rays only
        np.testing.assert_allclose(tg[both], tw[both], rtol=1e-5,
                                   err_msg=str(kw))
        flips = (np.asarray(got.shape_id) != np.asarray(want.shape_id)).sum()
        assert flips <= max(2, n // 1000), (kw, flips)
        if kw.get("sort") is None:
            np.testing.assert_array_equal(tg, tw)
