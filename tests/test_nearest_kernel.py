"""Kernel-path nearest-triangle queries vs the brute-force oracle.

Interpret-mode (CPU) validation of ``ops/nearest.py``; the hardware fuzz
(`test_fuzz_tpu.py`) re-runs the same comparison on the real chip.
Reference behavior being matched: ``nearest_to``
(/root/reference/src/flat_bvh.rs:513-562) with the testbase Triangle
PointDistance impl (/root/reference/src/testbase.rs:314-443).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import build_tight_scene
from bvh_tpu.ops.nearest import count_visits_nearest, nearest_tight
from bvh_tpu.tri import point_triangle_distance_squared


def brute_nearest(pts, a, b, c):
    d2 = point_triangle_distance_squared(
        jnp.asarray(pts)[:, None, :], jnp.asarray(a)[None],
        jnp.asarray(b)[None], jnp.asarray(c)[None])
    d2 = np.asarray(d2)
    return d2.argmin(axis=1), d2.min(axis=1)


def make_points(n, rng, spread=120.0):
    return rng.uniform(-spread, spread, (n, 3)).astype(np.float32)


@pytest.mark.parametrize("n_cubes", [7, 100])
def test_nearest_kernel_matches_brute(n_cubes):
    rng = np.random.default_rng(11 + n_cubes)
    a, b, c = tb.create_n_cubes(n_cubes)
    scene = build_tight_scene(a, b, c)
    pts = make_points(300, rng)
    sid, dist = nearest_tight(scene, pts, packet=256, interpret=True)
    sid, dist = np.asarray(sid), np.asarray(dist)
    bid, bd2 = brute_nearest(pts, a, b, c)
    bd = np.sqrt(bd2)
    # the packed key truncates log2(W) mantissa bits of d^2: distances agree
    # to that tolerance, and the winning triangle may differ only where two
    # triangles are equidistant within it
    assert np.allclose(dist, bd, rtol=1e-5, atol=1e-5), \
        np.abs(dist - bd).max()
    dd = point_triangle_distance_squared(
        jnp.asarray(pts), jnp.asarray(a)[sid], jnp.asarray(b)[sid],
        jnp.asarray(c)[sid])
    assert np.allclose(np.asarray(dd), bd2, rtol=1e-4, atol=1e-5)


def test_nearest_wide_matches_entry_exit():
    """The group-walk nearest kernel must be bit-identical to the
    entry/exit walk (same candidate set above the final bound, same DFS
    narrow order, same packed keys) — bounded and unbounded."""
    rng = np.random.default_rng(31)
    a, b, c = tb.create_n_cubes(120)
    scene = build_tight_scene(a, b, c)
    assert scene.gnodes is not None
    pts = make_points(512, rng)
    for dm in (None, 40.0):
        sw, dw = nearest_tight(scene, pts, packet=256, d_max=dm,
                               interpret=True)  # wide (default)
        se, de = nearest_tight(scene, pts, packet=256, d_max=dm,
                               interpret=True, wide=False)
        np.testing.assert_array_equal(np.asarray(dw), np.asarray(de))
        np.testing.assert_array_equal(np.asarray(sw), np.asarray(se))
        if dm is None:
            assert (np.asarray(sw) >= 0).all()  # unbounded: all find one


def test_nearest_on_updater_scene_vacated_cluster():
    """Regression (review finding): on a make_updater scene, a fully
    vacated cluster keeps its (stale) box; the nearest kernels' farthest-
    corner bound refinement treated that box as evidence of a live
    triangle and pruned the true nearest away. Masked scenes now disable
    the refinement — results must match brute force exactly."""
    import jax.numpy as jnp

    from bvh_tpu.ops import build_tight_scene, make_updater, nearest_chained

    a, b, c = tb.create_n_cubes(50)
    a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
    scene = build_tight_scene(a, b, c)
    assert scene.num_clusters >= 2
    # vacate one whole cluster: move ALL its triangles far away
    tri_map = np.asarray(scene.tri_map)
    W = scene.width
    lanes = np.arange(W)  # cluster 0's lanes
    moved = tri_map[lanes]
    moved = moved[moved >= 0].astype(np.int32)
    a2, b2, c2 = a.copy(), b.copy(), c.copy()
    for arr in (a2, b2, c2):
        arr[moved] += np.float32(1e6)
    upd = make_updater(scene, max_moved=len(moved))
    sc = upd(jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2),
             jnp.asarray(moved))
    assert sc.parts[0].masked
    # query points near the vacated cluster's OLD box (stale box region):
    # cluster 0's leaf column has entry payload -(0+1)
    col = int(np.nonzero(np.asarray(scene.smem_nodes[6]) == -1.0)[0][0])
    old_box_center = np.asarray(
        (scene.smem_nodes[0:3, col] + scene.smem_nodes[3:6, col]) * 0.5)
    rng = np.random.default_rng(3)
    pts = (old_box_center
           + rng.normal(scale=30.0, size=(256, 3))).astype(np.float32)
    sid, dist = nearest_chained(sc, pts, packet=256, interpret=True)
    sid, dist = np.asarray(sid), np.asarray(dist)
    d2 = np.asarray(point_triangle_distance_squared(
        jnp.asarray(pts)[:, None, :], jnp.asarray(a2)[None],
        jnp.asarray(b2)[None], jnp.asarray(c2)[None]))
    bd = np.sqrt(d2.min(axis=1))
    assert np.allclose(dist, bd, rtol=1e-5, atol=1e-4), \
        np.abs(dist - bd).max()
    dw = np.asarray(point_triangle_distance_squared(
        jnp.asarray(pts), jnp.asarray(a2)[sid], jnp.asarray(b2)[sid],
        jnp.asarray(c2)[sid]))
    assert np.allclose(dw, d2.min(axis=1), rtol=1e-4, atol=1e-4)


def test_nearest_chained_matches_brute_and_single_table():
    """nearest_chained over a forced multi-part split must agree with the
    single-table kernel AND the brute oracle (the reference's nearest_to
    has no scale cliff; neither may ours)."""
    from bvh_tpu.ops.cluster import build_chained_scene
    from bvh_tpu.ops.nearest import nearest_chained

    rng = np.random.default_rng(23)
    a, b, c = tb.create_n_cubes(100)  # 1200 tris
    ch = build_chained_scene(a, b, c, max_part=400)  # forces 3 parts
    assert len(ch.parts) >= 2
    scene = build_tight_scene(a, b, c)
    pts = make_points(300, rng)

    sid_c, dist_c = nearest_chained(ch, pts, packet=256, interpret=True)
    sid_c, dist_c = np.asarray(sid_c), np.asarray(dist_c)
    sid_s, dist_s = nearest_tight(scene, pts, packet=256, interpret=True)
    bid, bd2 = brute_nearest(pts, a, b, c)
    bd = np.sqrt(bd2)
    assert np.allclose(dist_c, bd, rtol=1e-5, atol=1e-5), \
        np.abs(dist_c - bd).max()
    assert np.allclose(dist_c, np.asarray(dist_s), rtol=1e-5, atol=1e-5)
    # the winner is a true nearest triangle (ties/truncation may pick the
    # equidistant neighbor — verify by distance, like the single-table test)
    dd = point_triangle_distance_squared(
        jnp.asarray(pts), jnp.asarray(a)[sid_c], jnp.asarray(b)[sid_c],
        jnp.asarray(c)[sid_c])
    assert np.allclose(np.asarray(dd), bd2, rtol=1e-4, atol=1e-5)
    assert (sid_c >= 0).all()

    # radius-bounded: far points report no triangle, near points unchanged
    sid_b, dist_b = nearest_chained(ch, pts, packet=256, d_max=5.0,
                                    interpret=True)
    sid_b, dist_b = np.asarray(sid_b), np.asarray(dist_b)
    far = bd >= 5.0
    assert (sid_b[far] == -1).all() and np.isinf(dist_b[far]).all()
    near = bd < 5.0 * (1 - 1e-5)
    if near.any():
        assert np.allclose(dist_b[near], bd[near], rtol=1e-5, atol=1e-5)


def test_nearest_kernel_points_on_and_in_triangles():
    """Points on vertices/edges/faces => distance ~0 (up to the f32 ulp of
    the +-100k testbase coordinates: a midpoint of two f32 points at 1e5
    scale genuinely sits up to ~2^-7 off the edge — the oracle agrees)."""
    a, b, c = tb.create_n_cubes(5)
    scene = build_tight_scene(a, b, c)
    pts = np.concatenate([a[::7], (a[::5] + b[::5]) / 2,
                          (a[::3] + b[::3] + c[::3]) / 3]).astype(np.float32)
    sid, dist = nearest_tight(scene, pts, packet=128, interpret=True)
    dist = np.asarray(dist)
    assert (dist < 0.02).all(), dist.max()
    # the kernel works in the cluster-relative frame and is MORE accurate
    # than the global-frame oracle at 1e5 offsets: compare at the ulp scale
    _, bd2 = brute_nearest(pts, a, b, c)
    assert np.allclose(dist, np.sqrt(bd2), atol=0.01)


def test_nearest_kernel_d_max():
    rng = np.random.default_rng(3)
    a, b, c = tb.create_n_cubes(40)
    scene = build_tight_scene(a, b, c)
    pts = make_points(200, rng)
    bid, bd2 = brute_nearest(pts, a, b, c)
    bd = np.sqrt(bd2)
    d_max = np.full(len(pts), np.median(bd), np.float32)
    sid, dist = nearest_tight(scene, pts, packet=256, d_max=d_max,
                              interpret=True)
    sid, dist = np.asarray(sid), np.asarray(dist)
    inside = bd < d_max * (1.0 - 1e-5)
    outside = bd > d_max * (1.0 + 1e-5)
    assert (sid[inside] >= 0).all()
    assert (sid[outside] == -1).all()
    assert np.isposinf(dist[outside]).all()
    assert np.allclose(dist[inside], bd[inside], rtol=1e-5, atol=1e-5)


def test_nearest_kernel_empty_and_padding():
    a, b, c = tb.create_n_cubes(3)
    scene = build_tight_scene(a, b, c)
    sid, dist = nearest_tight(scene, np.zeros((0, 3), np.float32),
                              interpret=True)
    assert sid.shape == (0,) and dist.shape == (0,)
    # 1 point in a 128-lane packet: padding replicates, result exact
    pts = np.array([[5.0, -3.0, 40.0]], np.float32)
    sid, dist = nearest_tight(scene, pts, packet=128, interpret=True)
    bid, bd2 = brute_nearest(pts, a, b, c)
    assert np.allclose(np.asarray(dist), np.sqrt(bd2), rtol=1e-5)


def test_nearest_wide_leaf_sparse_accuracy():
    """Regression: wide leaves on SPARSE scenes give cluster frames
    spanning ~1e4 units; the old |p'|^2 + (a'a' - 2a'p') distance form
    cancelled two ~span^2 terms and could report d=0 for points 20+
    units from everything. The componentwise |v e1 + w e2 - q|^2 form
    must stay within ~1e-2 of the oracle at every leaf width."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    a, b, c = tb.create_n_cubes(90)
    cen = (a + b + c) / 3.0
    idx = rng.integers(0, len(cen), 512)
    pts = (cen[idx]
           + rng.normal(scale=25.0, size=(512, 3))).astype(np.float32)
    bid, bd2 = brute_nearest(pts, a, b, c)
    bd = np.sqrt(bd2)
    for w in (64, 128):
        scene = build_tight_scene(a, b, c, leaf_size=w)
        sid, dist = nearest_tight(scene, pts, packet=128, interpret=True)
        assert np.abs(np.asarray(dist) - bd).max() < 1e-2


def test_nearest_counters_sane():
    rng = np.random.default_rng(9)
    a, b, c = tb.create_n_cubes(64)
    scene = build_tight_scene(a, b, c)
    pts = make_points(256, rng)
    visits, fires = count_visits_nearest(scene, pts, packet=128,
                                         interpret=True)
    assert visits.shape == (2,)
    assert (visits >= 1).all()
    assert (fires >= 1).all()  # every packet must reach at least one leaf
    # wide walk (the default): one iteration can narrowphase up to K=16
    # leaves; entry/exit: at most one fire per visit
    assert (fires <= visits * 16).all()
    ve, fe = count_visits_nearest(scene, pts, packet=128, interpret=True,
                                  wide=False)
    assert (fe <= ve).all()
    assert (visits <= ve).all()  # wide amortizes the serial unit
    # pruning must beat brute force: fires bounded well below cluster count
    assert fires.sum() < 2 * scene.num_clusters
