"""Native C++ builder: bit-identical differential test vs the numpy builder."""

import numpy as np
import pytest

from bvh_tpu import testbase as tb
from bvh_tpu.bvh import build_sah
from bvh_tpu.bvh.validate import assert_consistent, assert_tight
from bvh_tpu import native

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native builder not built"
)


@pytest.mark.parametrize("n_cubes", [1, 3, 50, 400])
def test_native_bit_identical(n_cubes):
    a, b, c = tb.create_n_cubes(n_cubes)
    mn, mx = tb.tri_aabbs(a, b, c)
    f_py, s_py = build_sah(mn, mx)
    f_c, s_c = native.build_sah_native(mn, mx)
    for name in f_py._fields:
        assert np.array_equal(
            np.asarray(getattr(f_py, name)), np.asarray(getattr(f_c, name))
        ), name
    assert np.array_equal(s_py, s_c)


def test_native_degenerate_identical_boxes():
    mn = np.zeros((33, 3), np.float32)
    mx = np.ones((33, 3), np.float32)
    f_c, s_c = native.build_sah_native(mn, mx)
    assert_consistent(f_c, mn, mx)
    assert_tight(f_c)
    f_py, s_py = build_sah(mn, mx)
    for name in f_py._fields:
        assert np.array_equal(np.asarray(getattr(f_py, name)), np.asarray(getattr(f_c, name)))


def test_native_multithreaded_matches_serial():
    a, b, c = tb.create_n_cubes(2000)  # large enough to cross the fork cutoff
    mn, mx = tb.tri_aabbs(a, b, c)
    f1, s1 = native.build_sah_native(mn, mx, nthreads=1)
    f8, s8 = native.build_sah_native(mn, mx, nthreads=8)
    for name in f1._fields:
        assert np.array_equal(np.asarray(getattr(f1, name)), np.asarray(getattr(f8, name)))
    assert np.array_equal(s1, s8)


def test_build_sah_auto():
    a, b, c = tb.create_n_cubes(10)
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, s2n = native.build_sah_auto(mn, mx)
    assert flat.num_nodes == 2 * mn.shape[0] - 1


def test_native_pack_bit_identical():
    """csrc/pack.cpp (tri-AABBs, cluster cut, group pack) vs the numpy build
    path. The native tight build median-splits below the cluster cut
    (``cluster_hint``), so intra-cluster LANE ORDER legitimately differs from
    the exact numpy tree; everything order-independent must still match
    bit-for-bit: the upper node table, each cluster's triangle SET, and each
    lane's packed rows (compared after sorting both clusters' lanes by
    triangle id)."""
    import pytest

    from bvh_tpu.native import (cut_tight_native, native_available,
                                pack_tight_native, tri_aabbs_native)
    from bvh_tpu.ops.cluster import build_tight_scene, cut_clusters
    from bvh_tpu.testbase import tri_aabbs

    if not native_available():
        pytest.skip("native library unavailable")

    for nc in (7, 300, 2000):
        a, b, c = tb.create_n_cubes(nc, seed=nc)
        nat = build_tight_scene(a, b, c)
        ref = build_tight_scene(a, b, c, use_native=False)
        assert nat.num_clusters == ref.num_clusters
        assert nat.num_nodes == ref.num_nodes and nat.width == ref.width
        np.testing.assert_array_equal(nat.smem_nodes, ref.smem_nodes)
        W = nat.width
        # [lanes, 16] row-major lane rows for both packs
        rn = np.asarray(nat.groups).transpose(0, 2, 1).reshape(-1, 16)
        rr = np.asarray(ref.groups).transpose(0, 2, 1).reshape(-1, 16)
        tn = np.asarray(nat.tri_map).reshape(-1, W)
        tr = np.asarray(ref.tri_map).reshape(-1, W)
        assert tn.shape == tr.shape
        on = np.argsort(tn, axis=1, kind="stable")
        orr = np.argsort(tr, axis=1, kind="stable")
        np.testing.assert_array_equal(
            np.take_along_axis(tn, on, axis=1),
            np.take_along_axis(tr, orr, axis=1))  # same tri SET per cluster
        ln = (np.arange(tn.shape[0])[:, None] * W + on).reshape(-1)
        lr = (np.arange(tr.shape[0])[:, None] * W + orr).reshape(-1)
        np.testing.assert_array_equal(rn[ln], rr[lr])  # same rows per tri

    # unit pieces: tri AABBs and the cluster cut
    a, b, c = tb.create_n_cubes(500, seed=3)
    mn_n, mx_n = tri_aabbs_native(a, b, c)
    mn_p, mx_p = tri_aabbs(a, b, c)
    np.testing.assert_array_equal(mn_n, mn_p)
    np.testing.assert_array_equal(mx_n, mx_p)
    from bvh_tpu.native import build_sah_auto

    flat, _ = build_sah_auto(mn_p, mx_p)
    roots_n = cut_tight_native(flat.entry, flat.exit, 16)
    roots_p, _, _ = cut_clusters(flat, 16)
    np.testing.assert_array_equal(roots_n, roots_p)


def test_build_sah_auto_keeps_f64_on_numpy_path():
    """f64 inputs must not be silently downcast by the native (f32) builder."""
    from bvh_tpu.native import build_sah_auto

    rng = np.random.default_rng(0)
    mn = rng.uniform(-10, 10, size=(32, 3))
    mx = mn + rng.uniform(0.1, 1.0, size=(32, 3))
    flat, _ = build_sah_auto(mn, mx)
    assert np.asarray(flat.aabb_min).dtype == np.float64
