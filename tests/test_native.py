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
