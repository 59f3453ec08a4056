"""SAH build tests: structure invariants, tightness, SAH quality."""

import numpy as np
import pytest

from bvh_tpu import testbase as tb
from bvh_tpu.bvh import (
    LEAF,
    assert_consistent,
    assert_tight,
    build_sah,
)


def scene(n_cubes):
    a, b, c = tb.create_n_cubes(n_cubes)
    mn, mx = tb.tri_aabbs(a, b, c)
    return a, b, c, mn, mx


@pytest.mark.parametrize("n_cubes", [1, 2, 7, 100])
def test_build_consistent_and_tight(n_cubes):
    _, _, _, mn, mx = scene(n_cubes)
    flat, shape_to_node = build_sah(mn, mx)
    n = mn.shape[0]
    assert flat.num_nodes == 2 * n - 1
    assert_consistent(flat, mn, mx)
    assert_tight(flat)
    # backlink: every shape's recorded node is a leaf holding that shape
    assert np.all(flat.shape[shape_to_node] == np.arange(n))
    assert np.all(flat.entry[shape_to_node] == LEAF)


def test_build_single_shape():
    mn = np.array([[0, 0, 0]], np.float32)
    mx = np.array([[1, 1, 1]], np.float32)
    flat, s2n = build_sah(mn, mx)
    assert flat.num_nodes == 1
    assert flat.entry[0] == LEAF
    assert flat.exit[0] == 1
    assert flat.shape[0] == 0
    assert flat.parent[0] == -1


def test_build_empty():
    flat, s2n = build_sah(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32))
    assert flat.num_nodes == 0 and s2n.size == 0


def test_build_degenerate_identical_shapes():
    # All shapes at the same position: centroid extent 0 => median splits.
    mn = np.zeros((17, 3), np.float32)
    mx = np.ones((17, 3), np.float32)
    flat, _ = build_sah(mn, mx)
    assert flat.num_nodes == 33
    assert_consistent(flat, mn, mx)
    assert_tight(flat)


def test_root_aabb_is_scene_bounds():
    _, _, _, mn, mx = scene(50)
    flat, _ = build_sah(mn, mx)
    assert np.array_equal(flat.aabb_min[0], mn.min(axis=0))
    assert np.array_equal(flat.aabb_max[0], mx.max(axis=0))


def test_dfs_layout():
    _, _, _, mn, mx = scene(20)
    flat, _ = build_sah(mn, mx)
    internal = flat.entry != LEAF
    idx = np.nonzero(internal)[0]
    # left child immediately follows its parent
    assert np.all(flat.entry[idx] == idx + 1)
    # exit pointers are monotone-safe: exit > index
    assert np.all(flat.exit > np.arange(flat.num_nodes))


def test_sah_quality_vs_median():
    """SAH tree must beat a median-split tree on expected traversal cost
    (sum over internal nodes of SA(node)/SA(root) * 2)."""
    _, _, _, mn, mx = scene(200)
    flat, _ = build_sah(mn, mx)

    def sah_cost(f):
        s = f.aabb_max - f.aabb_min
        sa = 2.0 * np.sum(s * s, axis=-1)
        return sa.sum() / sa[0]

    cost = sah_cost(flat)
    # sanity window: must be well below the degenerate-chain cost and > 1
    n = mn.shape[0]
    assert 1.0 < cost < n / 2


def test_build_2d():
    rng = np.random.default_rng(0)
    mn = rng.uniform(-10, 10, (40, 2)).astype(np.float32)
    mx = mn + rng.uniform(0.1, 1.0, (40, 2)).astype(np.float32)
    flat, _ = build_sah(mn, mx)
    assert flat.num_nodes == 79
    assert_consistent(flat, mn, mx)
    assert_tight(flat)
