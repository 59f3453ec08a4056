"""Node-for-node parity: vectorized level-synchronous builder vs a scalar
recursive oracle that directly implements the reference's split semantics
(src/bvh/bvh_node.rs:81-279). If these agree, the vectorization is faithful."""

import numpy as np

from bvh_tpu import testbase as tb
from bvh_tpu.bvh import LEAF, build_sah

NB = 6
EPS = np.float32(np.finfo(np.float32).eps)
SCALE = np.float32(6.0) - np.float32(0.01)


def sa(mn, mx):
    s = (mx - mn).astype(np.float32)
    return np.float32(2.0) * np.float32(np.dot(s, s))


def oracle_build(shape_min, shape_max):
    """Recursive reference-semantics SAH builder (slow, scalar decisions)."""
    n = shape_min.shape[0]
    centroid = shape_min * np.float32(0.5) + shape_max * np.float32(0.5)
    total = 2 * n - 1
    out = {
        "amin": np.zeros((total, 3), np.float32),
        "amax": np.zeros((total, 3), np.float32),
        "entry": np.full(total, LEAF, np.int64),
        "exit": np.zeros(total, np.int64),
        "shape": np.full(total, -1, np.int64),
        "parent": np.full(total, -1, np.int64),
    }

    def rec(indices, node_index, parent, exit_index, amin, amax, cmin, cmax):
        out["parent"][node_index] = parent
        out["exit"][node_index] = exit_index
        out["amin"][node_index] = amin
        out["amax"][node_index] = amax
        if len(indices) == 1:
            out["shape"][node_index] = indices[0]
            return
        axis = int(np.argmax(cmax - cmin))
        size = np.float32(cmax[axis] - cmin[axis])
        if size < EPS:
            half = len(indices) // 2
            li, ri = indices[:half], indices[half:]
            lamin, lamax = shape_min[li].min(0), shape_max[li].max(0)
            ramin, ramax = shape_min[ri].min(0), shape_max[ri].max(0)
            lcmin, lcmax = centroid[li].min(0), centroid[li].max(0)
            rcmin, rcmax = centroid[ri].min(0), centroid[ri].max(0)
        else:
            rel = (centroid[indices, axis] - np.float32(cmin[axis])) / size
            bucket = (rel * SCALE).astype(np.int64)
            best_cost, best_b = np.inf, 0
            for b in range(NB - 1):
                lm = bucket <= b
                nl, nr = int(lm.sum()), int((~lm).sum())
                if nl == 0 or nr == 0:
                    continue
                la = sa(shape_min[indices[lm]].min(0), shape_max[indices[lm]].max(0))
                ra = sa(shape_min[indices[~lm]].min(0), shape_max[indices[~lm]].max(0))
                cost = (np.float32(nl) * la + np.float32(nr) * ra) / sa(amin, amax)
                if cost < best_cost:
                    best_cost, best_b = cost, b
            lm = bucket <= best_b
            # stable grouping by bucket number (reference concatenates
            # per-bucket lists in bucket order)
            order = np.argsort(bucket, kind="stable")
            sorted_idx = indices[order]
            nl = int(lm.sum())
            li, ri = sorted_idx[:nl], sorted_idx[nl:]
            lamin, lamax = shape_min[li].min(0), shape_max[li].max(0)
            ramin, ramax = shape_min[ri].min(0), shape_max[ri].max(0)
            lcmin, lcmax = centroid[li].min(0), centroid[li].max(0)
            rcmin, rcmax = centroid[ri].min(0), centroid[ri].max(0)

        left = node_index + 1
        right = left + 2 * len(li) - 1
        out["entry"][node_index] = left
        rec(li, left, node_index, right, lamin, lamax, lcmin, lcmax)
        rec(ri, right, node_index, exit_index, ramin, ramax, rcmin, rcmax)

    rec(
        np.arange(n),
        0,
        -1,
        total,
        shape_min.min(0),
        shape_max.max(0),
        centroid.min(0),
        centroid.max(0),
    )
    return out


def test_vectorized_matches_recursive_oracle():
    a, b, c = tb.create_n_cubes(40)  # 480 triangles
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    want = oracle_build(mn, mx)
    assert np.array_equal(np.asarray(flat.entry), want["entry"].astype(np.int32))
    assert np.array_equal(np.asarray(flat.exit), want["exit"].astype(np.int32))
    assert np.array_equal(np.asarray(flat.shape), want["shape"].astype(np.int32))
    assert np.array_equal(np.asarray(flat.parent), want["parent"].astype(np.int32))
    assert np.array_equal(np.asarray(flat.aabb_min), want["amin"])
    assert np.array_equal(np.asarray(flat.aabb_max), want["amax"])


def test_oracle_parity_degenerate_mix():
    rng = np.random.default_rng(7)
    mn = rng.uniform(-50, 50, (73, 3)).astype(np.float32)
    mn[20:40] = mn[19]  # a run of identical boxes forces median splits
    mx = mn + 1.0
    flat, _ = build_sah(mn, mx)
    want = oracle_build(mn, mx)
    assert np.array_equal(np.asarray(flat.entry), want["entry"].astype(np.int32))
    assert np.array_equal(np.asarray(flat.exit), want["exit"].astype(np.int32))
    assert np.array_equal(np.asarray(flat.shape), want["shape"].astype(np.int32))
