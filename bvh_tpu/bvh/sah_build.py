"""Level-synchronous binned-SAH BVH construction (host, vectorized numpy).

The reference builds its tree by depth-first recursion with rayon fork-join
(``src/bvh/bvh_impl.rs:525-543``). That shape is wrong for a data-parallel
machine, so this builder re-architects the *same split algorithm* as a
level-synchronous sweep: at each depth, ALL active segments are binned,
SAH-swept and partitioned at once with segmented reductions — no recursion,
no work-stealing, O(depth) vectorized passes. A native C++ port of the same
algorithm lives in ``csrc/sah_builder.cpp`` (bit-identical outputs, used by
default via ``native.build_sah_auto``); the device-side builder is the LBVH
(``lbvh.py``), which trades SAH quality for one-sort construction.

Split semantics are mirrored exactly from the reference so trees agree
node-for-node (``src/bvh/bvh_node.rs:81-279``):

* split axis = largest axis of the *centroid* bounds (:107)
* degenerate axis (extent < f32 eps) => median split of the current order in
  half, left gets floor(len/2) (:114-124)
* otherwise binned SAH, NUM_BUCKETS=6 (``src/bvh/bucket.rs:5``):
  bucket = floor(rel_centroid * (6 - 0.01)) (:210-217); sweep the 5 planes
  minimizing (n_l*SA_l + n_r*SA_r)/SA_parent with strict '<' (first minimum
  wins, :231-247); the partition is a *stable* grouping by bucket number
  (:250-272 concatenates per-bucket lists in order = stable sort by bucket)
* node layout is depth-first: left child at node_index+1, right child at
  node_index+1+(2*|L|-1) (:136-143); 2n-1 nodes total
* every shape learns its leaf node index (the BHShape backlink, :95-104)

Output is the flat entry/exit representation directly (``flat.py``) — the
pointer tree is never materialized.
"""

from __future__ import annotations

import numpy as np

from ..config import DEFAULT_CONFIG, BvhConfig
from .flat import LEAF, FlatBvh

def _surface_area(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Reference SAH area proxy: 2 * size.dot(size) (src/aabb/aabb_impl.rs:551-554)."""
    s = mx - mn
    return mn.dtype.type(2.0) * np.sum(s * s, axis=-1, dtype=mn.dtype)


def build_sah(
    shape_min: np.ndarray,
    shape_max: np.ndarray,
    config: BvhConfig = DEFAULT_CONFIG,
):
    """Builds a SAH BVH over shapes given by their AABBs.

    Args:
      shape_min, shape_max: [n, D] per-shape AABB corners, float32 or
        float64, any D (the reference is generic over T: BHValue f32/f64 and
        const D, src/bounding_hierarchy.rs:18-46) — the tree is built in the
        input dtype with the matching epsilon.
      config: tunables (bucket count etc.).

    Returns:
      (flat, shape_to_node): a host-side ``FlatBvh`` (numpy arrays) with
      2n-1 nodes in DFS layout, and an [n] int32 array mapping each shape to
      its leaf node index (the ``set_bh_node_index`` backlink).
    """
    shape_min = np.asarray(shape_min)
    dtype = np.float64 if shape_min.dtype == np.float64 else np.float32
    shape_min = shape_min.astype(dtype, copy=False)
    shape_max = np.asarray(shape_max, dtype)
    eps = np.finfo(dtype).eps  # reference: T::epsilon() (bvh_node.rs:114)
    n, d = shape_min.shape
    if n == 0:
        return FlatBvh.empty(d, dtype), np.zeros((0,), np.int32)

    nb = config.num_buckets
    bucket_scale = dtype(nb) - dtype(config.bucket_scale_margin)
    centroid = shape_min * dtype(0.5) + shape_max * dtype(0.5)

    total = 2 * n - 1
    # Per-node records, indexed by BFS creation id; renumbered to DFS at the end.
    node_parent = np.full(total, -1, np.int64)
    node_left = np.full(total, -1, np.int64)  # BFS id of left child
    node_right = np.full(total, -1, np.int64)
    node_shape = np.full(total, -1, np.int64)
    node_amin = np.zeros((total, d), dtype)
    node_amax = np.zeros((total, d), dtype)
    node_nshapes = np.zeros(total, np.int64)  # leaves under this node
    levels: list[np.ndarray] = []  # BFS ids created at each depth

    order = np.arange(n, dtype=np.int64)  # shape index permutation; segments contiguous

    # Active segments at the current level.
    seg_start = np.array([0], np.int64)
    seg_len = np.array([n], np.int64)
    seg_node = np.array([0], np.int64)  # BFS node id of each segment
    # Segment bounds: aabb bounds + centroid bounds (root computed directly,
    # children inherited from the chosen split's bucket joins — identical values).
    seg_amin = shape_min.min(axis=0, keepdims=True)
    seg_amax = shape_max.max(axis=0, keepdims=True)
    seg_cmin = centroid.min(axis=0, keepdims=True)
    seg_cmax = centroid.max(axis=0, keepdims=True)

    next_id = 1
    levels.append(np.array([0], np.int64))

    while seg_start.size:
        node_amin[seg_node] = seg_amin
        node_amax[seg_node] = seg_amax
        node_nshapes[seg_node] = seg_len

        # Retire single-shape segments as leaves.
        leaf_mask = seg_len == 1
        if leaf_mask.any():
            ls = seg_start[leaf_mask]
            node_shape[seg_node[leaf_mask]] = order[ls]
        split_mask = ~leaf_mask
        if not split_mask.any():
            break

        s_start = seg_start[split_mask]
        s_len = seg_len[split_mask]
        s_node = seg_node[split_mask]
        s_amin, s_amax = seg_amin[split_mask], seg_amax[split_mask]
        s_cmin, s_cmax = seg_cmin[split_mask], seg_cmax[split_mask]
        m = s_start.size

        # Element-level views: which split-segment each active element is in.
        elem_seg = np.repeat(np.arange(m), s_len)  # [E]
        elem_pos = np.concatenate([np.arange(st, st + ln) for st, ln in zip(s_start, s_len)])
        elem_shape = order[elem_pos]
        e = elem_pos.size

        axis = np.argmax(s_cmax - s_cmin, axis=-1)  # largest centroid axis
        axis_size = (s_cmax - s_cmin)[np.arange(m), axis]
        degen = axis_size < eps

        # Bucket assignment. Degenerate segments median-split by position.
        c_axis = centroid[elem_shape, axis[elem_seg]]
        safe_size = np.where(axis_size == 0.0, dtype(1.0), axis_size)
        rel = (c_axis - s_cmin[elem_seg, axis[elem_seg]]) / safe_size[elem_seg]
        bucket = (rel * bucket_scale).astype(np.int64)
        pos_in_seg = elem_pos - s_start[elem_seg]
        median_bucket = (pos_in_seg >= (s_len[elem_seg] // 2)).astype(np.int64)
        bucket = np.where(degen[elem_seg], median_bucket, bucket)

        # Segmented bucket statistics: counts, aabb joins, centroid-bound joins.
        key = elem_seg * nb + bucket
        cnt = np.zeros(m * nb, np.int64)
        np.add.at(cnt, key, 1)
        bamin = np.full((m * nb, d), np.inf, dtype)
        bamax = np.full((m * nb, d), -np.inf, dtype)
        bcmin = np.full((m * nb, d), np.inf, dtype)
        bcmax = np.full((m * nb, d), -np.inf, dtype)
        np.minimum.at(bamin, key, shape_min[elem_shape])
        np.maximum.at(bamax, key, shape_max[elem_shape])
        np.minimum.at(bcmin, key, centroid[elem_shape])
        np.maximum.at(bcmax, key, centroid[elem_shape])
        cnt = cnt.reshape(m, nb)
        bamin = bamin.reshape(m, nb, d)
        bamax = bamax.reshape(m, nb, d)
        bcmin = bcmin.reshape(m, nb, d)
        bcmax = bcmax.reshape(m, nb, d)

        # Prefix joins over the bucket axis: plane i splits {0..i} | {i+1..}.
        l_cnt = np.cumsum(cnt, axis=1)[:, :-1]  # [m, nb-1]
        r_cnt = s_len[:, None] - l_cnt
        l_amin = np.minimum.accumulate(bamin, axis=1)[:, :-1]
        l_amax = np.maximum.accumulate(bamax, axis=1)[:, :-1]
        l_cmin = np.minimum.accumulate(bcmin, axis=1)[:, :-1]
        l_cmax = np.maximum.accumulate(bcmax, axis=1)[:, :-1]
        r_amin = np.minimum.accumulate(bamin[:, ::-1], axis=1)[:, ::-1][:, 1:]
        r_amax = np.maximum.accumulate(bamax[:, ::-1], axis=1)[:, ::-1][:, 1:]
        r_cmin = np.minimum.accumulate(bcmin[:, ::-1], axis=1)[:, ::-1][:, 1:]
        r_cmax = np.maximum.accumulate(bcmax[:, ::-1], axis=1)[:, ::-1][:, 1:]

        with np.errstate(invalid="ignore"):
            cost = (
                l_cnt.astype(dtype) * _surface_area(l_amin, l_amax)
                + r_cnt.astype(dtype) * _surface_area(r_amin, r_amax)
            ) / _surface_area(s_amin, s_amax)[:, None]
        if config.overlap_penalty:
            # packet-aware term (see BvhConfig.overlap_penalty): overlap box
            # of the candidate children, empty => zero area; measured with
            # the SAME 2*size.dot(size) proxy as _surface_area (the
            # reference's own area measure), not the true 2(xy+yz+zx)
            ov_mn = np.maximum(l_amin, r_amin)
            ov_mx = np.minimum(l_amax, r_amax)
            ov_sz = np.maximum(ov_mx - ov_mn, dtype(0.0))
            ov_sa = dtype(2.0) * np.sum(ov_sz * ov_sz, axis=-1, dtype=dtype)
            cost = cost + (dtype(config.overlap_penalty)
                           * s_len[:, None].astype(dtype) * ov_sa
                           / _surface_area(s_amin, s_amax)[:, None])
        # A plane with an empty side costs 0*inf = NaN in the reference too and
        # is never selected (NaN < min is false); make that explicit for argmin.
        cost = np.where((l_cnt == 0) | (r_cnt == 0), np.inf, cost)
        min_bucket = np.argmin(cost, axis=1)  # first minimum, like strict '<'
        min_bucket = np.where(degen, 0, min_bucket)

        pick = np.arange(m)
        cl_amin, cl_amax = l_amin[pick, min_bucket], l_amax[pick, min_bucket]
        cl_cmin, cl_cmax = l_cmin[pick, min_bucket], l_cmax[pick, min_bucket]
        cr_amin, cr_amax = r_amin[pick, min_bucket], r_amax[pick, min_bucket]
        cr_cmin, cr_cmax = r_cmin[pick, min_bucket], r_cmax[pick, min_bucket]
        l_count = l_cnt[pick, min_bucket]

        # Stable partition: group by bucket, preserving order within buckets
        # (== the reference's per-bucket list concatenation).
        # Stable sort by (segment, bucket) keeps segments contiguous and orders
        # each segment's elements by bucket with original order within a bucket.
        sort_key = elem_seg * nb + bucket
        perm = np.argsort(sort_key, kind="stable")
        order[elem_pos] = elem_shape[perm]

        # Allocate children (BFS ids: left then right per segment, level order).
        ids = next_id + np.arange(2 * m, dtype=np.int64)
        left_ids, right_ids = ids[0::2], ids[1::2]
        next_id += 2 * m
        node_parent[left_ids] = s_node
        node_parent[right_ids] = s_node
        node_left[s_node] = left_ids
        node_right[s_node] = right_ids
        levels.append(ids)

        # Next level's segments.
        seg_start = np.concatenate([s_start, s_start + l_count])
        seg_len = np.concatenate([l_count, s_len - l_count])
        seg_node = np.concatenate([left_ids, right_ids])
        seg_amin = np.concatenate([cl_amin, cr_amin])
        seg_amax = np.concatenate([cl_amax, cr_amax])
        seg_cmin = np.concatenate([cl_cmin, cr_cmin])
        seg_cmax = np.concatenate([cl_cmax, cr_cmax])

    assert next_id == total, (next_id, total)

    # --- Renumber BFS ids to the DFS layout and derive entry/exit. ---------
    dfs = np.zeros(total, np.int64)
    exit_bfs = np.zeros(total, np.int64)
    exit_bfs[0] = total
    for ids in levels[1:]:
        left_ids, right_ids = ids[0::2], ids[1::2]
        p = node_parent[left_ids]
        dfs[left_ids] = dfs[p] + 1
        dfs[right_ids] = dfs[p] + 1 + (2 * node_nshapes[left_ids] - 1)
        exit_bfs[left_ids] = dfs[right_ids]
        exit_bfs[right_ids] = exit_bfs[p]

    inv = np.empty(total, np.int64)
    inv[dfs] = np.arange(total)  # inv[dfs_id] = bfs_id

    is_internal = node_left[inv] >= 0
    entry = np.where(is_internal, dfs[np.maximum(node_left[inv], 0)], LEAF)
    exit_ = exit_bfs[inv]
    shape_idx = node_shape[inv]
    parent = np.where(dfs[inv] == 0, -1, dfs[np.maximum(node_parent[inv], 0)])

    flat = FlatBvh(
        aabb_min=node_amin[inv],
        aabb_max=node_amax[inv],
        entry=entry.astype(np.int32),
        exit=exit_.astype(np.int32),
        shape=shape_idx.astype(np.int32),
        parent=parent.astype(np.int32),
    )
    shape_to_node = np.full(n, -1, np.int64)
    leaf_nodes = np.nonzero(~is_internal)[0]
    shape_to_node[shape_idx[leaf_nodes]] = leaf_nodes
    return flat, shape_to_node.astype(np.int32)
