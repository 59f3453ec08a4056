"""Cluster scene preparation for the Pallas trace kernel.

Triangles are Morton-sorted and grouped into clusters of 128 (one VPU lane
per triangle). A small binned-SAH BVH is built over the cluster AABBs — its
node table is tiny (2*C-1 nodes) and lives in SMEM inside the kernel, where
scalar reads cost a few cycles. Triangle vertices are stored
cluster-relative (a' = a - cluster_centroid) so the MXU bilinear forms keep
O(1) magnitudes even for scenes at +/-100k coordinates.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..bvh.sah_build import build_sah
from ..testbase import tri_aabbs

CLUSTER = 128  # triangles per cluster == VPU lane count
TIGHT = 16  # triangles per tight cluster (16 lanes; 8 clusters share a VPU row)
GROUP = 128 // TIGHT  # tight clusters packed per 128-lane group row


class ClusterScene(NamedTuple):
    """Device-ready tables for the packet trace kernel (numpy until shipped)."""

    smem_nodes: np.ndarray  # [8, Nc] f32: amin(3), amax(3), entry, exit
    smem_cc: np.ndarray  # [4, C] f32 cluster centroids (row 3 unused pad)
    tris_rel: np.ndarray  # [C, 16, 128] f32 rows: a'(3) e1(3) e2(3) pad(7)
    tri_map: np.ndarray  # [C * 128] i32: lane -> original triangle id (-1 pad)
    num_clusters: int
    num_nodes: int
    relative: bool = True  # triangle rows stored cluster-relative

    @property
    def num_tris(self) -> int:
        return int((self.tri_map >= 0).sum())


def _morton10(x: np.ndarray) -> np.ndarray:
    v = x.astype(np.uint32)
    v = (v | (v << 16)) & np.uint32(0x030000FF)
    v = (v | (v << 8)) & np.uint32(0x0300F00F)
    v = (v | (v << 4)) & np.uint32(0x030C30C3)
    v = (v | (v << 2)) & np.uint32(0x09249249)
    return v


def build_cluster_scene(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, relative: bool = True
) -> ClusterScene:
    """Host-side prep: Morton-sort, clusterize, build the cluster-level BVH.

    ``relative=False`` stores global-frame vertices (skips the per-cluster ray
    transform in the kernel — faster, but loses ~7 bits of precision on scenes
    with 1e5-scale coordinates; fine for compact scenes).
    """
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = np.asarray(c, np.float32)
    n = a.shape[0]
    if n == 0:
        raise ValueError("empty scene")

    centroid = (a + b + c) / np.float32(3.0)
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    q = (centroid - lo) / np.maximum(hi - lo, 1e-30)
    grid = np.clip((q * 1024.0).astype(np.int64), 0, 1023).astype(np.uint32)
    codes = (
        (_morton10(grid[:, 0]).astype(np.uint64) << np.uint64(2))
        | (_morton10(grid[:, 1]).astype(np.uint64) << np.uint64(1))
        | _morton10(grid[:, 2]).astype(np.uint64)
    )
    order = np.argsort(codes, kind="stable")

    pad = (-n) % CLUSTER
    n_pad = n + pad
    cidx = np.full(n_pad, -1, np.int64)
    cidx[:n] = order
    a_s = np.full((n_pad, 3), 1.0e30, np.float32)
    b_s = np.full((n_pad, 3), 1.0e30, np.float32)
    c_s = np.full((n_pad, 3), 1.0e30, np.float32)
    a_s[:n], b_s[:n], c_s[:n] = a[order], b[order], c[order]

    C = n_pad // CLUSTER
    # cluster AABBs over real triangles only
    mn, mx = tri_aabbs(a_s[:n], b_s[:n], c_s[:n])
    mn_pad = np.full((n_pad, 3), np.inf, np.float32)
    mx_pad = np.full((n_pad, 3), -np.inf, np.float32)
    mn_pad[:n], mx_pad[:n] = mn, mx
    cl_min = mn_pad.reshape(C, CLUSTER, 3).min(axis=1)
    cl_max = mx_pad.reshape(C, CLUSTER, 3).max(axis=1)
    cc = ((cl_min + cl_max) * 0.5).astype(np.float32)

    # cluster-level SAH BVH; leaves encode -(cluster+1) in entry
    flat, _ = build_sah(cl_min, cl_max)
    nc = flat.num_nodes
    entry = np.asarray(flat.entry, np.float32).copy()
    leaf = np.asarray(flat.entry) < 0
    entry[leaf] = -(np.asarray(flat.shape)[leaf].astype(np.float32) + 1.0)
    smem_nodes = np.zeros((8, nc), np.float32)
    smem_nodes[0:3] = np.asarray(flat.aabb_min).T
    smem_nodes[3:6] = np.asarray(flat.aabb_max).T
    smem_nodes[6] = entry
    smem_nodes[7] = np.asarray(flat.exit, np.float32)

    smem_cc = np.zeros((4, C), np.float32)
    smem_cc[0:3] = cc.T

    # cluster-relative triangle rows (or global when relative=False)
    ccl = np.repeat(cc, CLUSTER, axis=0) if relative else np.float32(0.0)  # [n_pad, 3]
    a_rel = a_s - ccl
    e1 = b_s - a_s
    e2 = c_s - a_s
    # keep padding lanes degenerate: e1 = e2 = 0 => det = 0 => culled
    if pad:
        a_rel[n:] = 0.0
        e1[n:] = 0.0
        e2[n:] = 0.0
    tris_rel = np.zeros((C, 16, CLUSTER), np.float32)
    tris_rel[:, 0:3] = a_rel.reshape(C, CLUSTER, 3).transpose(0, 2, 1)
    tris_rel[:, 3:6] = e1.reshape(C, CLUSTER, 3).transpose(0, 2, 1)
    tris_rel[:, 6:9] = e2.reshape(C, CLUSTER, 3).transpose(0, 2, 1)

    tri_map = np.full(n_pad, -1, np.int32)
    tri_map[:n] = order.astype(np.int32)

    return ClusterScene(smem_nodes, smem_cc, tris_rel, tri_map, C, nc, relative)


def bilinear_blocks(av, e1, e2, xp=np):
    """Per-triangle Moller-Trumbore bilinear forms: [n, 4, 16] (block, row).

    Blocks are (det, u, v, t) rows such that ``block . lp`` with the kernel's
    per-ray vector lp = [d, m - c x d, o - c, 1, 0...] yields det, u*det,
    v*det, t*det (see ops/trace.py narrowphase). Everything here depends only
    on the triangle (cluster-relative a' and edges), so the whole matrix is
    precomputable at scene build — in float64 on host — instead of being
    re-derived inside the kernel at every leaf visit.
    """
    p = xp.cross(e2, e1)
    q = xp.cross(e2, av)
    r = xp.cross(e1, av)
    nrm = xp.cross(e1, e2)
    an = (av * nrm).sum(axis=1)[..., None]
    z3 = xp.zeros_like(p)
    z1 = xp.zeros_like(an)
    z7 = xp.concatenate([z3, z3, z1], axis=1)
    det = xp.concatenate([p, z3, z7, z3], axis=1)
    u = xp.concatenate([-q, e2, z7, z3], axis=1)
    v = xp.concatenate([r, -e1, z7, z3], axis=1)
    t = xp.concatenate([z3, z3, nrm, -an, z3, z3], axis=1)
    return xp.stack([det, u, v, t], axis=1)  # [n, 4, 16]


def pack_bgroups(blocks, C: int, W: int, xp=np):
    """Packs [C*W, 4, 16] bilinear blocks into kernel rows [Gb, 16, row_w].

    Per cluster the matrix is [16 rows, 4W cols], column = block*W + tri;
    clusters pack ``128 // (4W)`` per 128-lane row (2 at W=16, else 1 row or
    a 4W-lane row per cluster).
    """
    b = blocks.reshape(C, W, 4, 16).transpose(0, 2, 1, 3).reshape(C, 4 * W, 16)
    per_row = max(128 // (4 * W), 1)
    row_w = 4 * W * per_row
    Gb = -(-C // per_row)
    pad = Gb * per_row - C
    if pad:
        b = xp.concatenate([b, xp.zeros((pad, 4 * W, 16), b.dtype)], axis=0)
    return (b.reshape(Gb, per_row, 4 * W, 16).transpose(0, 3, 1, 2)
            .reshape(Gb, 16, row_w))


class TightScene(NamedTuple):
    """Device tables for the tight-cluster trace kernel (``ops/trace.py``).

    The loose-Morton ``ClusterScene`` groups 128 triangles per leaf, which in
    sparse scenes produces leaf AABBs thousands of units wide around unit-scale
    geometry — every packet then funnels through the 128-wide narrowphase.
    Here leaves are *SAH-cut* clusters of at most ``TIGHT``=16 triangles: the
    binary SAH tree over all triangles (the same splits as the reference's
    build, ``src/bvh/bvh_node.rs:183-279``) is cut at subtrees of <=16 shapes,
    so a leaf box is as tight as the reference's own subtree boxes. The upper
    BVH over cluster AABBs lives in SMEM; triangles are packed 8 clusters to a
    128-lane VPU row and stored cluster-relative.
    """

    smem_nodes: np.ndarray  # [8, Nn] f32: amin(3), amax(3), entry, exit
    groups: np.ndarray  # [G, 16, 128] f32 rows: a'(3) e1(3) e2(3) pad(7); lane = (cluster % (128//W))*W + tri
    tri_map: np.ndarray  # [C * W] i32 lane -> original triangle id (-1 pad)
    num_clusters: int
    num_nodes: int
    width: int = TIGHT  # triangles per cluster (16 or 32)
    bgroups: np.ndarray | None = None  # [Gb, 16, row_w] precomputed bilinear forms (see pack_bgroups)
    sweep_nodes: np.ndarray | None = None  # [8, Ns] coarse table for the gate sweep (~8x leaf cut)
    packed_nodes: np.ndarray | None = None  # [5, Nn] bf16-pair table (pack_node_table_bf16)
    gnodes: np.ndarray | None = None  # [7K, Gn] wide-tree table (build_wide_table)
    gslot: np.ndarray | None = None  # [C] i32 cluster -> g*K + k (wide seed hints)
    gdepth: int = 0  # wide-tree group-stack depth
    masked: bool = False  # lanes masked out after build (make_updater static
    # part): boxes may cover NO live triangle, so consumers must not treat
    # a box as evidence of contained geometry (nearest disables its
    # farthest-corner bound refinement — unsound on vacated clusters)

    @property
    def num_tris(self) -> int:
        return int((self.tri_map >= 0).sum())


def cut_clusters(flat, leaf_size: int = TIGHT):
    """Cuts a host FlatBvh into maximal subtrees of <= leaf_size shapes.

    Returns (roots, cluster_of_leaf): cluster root node indices in DFS order,
    and for every tree leaf the cluster it belongs to.
    """
    entry = np.asarray(flat.entry)
    exit_ = np.asarray(flat.exit)
    parent = np.asarray(flat.parent)
    idx = np.arange(entry.shape[0], dtype=np.int64)
    count = (exit_ - idx + 1) // 2  # shapes under each node (2k-1 nodes <=> k shapes)
    small = count <= leaf_size
    psmall = np.where(parent >= 0, small[np.maximum(parent, 0)], False)
    roots = np.nonzero(small & ~psmall)[0]  # maximal small subtrees, DFS order
    # Map each leaf node to its cluster: cluster roots partition DFS index
    # space into [root, exit) intervals.
    leaves = np.nonzero(entry == -1)[0]
    cluster_of_leaf = np.searchsorted(roots, leaves, side="right") - 1
    return roots, leaves, cluster_of_leaf


def collapse_upper(nodes: np.ndarray, K: int = 16) -> np.ndarray:
    """Collapse a binary DFS entry/exit node table to (up to) K-ary.

    The stackless entry/exit walk in the trace kernel is arity-agnostic, so
    tree arity is a pure tuning knob: a K-ary tree over C leaves carries
    ~C/(K-1) internal nodes instead of C-1, and — decisively on this
    hardware — every dissolved internal removes one serial visit from the
    packet traversal chain (~100 ns each; see ops/trace.py). Each kept
    internal absorbs children greedily by descending through the
    largest-surface-area binary internals first (big boxes prune worst, so
    they go first); children keep SAH (DFS) order. Measured on the 120k-tri
    reference workload: 20.0k -> 13.7k nodes, random-ray headline +38%,
    aimed all-hit +28% vs the binary table.

    The reference has no analog (its per-ray stack traversal is
    latency-tolerant; src/flat_bvh.rs:396-431 walks a binary tree).

    Input format == output format: [8, nn] f32 rows amin(3) amax(3)
    entry exit, leaves encode payloads as entry < 0. Uses the native
    implementation (csrc/collapse.cpp) when available; the Python path
    below is the differentially-tested reference.
    """
    import heapq

    entry = nodes[6].astype(np.int64)
    exit_ = nodes[7].astype(np.int64)
    nn = nodes.shape[1]
    if nn <= 3 or K <= 2:
        return nodes

    from ..native import collapse_native

    nat = collapse_native(nodes, K)
    if nat is not None:
        return nat

    s = nodes[3:6] - nodes[0:3]
    area = s[0] * s[1] + s[1] * s[2] + s[2] * s[0]

    def kids2(i):
        l = int(entry[i])
        return l, int(exit_[l])

    out_min, out_max, out_pay, out_kids = [], [], [], []
    stack = [(0, -1)]
    while stack:
        i, parent = stack.pop()
        oi = len(out_pay)
        out_min.append(nodes[0:3, i])
        out_max.append(nodes[3:6, i])
        out_pay.append(float(nodes[6, i]) if entry[i] < 0 else 0.0)
        out_kids.append([])
        if parent >= 0:
            out_kids[parent].append(oi)
        if entry[i] >= 0:
            heap: list = []
            leaves_acc: list = []
            cnt = 0

            def push(j):
                nonlocal cnt
                if entry[j] < 0:
                    leaves_acc.append(j)
                else:
                    heapq.heappush(heap, (-float(area[j]), cnt, j))
                    cnt += 1

            l, r = kids2(i)
            push(l)
            push(r)
            while heap and len(leaves_acc) + len(heap) < K:
                _, _, j = heapq.heappop(heap)
                l, r = kids2(j)
                push(l)
                push(r)
            frontier = leaves_acc + [j for _, _, j in heap]
            frontier.sort()  # restore SAH/DFS order among children
            for j in reversed(frontier):
                stack.append((j, oi))

    nn2 = len(out_pay)
    end = np.zeros(nn2, np.int64)
    for oi in range(nn2 - 1, -1, -1):
        end[oi] = oi + 1 if not out_kids[oi] else end[out_kids[oi][-1]]
    ent = np.zeros(nn2, np.float32)
    for oi in range(nn2):
        ent[oi] = float(out_kids[oi][0]) if out_kids[oi] else out_pay[oi]
    tab = np.zeros((8, nn2), np.float32)
    tab[0:3] = np.stack(out_min, axis=1)
    tab[3:6] = np.stack(out_max, axis=1)
    tab[6] = ent
    tab[7] = end.astype(np.float32)
    return tab


def _bucket(n: int, floor: int) -> int:
    """Shape-bucketed size: ceil ``n`` to a multiple of a 1/8-granularity
    power-of-two bucket (>= ``floor``).

    THE single source of truth for table-shape bucketing: the SMEM budget
    check, the node-table pad, the sweep-table pad and the group-row pad all
    go through here so the budget check always matches what actually ships
    to the kernel (a drifted copy would mis-gate the raise/widen decision).
    """
    b = max(floor, 1 << max(int(n).bit_length() - 3, 0))
    return -(-int(n) // b) * b


WIDE_K = 16  # children per wide-tree group (bits of the fired mask)


def build_wide_table(smem_nodes: np.ndarray, num_clusters: int,
                     K: int = WIDE_K):
    """Converts a binary DFS entry/exit upper table into the GROUP-WALK
    tables: a K-ary wide tree with near-K fanout at EVERY level.

    Motivation (measured; see ops/trace.py): a traversal visit costs
    ~160-195 ns of *serial* SMEM->vector->reduce->select chain regardless
    of its vector work, so the only lever is amortizing that chain over
    many boxes. The group-walk kernel tests all K children of one wide
    node in a single iteration and reduces them to ONE K-bit fired mask
    (one reduce consumer instead of K).

    Construction is a hierarchical cut of the binary SAH tree (same move
    as ``cut_clusters``, applied level over level): repeatedly mark the
    current frontier (first the cluster leaves, then the group roots) and
    take every MAXIMAL subtree containing <= K marks as the next level's
    group, dissolving ALL binary internals inside it. Every group's
    children are real frontier members, so fanout is ~K/2..K everywhere
    and the serial chain is amortized ~K ways at every level. (The
    round-2 frontier-expansion version left bottom internals with 2-3
    leaf children as their own groups — 3600 groups for 10k clusters,
    blowing the SMEM budget; this cut yields ~C/12.)

    Layout (all-static row indexing inside the kernel):
      gnodes [7K+1, Gn] f32 — per group g, child k at rows 7k..7k+6:
        amin(3), amax(3), payload. payload < 0 => leaf: -(cluster+1);
        payload >= 0 => the child's own group id. Empty slots hold NaN
        boxes (the slab test's NaN => miss makes them unfireable) and
        payload -1. Row 7K is the group's LEAF MASK (bit k set iff slot
        k is a leaf) — the walk narrowphases all fired leaf bits inside
        the descend region and carries only interior bits on its stack.
        The hierarchical cut makes children single-kind per group (all
        leaves or all groups), so the mask is all-or-nothing today; the
        kernel handles mixed masks anyway.
      gslot [num_clusters] i32 — cluster -> g*K + k (seed-hint addressing).
      depth — group-stack depth (kernel scratch must cover it).

    Children keep DFS (SAH) order, so the mask's lowest-set-bit walk
    visits them in the order the binary walk would (pruning behavior
    class unchanged; results bit-identical to the entry/exit kernel).

    Reference analog being re-designed: the one-box-per-step flat walk,
    /root/reference/src/flat_bvh.rs:396-431.
    """
    from ..native import build_wide_native

    nat = build_wide_native(smem_nodes, num_clusters, K)
    if nat is not None:
        return nat  # (gnodes, gslot, depth) — identical to the path below

    entry = smem_nodes[6].astype(np.int64)
    exit_ = smem_nodes[7].astype(np.int64)
    nn = smem_nodes.shape[1]

    if entry[0] < 0:
        # single-leaf tree: one group whose only child is the root
        Gn = _bucket(1, 8)
        gnodes = np.full((7 * K + 1, Gn), np.nan, np.float32)
        gnodes[6:7 * K:7, :] = -1.0
        gnodes[7 * K, :] = 0.0
        gnodes[0:6, 0] = smem_nodes[0:6, 0]
        gnodes[6, 0] = smem_nodes[6, 0]
        gnodes[7 * K, 0] = 1.0  # leaf mask: bit 0
        gslot = np.zeros(num_clusters, np.int32)
        gslot[int(-smem_nodes[6, 0]) - 1] = 0
        return gnodes, gslot, 1

    # parents from the DFS entry/exit layout. The input is the BINARY SAH
    # table (pre-collapse), so every internal has exactly two children:
    # left = entry[i], right = exit of the left subtree — two scatters.
    parent = np.full(nn, -1, np.int64)
    internal = np.nonzero(entry >= 0)[0]
    l = entry[internal]
    r = exit_[l]
    assert (r < exit_[internal]).all(), "build_wide_table needs a binary table"
    parent[l] = internal
    parent[r] = internal

    idx = np.arange(nn, dtype=np.int64)
    marks = np.nonzero(entry < 0)[0]  # level 0: cluster leaves, DFS order
    levels = [marks]
    while not (len(marks) == 1 and marks[0] == 0):
        cnt = np.searchsorted(marks, exit_) - np.searchsorted(marks, idx)
        small = cnt <= K
        psmall = np.where(parent >= 0, small[np.maximum(parent, 0)], False)
        roots = np.nonzero(small & ~psmall & (cnt >= 1))[0]
        assert len(roots) < len(marks) or (len(roots) == 1), \
            "hierarchical cut made no progress"
        levels.append(roots)
        marks = roots
    depth = len(levels) - 1

    # Group ids are level-major, top level (the root group) first, within a
    # level in DFS order — the kernel never walks by id (the mask drives
    # visit order), it only needs gid 0 == root and parent payload == the
    # child's gid. Everything below is vectorized: per level, each previous-
    # level mark is a child of exactly ONE root, in order, so the child
    # list of level j IS levels[j-1] and the per-child (group, slot)
    # coordinates fall out of a running count.
    n_groups = sum(len(lv) for lv in levels[1:])
    offset = np.zeros(depth + 1, np.int64)  # level -> first gid
    acc = 0
    for lvl in range(depth, 0, -1):
        offset[lvl] = acc
        acc += len(levels[lvl])

    Gn = _bucket(n_groups, 8)
    gnodes = np.full((7 * K + 1, Gn), np.nan, np.float32)
    gnodes[6:7 * K:7, :] = -1.0  # empty-slot payload: leaf 0 (unfireable)
    gnodes[7 * K, :] = 0.0  # leaf masks
    gslot = np.zeros(num_clusters, np.int32)
    gflat = gnodes.reshape(-1)
    for lvl in range(depth, 0, -1):
        roots = levels[lvl]
        prev = levels[lvl - 1]
        lo = np.searchsorted(prev, roots)
        hi = np.searchsorted(prev, exit_[roots])
        counts = hi - lo
        assert counts.min() >= 1 and counts.max() <= K, (counts.min(), counts.max())
        g = offset[lvl] + np.repeat(np.arange(len(roots), dtype=np.int64), counts)
        k = np.arange(len(prev), dtype=np.int64) - np.repeat(lo, counts)
        ch = prev  # the concatenated child list, in order
        rows = (7 * k)[:, None] + np.arange(6)[:, None].T  # [n_ch, 6]
        gflat[(rows * Gn + g[:, None]).reshape(-1)] = \
            smem_nodes[0:6, ch].T.reshape(-1)
        if lvl == 1:
            pay = smem_nodes[6, ch].astype(np.float32)  # -(cluster+1)
            gslot[(-pay).astype(np.int64) - 1] = (g * K + k).astype(np.int32)
            np.add.at(gnodes[7 * K], g, (1 << k).astype(np.float32))
        else:
            pay = (offset[lvl - 1]
                   + np.arange(len(prev), dtype=np.int64)).astype(np.float32)
        gflat[(7 * k + 6) * Gn + g] = pay
    return gnodes, gslot, depth



def wide_group_meta(gnodes: np.ndarray):
    """Host parse of a wide-walk table: ``(parent, depth, anc)`` per group.

    ``parent[g]``/``depth[g]`` are int64 (root 0: parent -1, depth 0);
    ``anc[g, d]`` is g's ancestor at depth d (-1 past g's own depth, and g
    itself at d == depth[g]). Shape-bucket pad columns (never referenced by
    any payload) get parent -1/depth 0. Feeds the per-packet subtree-entry
    planner (``ops/trace.py::make_planner``).
    """
    gn = np.asarray(gnodes)
    K = (gn.shape[0] - 1) // 7
    Gn = gn.shape[1]
    pay = gn[6:7 * K:7, :]  # [K, Gn] child payloads
    inner = np.isfinite(pay) & (pay >= 0)
    _, gs = np.nonzero(inner)
    ch = pay[inner].astype(np.int64)
    parent = np.full(Gn, -1, np.int64)
    parent[ch] = gs
    # the builder emits parents before children (root is group 0)
    assert (parent[ch] < ch).all(), "wide table is not parent-first"
    depth = np.zeros(Gn, np.int64)
    order = np.argsort(ch)  # ids ascend => parents resolved before children
    for g in ch[order]:
        depth[g] = depth[parent[g]] + 1
    D = int(depth.max()) + 1
    anc = np.full((Gn, D), -1, np.int64)
    anc[np.arange(Gn), depth] = np.arange(Gn)
    for g in ch[order]:
        d = depth[g]
        anc[g, :d] = anc[parent[g], :d]
    return parent, depth, anc


def _pad_node_table(smem_nodes: np.ndarray, bucket: int = 2048,
                    target: int | None = None) -> np.ndarray:
    """Pads the SMEM node table to a bucket multiple of columns.

    Kernel compiles are keyed on operand shapes, and the remote Mosaic
    compile takes 10s-3min — so a per-frame rebuild that shifts the node
    count by a handful would otherwise recompile the trace kernel every
    frame. Pad columns are a single extra visit: the traversal reaches
    column ``nn`` (the first pad) via the real tree's final exit pointer,
    and the pad's entry==exit==table-width ends the walk whatever its slab
    test says (entry > 0 also keeps it off every leaf path).
    """
    nn = smem_nodes.shape[1]
    B = target if target is not None else -(-nn // bucket) * bucket
    assert B >= nn, (B, nn)
    if B == nn:
        return smem_nodes
    pad = np.zeros((8, B - nn), np.float32)
    pad[0:3] = 1.0e30  # point box far away (never a useful hit)
    pad[3:6] = 1.0e30
    pad[6] = float(B)  # entry: not a leaf, walks off the end
    pad[7] = float(B)
    return np.concatenate([smem_nodes, pad], axis=1)


def build_tight_scene(
    a: np.ndarray, b: np.ndarray, c: np.ndarray, leaf_size: int | None = None,
    config=None, use_native: bool = True, collapse: int | None = 16,
    bmat: bool | None = None, sweep_cut: int | None = None,
    packed: bool = False, wide: bool = True,
) -> TightScene:
    """Host prep for the tight-cluster kernel: SAH build, cut, pack, upper BVH.

    ``leaf_size`` (16/32/64/128 triangles per cluster) defaults to 16,
    widening when the upper tree's SMEM node table would exceed the ~640KB
    scalar memory budget (with collapse: > ~20k clusters / 320k triangles).
    Sparse scenes want small leaves (tight boxes around isolated geometry);
    dense connected meshes trace faster with 64-128 (fewer, still-tight
    leaves => far fewer broadphase visits).

    ``collapse``: upper-tree arity (see ``collapse_upper``); None keeps the
    binary tree. The default 16 measured fastest across the reference
    workloads (random headline +38%, aimed +28%).

    ``bmat``: precompute the narrowphase bilinear forms (``bilinear_blocks``)
    at build time so every leaf visit skips the in-kernel matrix
    construction (256 B/triangle of VMEM). Measured SLOWER on TPU v5e
    (latency-bound fetch) — opt-in only; default (None) stays off.

    Tie/near-tie shape_id class: the closest-hit kernel packs the lane
    index into the low 7 bits of the f32 distance key (ops/trace.py), so
    when two hits' distances agree within ~128 ulps the winning
    ``shape_id`` depends on intra-cluster lane ORDER. ``use_native``'s
    cluster_hint (and any rebuild across versions) reorders lanes within a
    cluster, so such near-tie rays may report a different (equally valid)
    shape_id between ``use_native=True`` and ``False``. Tests must not
    assert exact id equality across build paths — compare ``t`` (exact)
    and treat ids as interchangeable within the tie class.
    """
    from ..config import DEFAULT_CONFIG
    from ..native import (build_sah_auto, cut_tight_native, pack_tight_native,
                          tri_aabbs_native)

    if config is None:
        config = DEFAULT_CONFIG
    # contiguous upfront: callers often pass strided views (tris[:, 0, :]),
    # and every native entry would otherwise re-copy them (measured ~4 ms
    # of ascontiguousarray per 120k build)
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    c = np.ascontiguousarray(c, np.float32)
    n = a.shape[0]
    if n == 0:
        raise ValueError("empty scene")
    if bmat is None:
        # measured on TPU v5e: the precomputed-form path is ~2x SLOWER than
        # in-kernel construction (random 2.77 -> 1.51 M rays/s) — the leaf
        # visit is latency-bound, not matrix-build-bound. Opt-in only.
        bmat = False
    auto = leaf_size is None
    if auto:
        leaf_size = TIGHT if n <= (300_000 if collapse else 160_000) else 32
    if leaf_size not in (16, 32, 64, 128):
        raise ValueError("leaf_size must be 16/32/64/128 (VPU lane packing)")
    mnmx = tri_aabbs_native(a, b, c) if use_native else None
    mn, mx = mnmx if mnmx is not None else tri_aabbs(a, b, c)
    # the numpy pack (and the bmat tables) need the leaf->cluster map;
    # the native pack derives it from the DFS ranges on the fly
    native_pack = use_native and not bmat
    # FASTEST path (csrc bvh_build_sah_clusters): the tight scene only
    # consumes the cluster cut, bounds, and intra-cluster DFS order — the
    # full ~2n-1-node lower tree exists only to be dissolved. The
    # cluster-stopping build emits exactly those, bit-identical to
    # hint-build + cut (below the hint median splits never reorder).
    # Needs a flat tree anyway when sweep_cut asks for a second cut or the
    # numpy pack runs (packed/bmat).
    fast = native_pack and not sweep_cut and not packed
    flat = None
    if not fast:
        if use_native:
            # cluster_hint: everything below the <=leaf_size cluster cut is
            # dissolved by the pack (the kernel narrowphases all W lanes of
            # a leaf at once), so the native builder median-splits that
            # region instead of paying the 6-bucket SAH sweep on ~15/16 of
            # the internal nodes — same cluster sets/bounds, ~2x faster
            # host build at 120k. Lane order within a cluster is
            # median-order (result class unchanged: closest-hit min-reduces
            # over all lanes).
            flat, _ = build_sah_auto(mn, mx, config, cluster_hint=leaf_size)
        else:
            flat, _ = build_sah(mn, mx, config)

    # Build the upper tree (with K-ary collapse) at the current leaf width;
    # widen auto-sized leaves until the SMEM node table (32 bytes/node) fits
    # the ~640KB scalar-memory budget. Collapse shrinks the table ~32%, so
    # W=16 stretches to roughly twice the triangle count it used to.
    while True:
        cl_res = None
        if fast:
            from ..native import build_sah_clusters_native

            cl_res = build_sah_clusters_native(mn, mx, leaf_size)
            if cl_res is None:
                # library predates the entry: fall back to the full build
                fast = False
                flat, _ = build_sah_auto(mn, mx, config,
                                         cluster_hint=leaf_size)
        if cl_res is not None:
            cl_min, cl_max, tri_order_n, cl_off_n = cl_res
            C = cl_min.shape[0]
            roots = None
        else:
            roots = cut_tight_native(flat.entry, flat.exit, leaf_size) \
                if native_pack else None
            if roots is None:
                native_pack = False
                roots, leaves, cluster_of_leaf = cut_clusters(flat, leaf_size)
            C = roots.shape[0]

            # Cluster AABBs and centers from the cut roots (tight by
            # construction).
            cl_min = np.asarray(flat.aabb_min)[roots]
            cl_max = np.asarray(flat.aabb_max)[roots]
        if packed:
            # the packed kernel's frame origin is the raw packed f32 value
            # of rows 0-2 at the leaf column (~the bf16 min corner); pack
            # the group rows against the bit-identical host values
            lo0 = _bf16_round_down(cl_min)
            hi0 = _bf16_round_up(cl_max)
            w = (lo0.view(np.int32) & np.int32(~0xFFFF)) | (
                (hi0.view(np.int32) >> 16) & np.int32(0xFFFF))
            cc = w.astype(np.int32).view(np.float32).astype(np.float32)
        else:
            cc = ((cl_min + cl_max) * 0.5).astype(np.float32)

        # Upper BVH over cluster AABBs -> SMEM table; leaves encode -(cluster+1).
        if use_native:
            up, _ = build_sah_auto(cl_min, cl_max, config)
        else:
            up, _ = build_sah(cl_min, cl_max, config)
        nn = up.num_nodes
        entry = np.asarray(up.entry, np.float32).copy()
        leaf_m = np.asarray(up.entry) < 0
        entry[leaf_m] = -(np.asarray(up.shape)[leaf_m].astype(np.float32) + 1.0)
        smem_nodes = np.zeros((8, nn), np.float32)
        smem_nodes[0:3] = np.asarray(up.aabb_min).T
        smem_nodes[3:6] = np.asarray(up.aabb_max).T
        smem_nodes[6] = entry
        smem_nodes[7] = np.asarray(up.exit, np.float32)
        smem_binary = smem_nodes  # pre-collapse binary table (wide-tree input)
        if collapse:
            smem_nodes = collapse_upper(smem_nodes, collapse)
            nn = smem_nodes.shape[1]
        # the budget check must cover what actually ships: the shape-bucket
        # padding below can add up to ~12.5% columns. The limit is the
        # largest padded table VERIFIED on hardware (20480 cols x 32 B =
        # 655,360 ran all of round 2; 1.25 MB fails to compile) plus a
        # small margin.
        nn_pad = _bucket(nn, 256)
        node_bytes = 20 if packed else 32
        over = nn_pad * node_bytes > 660_000
        if over and not auto:
            # explicit leaf_size: interpret-mode tests would pass but the
            # kernel fails at launch on real hardware (SMEM prefetch budget)
            raise ValueError(
                f"leaf_size={leaf_size} puts {nn_pad} (padded) upper nodes "
                f"({nn_pad * node_bytes} B) over the ~660KB SMEM "
                "scalar-prefetch budget; use a larger leaf_size or "
                "leaf_size=None (auto)")
        if over and auto and leaf_size >= 128:
            # even the widest leaves cannot fit one SMEM table: silently
            # shipping an over-budget table would pass interpret-mode tests
            # and fail at kernel launch on hardware with an opaque Mosaic
            # error — fail loudly at build instead
            raise ValueError(
                f"scene needs {nn_pad} (padded) upper nodes even at "
                f"leaf_size=128 ({nn_pad * node_bytes} B > ~660KB SMEM "
                "scalar-prefetch budget); split the scene with "
                "build_chained_scene")
        if not over:
            break
        leaf_size *= 2

    # shape-bucket the node table so same-class rebuilds reuse the compiled
    # trace kernel (see _pad_node_table); ~12.5% max overhead, one extra visit
    smem_nodes = _pad_node_table(
        smem_nodes, target=_bucket(int(smem_nodes.shape[1]), 256))

    # Group-walk (wide-tree) tables: K-ary frontier cut of the BINARY upper
    # tree (collapse_upper leaves bottom internals binary; the wide kernel
    # wants exactly-K groups everywhere). Falls back to the entry/exit
    # kernel (gnodes=None) if the wide table would not fit the SMEM budget
    # or the group stack (never at the scene sizes one SMEM table allows).
    gnodes = gslot = None
    gdepth = 0
    if wide and not packed:
        gnodes, gslot, gdepth = build_wide_table(smem_binary, C)
        if (gdepth > 14
                or gnodes.shape[0] * gnodes.shape[1] * 4 > 660_000):
            gnodes = gslot = None
            gdepth = 0

    # Optional coarse companion table for the gate sweep
    # (ops/trace.py::_sweep_tight): the same SAH tree cut ``sweep_cut``
    # triangles per box — a CONSERVATIVE miss-test that much cheaper per
    # packet. False positives only cost a redundant main-kernel packet; a
    # sweep miss is an exact guarantee of no narrowphase fire. Measured on
    # the sparse 120k random workload: coarse boxes fire on EVERY packet
    # (useless), so the default (None) sweeps the exact main table; opt in
    # for dense connected meshes where secondary rays leave the surface.
    sweep_nodes = None
    if sweep_cut:
        s_roots = cut_tight_native(flat.entry, flat.exit, sweep_cut) \
            if use_native else None
        if s_roots is None:
            s_roots, _, _ = cut_clusters(flat, sweep_cut)
        s_min = np.asarray(flat.aabb_min)[s_roots]
        s_max = np.asarray(flat.aabb_max)[s_roots]
        if use_native:
            s_up, _ = build_sah_auto(s_min, s_max, config)
        else:
            s_up, _ = build_sah(s_min, s_max, config)
        s_entry = np.asarray(s_up.entry, np.float32).copy()
        s_leaf = np.asarray(s_up.entry) < 0
        s_entry[s_leaf] = -1.0  # sweep leaves carry no payload (fire marker)
        sweep_nodes = np.zeros((8, s_up.num_nodes), np.float32)
        sweep_nodes[0:3] = np.asarray(s_up.aabb_min).T
        sweep_nodes[3:6] = np.asarray(s_up.aabb_max).T
        sweep_nodes[6] = s_entry
        sweep_nodes[7] = np.asarray(s_up.exit, np.float32)
        if collapse:
            sweep_nodes = collapse_upper(sweep_nodes, collapse)
        sweep_nodes = _pad_node_table(
            sweep_nodes, target=_bucket(int(sweep_nodes.shape[1]), 64))

    W = leaf_size
    group = 128 // W
    # G is bucketed like the node table (group-row shape stability).
    G = _bucket((C + group - 1) // group, 16)

    if native_pack:
        # single native pass: lane assignment + cluster-relative rows
        # written directly in the kernel's transposed layout
        groups = np.zeros((G, 16, 128), np.float32)
        tri_map_pad = np.full(G * 128, -1, np.int32)
        if fast:
            from ..native import pack_clusters_native

            ok = pack_clusters_native(a, b, c, tri_order_n, cl_off_n, W, cc,
                                      groups, tri_map_pad)
        else:
            ok = pack_tight_native(a, b, c, flat.shape, flat.entry, flat.exit,
                                   roots, W, cc, groups, tri_map_pad)
        if not ok:
            raise RuntimeError("native pack failed (cluster overflow?)")
        pn = pack_node_table_bf16(smem_nodes) if packed else None
        return TightScene(smem_nodes, groups, tri_map_pad, C, nn, W, None,
                          sweep_nodes, pn, gnodes, gslot, gdepth)

    shape_ids = np.asarray(flat.shape)[leaves]  # tri id per tree leaf, DFS order

    # Per-cluster contiguous triangle lists (DFS leaf order within a cluster).
    counts = np.bincount(cluster_of_leaf, minlength=C)
    assert counts.max() <= leaf_size
    slot = np.arange(leaves.shape[0]) - np.concatenate([[0], np.cumsum(counts)])[cluster_of_leaf]
    lane = cluster_of_leaf * W + slot  # [n] packed lane per triangle
    tri_map = np.full(C * W, -1, np.int32)
    tri_map[lane] = shape_ids.astype(np.int32)

    av = np.zeros((C * W, 3), np.float32)
    e1 = np.zeros((C * W, 3), np.float32)
    e2 = np.zeros((C * W, 3), np.float32)
    ccl = np.repeat(cc, W, axis=0)  # [C*W, 3]
    av[lane] = a[shape_ids] - ccl[lane]
    e1[lane] = b[shape_ids] - a[shape_ids]
    e2[lane] = c[shape_ids] - a[shape_ids]
    rows = np.zeros((G * group * W, 16), np.float32)  # [lane, row]
    rows[: C * W, 0:3] = av
    rows[: C * W, 3:6] = e1
    rows[: C * W, 6:9] = e2
    groups = rows.reshape(G, 128, 16).transpose(0, 2, 1).copy()  # [G, 16, 128]

    tri_map_pad = np.full(G * group * W, -1, np.int32)
    tri_map_pad[: C * W] = tri_map

    bgroups = None
    if bmat:
        blocks = bilinear_blocks(
            av.astype(np.float64), e1.astype(np.float64), e2.astype(np.float64)
        ).astype(np.float32)
        # pad clusters to the group multiple so the refitter's device
        # recompute (over all padded lanes) reproduces the same shape
        C_pad = G * group
        if C_pad > C:
            blocks = np.concatenate(
                [blocks, np.zeros(((C_pad - C) * W, 4, 16), np.float32)], axis=0)
        bgroups = pack_bgroups(blocks, C_pad, W)
    pn = pack_node_table_bf16(smem_nodes) if packed else None
    return TightScene(smem_nodes, groups, tri_map_pad, C, nn, W, bgroups,
                      sweep_nodes, pn, gnodes, gslot, gdepth)


def _pad_wide_table(gnodes: np.ndarray, target: int) -> np.ndarray:
    """Pads a wide-tree table to ``target`` columns (shape bucketing).

    Pad columns are unreachable groups: NaN boxes (unfireable) with
    empty-slot payloads, same as ``build_wide_table`` empty slots.
    """
    Gn = gnodes.shape[1]
    assert target >= Gn, (target, Gn)
    if target == Gn:
        return gnodes
    K = gnodes.shape[0] // 7
    pad = np.full((gnodes.shape[0], target - Gn), np.nan, np.float32)
    pad[6:7 * K:7, :] = -1.0
    pad[7 * K:, :] = 0.0
    return np.concatenate([gnodes, pad], axis=1)


def _repad_tight(s: TightScene, nn_t: int, G_t: int, Gn_t: int = 0) -> TightScene:
    """Re-pads a TightScene's tables to a common (node, group-row) shape.

    ``build_chained_scene`` equalizes all parts through here: per-part SAH
    and cut results can land in different 1/8-granularity buckets, and a
    single diverging part would silently trigger a 10s-3min remote kernel
    recompile. Padding an already-padded node table is safe: the old pad
    block's entry/exit point at the first new pad column, whose entry/exit
    walk off the (new) end — two extra visits total.
    """
    sn = s.smem_nodes
    if sn.shape[1] < nn_t:
        sn = _pad_node_table(sn, target=nn_t)
    g, tm = s.groups, s.tri_map
    if g.shape[0] < G_t:
        g = np.concatenate(
            [g, np.zeros((G_t - g.shape[0], 16, 128), np.float32)], axis=0)
        tm = np.concatenate(
            [tm, np.full((G_t - s.groups.shape[0]) * 128, -1, np.int32)])
    # re-derive the bf16 table only when the node table actually grew
    if s.packed_nodes is not None and sn is not s.smem_nodes:
        pn = pack_node_table_bf16(sn)
    else:
        pn = s.packed_nodes
    bg = s.bgroups
    if bg is not None:
        # (host numpy pack path only) equalize the bilinear-form rows too
        Gb_t = _bucket(G_t * (128 // int(s.width)) // max(128 // (4 * int(s.width)), 1), 1)
        if bg.shape[0] < Gb_t:
            bg = np.concatenate(
                [bg, np.zeros((Gb_t - bg.shape[0],) + bg.shape[1:], np.float32)],
                axis=0)
    gn = s.gnodes
    if gn is not None and Gn_t and gn.shape[1] < Gn_t:
        gn = _pad_wide_table(gn, Gn_t)
    if (sn is s.smem_nodes and g is s.groups and bg is s.bgroups
            and gn is s.gnodes):
        return s
    # num_nodes stays the LOGICAL count (pre-pad), matching build_tight_scene
    return s._replace(smem_nodes=sn, groups=g, tri_map=tm, packed_nodes=pn,
                      bgroups=bg, gnodes=gn)


class ChainedScene(NamedTuple):
    """A big scene as Morton-ordered parts, each a full TightScene.

    The SMEM scalar-prefetch budget caps one TightScene's upper tree at
    ~640KB (~20k nodes => ~320k tris at W=16 with collapse); beyond that the
    round-1 answer was auto-widening leaves, which collapses sparse-scene
    throughput (1M tris = 0.09 M rays/s at W=128). Instead: partition the
    Morton-sorted triangles into contiguous parts (spatially compact by
    construction), build a first-class TightScene per part, and trace parts
    sequentially with the per-ray best-t carried as the next part's t_max —
    the kernel's bounded mode prunes every later part by the best hit so
    far (``ops/trace.py::trace_closest_hit_chained``). Parts are padded to
    the same table buckets, so ONE compiled kernel serves them all.
    """

    parts: tuple  # TightScene per part
    orig_ids: tuple  # [i] int32: part-local triangle id -> global triangle id


def build_chained_scene(a, b, c, max_part: int | None = None,
                        leaf_size: int | None = None, config=None,
                        use_native: bool = True, collapse: int | None = 16,
                        bmat: bool | None = None,
                        packed: bool = False) -> ChainedScene:
    """Partition + per-part SAH build for scenes beyond one SMEM table.

    Parts are equal-size slices of the Morton order (spatially compact by
    construction) and are re-padded to the max table bucket across parts
    after building (``_repad_tight``), so ONE compiled kernel serves every
    part. ``max_part`` bounds triangles per part so W=16 leaves and the
    collapse still fit the SMEM budget.
    """
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    c = np.asarray(c, np.float32)
    n = a.shape[0]
    if n == 0:
        raise ValueError("empty scene")
    if max_part is None:
        # 200k-triangle parts keep W=16 leaves (sparse scenes collapse at
        # wider leaves: 6 W=16 parts = 0.71 M rays/s vs 4 W=32 parts =
        # 0.42 on the 1M random workload). bf16-packed tables fit ~2x the
        # nodes but cost ~+90ns/visit for the vector-domain unpack —
        # measured net slower; packing stays the opt-in capacity hatch.
        max_part = 400_000 if packed else 200_000
    k = -(-n // max_part)
    if k == 1:
        scene = build_tight_scene(a, b, c, leaf_size=leaf_size, config=config,
                                  use_native=use_native, collapse=collapse,
                                  bmat=bmat, packed=packed)
        return ChainedScene((scene,), (np.arange(n, dtype=np.int32),))

    centroid = (a + b + c) / np.float32(3.0)
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    q = (centroid - lo) / np.maximum(hi - lo, 1e-30)
    grid = np.clip((q * 1024.0).astype(np.int64), 0, 1023).astype(np.uint32)
    codes = (
        (_morton10(grid[:, 0]).astype(np.uint64) << np.uint64(2))
        | (_morton10(grid[:, 1]).astype(np.uint64) << np.uint64(1))
        | _morton10(grid[:, 2]).astype(np.uint64)
    )
    order = np.argsort(codes, kind="stable")
    bounds = np.linspace(0, n, k + 1).astype(np.int64)
    parts, ids = [], []
    for i in range(k):
        sel = order[bounds[i]:bounds[i + 1]].astype(np.int32)
        parts.append(build_tight_scene(a[sel], b[sel], c[sel],
                                       leaf_size=leaf_size, config=config,
                                       use_native=use_native,
                                       collapse=collapse, bmat=bmat,
                                       packed=packed))
        ids.append(sel)
    # equalize padded table shapes across parts: per-part SAH results can
    # land in different 1/8-granularity buckets, and each distinct shape
    # is a separate (10s-3min) remote kernel compile
    widths = {int(p.width) for p in parts}
    if len(widths) > 1:
        # auto leaf widening diverged between parts (budget is per-part
        # tree shape); pin every part to the widest so the group-row and
        # narrowphase shapes — and therefore the compiled kernel — match
        w_max = max(widths)
        parts = [p if int(p.width) == w_max else
                 build_tight_scene(a[ids[i]], b[ids[i]], c[ids[i]],
                                   leaf_size=w_max, config=config,
                                   use_native=use_native, collapse=collapse,
                                   bmat=bmat, packed=packed)
                 for i, p in enumerate(parts)]
    nn_t = max(int(p.smem_nodes.shape[1]) for p in parts)
    G_t = max(int(p.groups.shape[0]) for p in parts)
    if all(p.gnodes is not None for p in parts):
        Gn_t = max(int(p.gnodes.shape[1]) for p in parts)
    else:
        Gn_t = 0
        parts = [p._replace(gnodes=None, gslot=None, gdepth=0)
                 for p in parts]
    parts = [_repad_tight(p, nn_t, G_t, Gn_t) for p in parts]
    return ChainedScene(tuple(parts), tuple(ids))


def _bf16_round_down(x: np.ndarray) -> np.ndarray:
    """Largest bf16 <= x (directed rounding; f32 in/out)."""
    x = np.asarray(x, np.float32)
    bits = x.view(np.int32)
    t = bits & np.int32(~0xFFFF)
    xt = t.view(np.float32)
    need = xt > x
    # one bf16 lattice step toward -inf in raw f32 bit space
    down = np.where(t > 0, t - 0x10000,
                    np.where(t == 0, np.int32(np.uint32(0x80010000)),
                             t + np.int32(0x10000))).astype(np.int32)
    out = np.where(need, down, t).astype(np.int32)
    return out.view(np.float32)


def _bf16_round_up(x: np.ndarray) -> np.ndarray:
    """Smallest bf16 >= x (directed rounding; f32 in/out)."""
    x = np.asarray(x, np.float32)
    bits = x.view(np.int32)
    t = bits & np.int32(~0xFFFF)
    xt = t.view(np.float32)
    need = xt < x
    neg0 = np.int32(np.uint32(0x80000000))
    up = np.where(t >= 0, t + 0x10000,
                  np.where(t == neg0, np.int32(0x00010000),
                           t - np.int32(0x10000))).astype(np.int32)
    out = np.where(need, up, t).astype(np.int32)
    return out.view(np.float32)


def pack_node_table_bf16(smem_nodes: np.ndarray) -> np.ndarray:
    """[8, nn] f32 table -> [5, nn] with bf16-pair box rows (conservative).

    Rows 0-2 hold (min, max) per axis as two bf16 halves of one f32 lane
    (min in the high half so a plain truncation ordering survives); rows
    3-4 are entry/exit unchanged. Boxes are rounded OUTWARD (min down, max
    up), so traversal through a packed table visits a superset — never
    misses a hit. 20 B/node instead of 32 lifts the ~625KB SMEM budget to
    ~31k nodes (~400k triangles at W=16), and each visit does 5 scalar
    reads instead of 8.
    """
    nn = smem_nodes.shape[1]
    out = np.zeros((5, nn), np.float32)
    for axis in range(3):
        lo = _bf16_round_down(smem_nodes[axis])
        hi = _bf16_round_up(smem_nodes[3 + axis])
        packed = (lo.view(np.int32) & np.int32(~0xFFFF)) | (
            (hi.view(np.int32) >> 16) & np.int32(0xFFFF))
        out[axis] = packed.astype(np.int32).view(np.float32)
    out[3] = smem_nodes[6]
    out[4] = smem_nodes[7]
    return out


def unpack_node_table_bf16(packed: np.ndarray) -> np.ndarray:
    """Inverse layout transform (boxes stay at bf16 resolution)."""
    nn = packed.shape[1]
    out = np.zeros((8, nn), np.float32)
    for axis in range(3):
        bits = packed[axis].view(np.int32)
        out[axis] = (bits & np.int32(~0xFFFF)).view(np.float32)
        out[3 + axis] = (bits << 16).view(np.float32)
    out[6] = packed[3]
    out[7] = packed[4]
    return out
