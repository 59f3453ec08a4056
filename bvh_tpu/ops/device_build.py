"""Device-side TightScene construction — rebuild-per-frame inside jit.

The host SAH path (``cluster.build_tight_scene``) gives the best trees for
static scenes; dynamic scenes want construction ON the TPU so per-frame
rebuilds never leave the device. The full-triangle device LBVH
(``bvh.lbvh.build_lbvh``) is gather-bound at scene scale (each of its
~depth masked sweeps gathers [2n-1, 8] rows); building over 16-triangle
Morton clusters instead shrinks every sweep 16x:

  1. Morton-sort triangle centroids (one device argsort),
  2. segment 16 consecutive triangles per cluster (tight-ish boxes: Morton
     neighbors are spatial neighbors),
  3. Karras LBVH over the C = n/16 cluster AABBs (the only tree build),
  4. emit the kernel's SMEM entry/exit table + packed 128-lane group rows.

Leaf quality is below the host SAH cut (loose Morton clusters vs SAH-cut
subtrees), the usual LBVH-vs-SAH tradeoff the reference documents for its
own refit path (src/bvh/optimization.rs). Re-designs the reference's
build-over-and-over usage (Bvh::build per frame) for the TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..bvh.lbvh import build_lbvh, morton_codes
from .cluster import TIGHT, TightScene, bilinear_blocks, pack_bgroups

_INF = np.float32(np.inf)  # plain scalar: a jnp array here would initialize
# the XLA backend at import, breaking jax.distributed.initialize-first

_LAYOUT_CACHE: dict = {}


def _grid_layout(C: int, F: int = 16):
    """Static DFS entry/exit layout of a fixed-fanout Morton hierarchy.

    The tree shape depends only on the cluster count: leaves 0..C-1 (Morton
    order), each level-k node spans F consecutive level-(k-1) nodes, up to a
    root. Returns numpy constants (gather_level, gather_idx, entry, exit,
    total): column t of the SMEM table holds level `gather_level[t]` node
    `gather_idx[t]`; entry/exit are fully precomputed (leaf payloads are
    -(cluster+1)). Cached per (C, F) — host cost is O(total) once.
    """
    key = (C, F)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None:
        return hit
    sizes = [C]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // F))
    L = len(sizes)  # level count; level 0 = leaves, level L-1 = root (size 1)

    glevel, gidx, entry, exit_ = [], [], [], []

    def emit(level, idx):
        t = len(glevel)
        glevel.append(level)
        gidx.append(idx)
        if level == 0:
            entry.append(-(idx + 1.0))
            exit_.append(0.0)  # patched below
            return t
        entry.append(0.0)
        exit_.append(0.0)
        first = None
        lo = idx * F
        hi = min(lo + F, sizes[level - 1])
        for j in range(lo, hi):
            ct = emit(level - 1, j)
            if first is None:
                first = ct
        entry[t] = float(first)
        return t

    import sys

    sys.setrecursionlimit(max(10000, C))
    emit(L - 1, 0)
    total = len(glevel)
    # exits: preorder DFS => exit[t] = t + subtree size (memoized per
    # (level, idx) — ragged last children make it non-uniform per level)
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def subsize(level, idx):
        if level == 0:
            return 1
        lo = idx * F
        hi = min(lo + F, sizes[level - 1])
        return 1 + sum(subsize(level - 1, j) for j in range(lo, hi))

    for t in range(total):
        exit_[t] = float(t + subsize(glevel[t], gidx[t]))

    out = (
        np.asarray(glevel, np.int32),
        np.asarray(gidx, np.int32),
        np.asarray(entry, np.float32),
        np.asarray(exit_, np.float32),
        sizes,
    )
    _LAYOUT_CACHE[key] = out
    return out


def _grid_wide_meta(C: int, F: int = 16):
    """Static wide-walk (group) topology of the fixed-fanout grid
    hierarchy — the device-build analog of ``cluster.build_wide_table``.

    The grid tree is ALREADY F-ary with a shape that depends only on the
    cluster count, so the whole gnodes table except the boxes is a host
    constant: returns ``(template [7F+1, Gn] f32, box_sel [n_occ] i32,
    scat_idx [n_occ*6] i32, gslot [C] i32, depth)``. ``box_sel`` indexes
    the concatenated level-box array the grid build already computes
    (level-k node j at level_off[k] + j); ``scat_idx`` are the template's
    flat positions of each occupied slot's 6 box rows. gid 0 is the root
    group (the kernel's entry point); children keep Morton (DFS) order so
    results stay bit-identical to the entry/exit walk. Cached per (C, F).
    """
    key = ("wide", C, F)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None:
        return hit
    sizes = [C]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // F))
    L = len(sizes)
    # group levels are 1..L-1; root group first (gid 0), deeper levels after
    if L == 1:  # single cluster: one group whose only child is the cluster
        Gn = 8
        template = np.full((7 * F + 1, Gn), np.nan, np.float32)
        template[6:7 * F:7, :] = -1.0
        template[7 * F, :] = 0.0
        template[6, 0] = -1.0  # -(cluster 0 + 1)
        template[7 * F, 0] = 1.0  # leaf mask bit 0
        box_sel = np.zeros(1, np.int32)  # level-0 node 0
        scat_idx = (np.arange(6) * Gn).astype(np.int32)
        out = (template, box_sel, scat_idx, np.zeros(1, np.int32), 1)
        _LAYOUT_CACHE[key] = out
        return out
    offs = np.zeros(L, np.int64)  # level -> first gid (root level first)
    acc = 0
    for lvl in range(L - 1, 0, -1):
        offs[lvl] = acc
        acc += sizes[lvl]
    n_groups = acc
    Gn = max(8, -(-n_groups // 8) * 8)
    template = np.full((7 * F + 1, Gn), np.nan, np.float32)
    template[6:7 * F:7, :] = -1.0  # empty-slot payload
    template[7 * F, :] = 0.0  # leaf masks
    level_off = np.zeros(L, np.int64)  # level-box array offsets
    for k in range(1, L):
        level_off[k] = level_off[k - 1] + sizes[k - 1]
    sel_parts, scat_parts = [], []
    for lvl in range(1, L):
        n_g = sizes[lvl]
        n_ch = sizes[lvl - 1]
        ch = np.arange(n_ch, dtype=np.int64)
        g = offs[lvl] + ch // F
        k = ch % F
        if lvl == 1:
            template[(7 * k + 6), g] = -(ch + 1.0)  # leaf payload
            np.add.at(template[7 * F], g, (1 << k).astype(np.float32))
        else:
            template[(7 * k + 6), g] = (offs[lvl - 1] + ch).astype(np.float32)
        sel_parts.append(level_off[lvl - 1] + ch)
        rows6 = (7 * k)[:, None] + np.arange(6)[None, :]
        scat_parts.append((rows6 * Gn + g[:, None]).reshape(-1))
        del n_g
    box_sel = np.concatenate(sel_parts).astype(np.int32)
    scat_idx = np.concatenate(scat_parts).astype(np.int32)
    gslot = ((offs[1] + np.arange(C) // F) * F
             + np.arange(C) % F).astype(np.int32)
    out = (template, box_sel, scat_idx, gslot, L - 1)
    _LAYOUT_CACHE[key] = out
    return out


@partial(jax.jit, static_argnames=("fanout", "wide"))
def _grid_upper(cl_min: jnp.ndarray, cl_max: jnp.ndarray, fanout: int = 16,
                wide: bool = False):
    """SMEM table of the fixed-fanout hierarchy over Morton-ordered clusters.

    All control flow is host-side constants; on device this is log_F(C)
    reshape-reductions plus one gather — no Karras sweeps, no sort beyond
    the triangle Morton sort that ordered the clusters. ``wide=True`` also
    fills the static group-walk template (``_grid_wide_meta``) from the
    same level boxes and returns ``(smem_nodes, gnodes)``.
    """
    C = cl_min.shape[0]
    glevel, gidx, entry, exit_, sizes = _grid_layout(C, fanout)
    # level boxes, padded to F multiples with empty boxes
    mins = [cl_min]
    maxs = [cl_max]
    for k in range(1, len(sizes)):
        prev_n = sizes[k - 1]
        padn = sizes[k] * fanout
        pm = jnp.full((padn, 3), _INF).at[:prev_n].set(mins[-1])
        px = jnp.full((padn, 3), -_INF).at[:prev_n].set(maxs[-1])
        mins.append(pm.reshape(sizes[k], fanout, 3).min(axis=1))
        maxs.append(px.reshape(sizes[k], fanout, 3).max(axis=1))
    # flat gather: level-k node idx lives at offset[k] + idx
    off = np.zeros(len(sizes), np.int64)
    for k in range(1, len(sizes)):
        off[k] = off[k - 1] + sizes[k - 1]
    all_min = jnp.concatenate(mins, axis=0)
    all_max = jnp.concatenate(maxs, axis=0)
    sel = jnp.asarray(off[glevel] + gidx, jnp.int32)
    tmin = all_min[sel]
    tmax = all_max[sel]
    # empty columns (clusters past the live set under valid_in, and any
    # internal node over only-empty children) hold inverted (+inf, -inf)
    # boxes — which the kernels' FMA slab form FIRES (tmin=-inf, tmax=+inf),
    # so every packet walked and narrowphased the whole empty capacity of a
    # partially-filled delta part. NaN boxes are the unfireable convention
    # (NaN comparisons are false): a 120/1200-filled delta measured 75 ->
    # ~10 fires/packet with this.
    empty = jnp.any(tmin > tmax, axis=1, keepdims=True)
    nan = jnp.float32(jnp.nan)
    tmin = jnp.where(empty, nan, tmin)
    tmax = jnp.where(empty, nan, tmax)
    smem_nodes = jnp.concatenate([
        tmin.T, tmax.T,
        jnp.asarray(entry)[None, :],
        jnp.asarray(exit_)[None, :],
    ], axis=0)
    if not wide:
        return smem_nodes
    template, box_sel, scat_idx, _, _ = _grid_wide_meta(C, fanout)
    wmin = all_min[jnp.asarray(box_sel)]
    wmax = all_max[jnp.asarray(box_sel)]
    wempty = jnp.any(wmin > wmax, axis=1, keepdims=True)
    wmin = jnp.where(wempty, nan, wmin)
    wmax = jnp.where(wempty, nan, wmax)
    vals = jnp.concatenate([wmin, wmax], axis=1).reshape(-1)
    gnodes = (jnp.asarray(template).reshape(-1)
              .at[jnp.asarray(scat_idx)].set(vals)
              .reshape(template.shape))
    return smem_nodes, gnodes


@partial(jax.jit, static_argnames=("width", "upper", "bmat", "wide"))
def _build_core(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray, width: int = TIGHT,
                upper: str = "grid", bmat: bool = False,
                valid_in: jnp.ndarray | None = None, wide: bool = False):
    """Jittable core: returns (smem_nodes, groups, tri_map[, bgroups][, gnodes]).

    ``valid_in``: optional [n] bool — triangles marked False are excluded
    (they sort to the end, their lanes go degenerate, and their tri_map
    entries are -1). Lets callers build over a runtime-sized subset of a
    fixed-shape buffer (the per-frame delta part in ``ops/update.py``).

    ``wide``: grid upper only — also emit the group-walk table (appended
    last) so the scene traces the K-ary wide kernel; gslot/gdepth are the
    host constants from ``_grid_wide_meta`` (callers attach them).
    """
    n = a.shape[0]
    W = width
    group = 128 // W
    C = -(-n // W)  # clusters (static: derived from shapes)
    n_pad = C * W
    G = -(-C // group)

    centroid = (a + b + c) * jnp.float32(1.0 / 3.0)
    if valid_in is not None:
        # excluded tris must not pollute the quantization bounds or clusters
        cfin = jnp.where(valid_in[:, None], centroid, jnp.nan)
        lo = jnp.nan_to_num(jnp.nanmin(cfin, axis=0), nan=0.0)
        hi = jnp.nan_to_num(jnp.nanmax(cfin, axis=0), nan=0.0)
        codes = morton_codes(centroid, lo, hi)
        codes = jnp.where(valid_in, codes, jnp.int32(0x7FFFFFFF))
    else:
        lo = centroid.min(axis=0)
        hi = centroid.max(axis=0)
        codes = morton_codes(centroid, lo, hi)
    order = jnp.argsort(codes, stable=True).astype(jnp.int32)

    pad = n_pad - n
    if pad:
        order_p = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)])
    else:
        order_p = order
    valid = order_p >= 0
    if valid_in is not None:
        valid = valid & valid_in[jnp.maximum(order_p, 0)]
        order_p = jnp.where(valid, order_p, -1)
    safe = jnp.maximum(order_p, 0)
    a_s = a[safe]
    b_s = b[safe]
    c_s = c[safe]

    # per-triangle AABBs; padding lanes excluded from cluster boxes
    mn = jnp.minimum(jnp.minimum(a_s, b_s), c_s)
    mx = jnp.maximum(jnp.maximum(a_s, b_s), c_s)
    mn = jnp.where(valid[:, None], mn, _INF)
    mx = jnp.where(valid[:, None], mx, -_INF)
    cl_min = mn.reshape(C, W, 3).min(axis=1)
    cl_max = mx.reshape(C, W, 3).max(axis=1)
    cc = (cl_min + cl_max) * 0.5

    # upper tree over cluster AABBs -> SMEM entry/exit table
    gnodes = None
    if upper == "grid":
        if wide:
            smem_nodes, gnodes = _grid_upper(cl_min, cl_max, wide=True)
        else:
            smem_nodes = _grid_upper(cl_min, cl_max)
    else:  # Karras LBVH (adaptive splits; slower build, comparable trace)
        flat, _ = build_lbvh(cl_min, cl_max)
        is_leaf = flat.entry < 0
        entry = jnp.where(is_leaf, -(flat.shape.astype(jnp.float32) + 1.0),
                          flat.entry.astype(jnp.float32))
        smem_nodes = jnp.concatenate([
            flat.aabb_min.T,
            flat.aabb_max.T,
            entry[None, :],
            flat.exit.astype(jnp.float32)[None, :],
        ], axis=0)  # [8, 2C-1]

    # packed group rows: cluster-relative a', e1, e2 (pad lanes degenerate)
    ccl = jnp.repeat(cc, W, axis=0)  # [n_pad, 3]
    av = jnp.where(valid[:, None], a_s - ccl, 0.0)
    e1 = jnp.where(valid[:, None], b_s - a_s, 0.0)
    e2 = jnp.where(valid[:, None], c_s - a_s, 0.0)
    rows = jnp.zeros((G * group * W, 16), jnp.float32)
    rows = rows.at[:n_pad, 0:3].set(av)
    rows = rows.at[:n_pad, 3:6].set(e1)
    rows = rows.at[:n_pad, 6:9].set(e2)
    groups = rows.reshape(G, 128, 16).transpose(0, 2, 1)  # [G, 16, 128]

    tri_map = jnp.full((G * group * W,), -1, jnp.int32)
    tri_map = tri_map.at[:n_pad].set(order_p)
    out = [smem_nodes, groups, tri_map]
    if bmat:
        C_pad = G * group
        pad_l = C_pad * W - n_pad
        if pad_l:
            z = jnp.zeros((pad_l, 3), jnp.float32)
            av, e1, e2 = (jnp.concatenate([x, z], axis=0)
                          for x in (av, e1, e2))
        blocks = bilinear_blocks(av, e1, e2, jnp)
        out.append(pack_bgroups(blocks, C_pad, W, jnp))
    if gnodes is not None:
        out.append(gnodes)
    return tuple(out)


def _grid_wide_ok(C: int, F: int = 16) -> bool:
    """Grid-built scenes get the group-walk table when it fits the SMEM
    scalar-prefetch budget (it replaces the entry/exit table as the wide
    kernel's only SMEM operand) and the fixed kernel stack depth.
    Pure arithmetic on the ceil-div level-size chain — must NOT call
    ``_grid_wide_meta`` (that would materialize and cache ~60 B/cluster
    of template arrays just to answer False for huge scenes)."""
    sizes = [C]
    while sizes[-1] > 1:
        sizes.append(-(-sizes[-1] // F))
    depth = max(len(sizes) - 1, 1)
    n_groups = max(sum(sizes[1:]), 1)
    Gn = max(8, -(-n_groups // 8) * 8)
    return depth <= 14 and (7 * F + 1) * Gn * 4 <= 660_000


def build_tight_scene_device(a, b, c, width: int = TIGHT,
                             upper: str = "grid",
                             bmat: bool | None = None) -> TightScene:
    """On-device TightScene build (Morton clusters + fixed-fanout upper tree).

    Arrays stay on device; the returned scene plugs straight into
    ``trace_closest_hit_tight`` / ``trace_any_hit_tight``. Use the host
    ``build_tight_scene`` for static scenes (better tree), this for
    per-frame rebuilds of deforming geometry. ``upper``: "grid" (default,
    fixed 16-ary Morton hierarchy, fastest build) or "lbvh" (Karras).

    Grid builds also carry the K-ary group-walk tables (the 16-ary grid
    maps 1:1 onto the wide kernel's group format; topology is a host
    constant, boxes fill on device), so device-built scenes trace the
    same fast walk as host-built ones.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    n = a.shape[0]
    if n == 0:
        raise ValueError("empty scene")
    if width not in (16, 32, 64, 128):
        raise ValueError("width must be 16/32/64/128 (VPU lane packing)")
    if bmat is None:
        bmat = False  # measured slower on TPU v5e (see cluster.py note)
    C = -(-n // width)
    wide = upper == "grid" and not bmat and _grid_wide_ok(C)
    out = _build_core(a, b, c, width, upper, bmat, wide=wide)
    smem_nodes, groups, tri_map = out[:3]
    bgroups = out[3] if bmat else None
    if upper == "grid":
        nn = int(_grid_layout(C)[0].shape[0])
    else:
        nn = 2 * C - 1 if C > 1 else 1
    gnodes = gslot = None
    gdepth = 0
    if wide:
        gnodes = out[-1]
        _, _, _, gslot_np, gdepth = _grid_wide_meta(C)
        gslot = jnp.asarray(gslot_np)
    return TightScene(smem_nodes, groups, tri_map, C, nn, width, bgroups,
                      gnodes=gnodes, gslot=gslot, gdepth=gdepth)


def build_chained_scene_device(a, b, c, max_part: int = 200_000,
                               width: int = TIGHT, upper: str = "grid"):
    """On-device chained build: rebuild-per-frame beyond one SMEM table.

    The device analog of ``cluster.build_chained_scene`` (host SAH): one
    global Morton sort partitions the triangles into equal contiguous
    slices (spatially compact by construction); every part is built by the
    jittable ``_build_core`` over a same-shape gathered slice, so ALL parts
    share one compiled build program and one compiled trace kernel. Trace
    with ``trace_closest_hit_chained`` / ``trace_any_hit_chained``.

    Part quality matches ``build_tight_scene_device`` (Morton clusters +
    fixed-fanout upper tree — the LBVH-vs-SAH tradeoff documented there);
    use the host chained build for static scenes.
    """
    from ..bvh.lbvh import morton_codes as _morton
    from .cluster import ChainedScene

    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    c = jnp.asarray(c, jnp.float32)
    n = a.shape[0]
    if n == 0:
        raise ValueError("empty scene")
    P = -(-n // max_part)
    if P <= 1:
        scene = build_tight_scene_device(a, b, c, width=width, upper=upper)
        return ChainedScene((scene,), (jnp.arange(n, dtype=jnp.int32),))
    sz = -(-n // P)

    centroid = (a + b + c) * jnp.float32(1.0 / 3.0)
    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    order = jnp.argsort(_morton(centroid, lo, hi), stable=True).astype(jnp.int32)
    pad = P * sz - n
    if pad:
        order = jnp.concatenate([order, jnp.full((pad,), -1, jnp.int32)])

    C = -(-sz // width)
    if upper == "grid":
        nn = int(_grid_layout(C)[0].shape[0])
    else:
        nn = 2 * C - 1 if C > 1 else 1
    wide = upper == "grid" and _grid_wide_ok(C)
    if wide:
        _, _, _, gslot_np, gdepth = _grid_wide_meta(C)
        gslot = jnp.asarray(gslot_np)
    parts, ids = [], []
    for p in range(P):
        sel = jax.lax.dynamic_slice_in_dim(order, p * sz, sz)
        valid = sel >= 0
        safe = jnp.maximum(sel, 0)
        out = _build_core(a[safe], b[safe], c[safe], width, upper, False,
                          valid_in=valid, wide=wide)
        smem_nodes, groups, tri_map = out[:3]
        parts.append(TightScene(
            smem_nodes, groups, tri_map, C, nn, width,
            gnodes=out[-1] if wide else None,
            gslot=gslot if wide else None,
            gdepth=gdepth if wide else 0))
        ids.append(sel)
    return ChainedScene(tuple(parts), tuple(ids))


def make_refitter(scene: TightScene):
    """Device refitter for a TightScene: same topology, new vertex positions.

    The per-frame path for deforming geometry: keeps the (host-SAH-quality)
    cluster assignment and upper-tree topology, recomputing on device only
    what moved — packed group rows, cluster AABBs, and every upper node's
    box. Internal boxes are interval-reductions of leaf boxes over the
    node's DFS range (exit pointers give the range), evaluated with a
    log2(nn)-level sparse table: ~14 elementwise min/max passes + two
    gathers, no sequential sweeps. The tree stays *consistent and tight*
    after any deformation (the contract of the reference's
    ``Bvh::update_shapes``, src/bvh/optimization.rs); quality degrades only
    as far as the topology no longer matches the geometry — rebuild on host
    occasionally, refit every frame.

    Returns ``refit(a, b, c) -> TightScene`` (jittable; tri_map shared).

    The refit scene drops ``sweep_nodes`` (its boxes would be stale — a
    conservative gate over MOVED geometry must come from the new boxes;
    the sweep then falls back to the main table, still exact) and
    ``packed_nodes`` (device-side directed bf16 rounding is not
    implemented; the refit scene traces through the f32 table). The wide
    group-walk table (``gnodes``) IS refit — fixed topology, boxes
    recomputed by a segment reduce over the refitted cluster boxes — so
    refitted scenes keep the group-walk fast path.

    Precision class (documented tolerance): the group rows are re-encoded
    against the REFIT cluster-box centers. When churn drags a stale
    cluster's box (members moved apart), the frame shift ``a - cc`` grows
    and with it the narrowphase rounding — a small fraction (~1% at 30%
    churn on the ±100k random scenes) of grazing-incidence hits can flip
    vs a fresh build. Integer-coordinate (grid-mode) scenes stay exact
    (the frame arithmetic is exact in f32), which is what the fuzzer
    asserts. ``make_updater`` is the precision- AND quality-preserving
    update path (static rows are never re-encoded).
    """
    entry = np.asarray(scene.smem_nodes[6])
    exit_ = np.asarray(scene.smem_nodes[7]).astype(np.int64)
    nn = entry.shape[0]  # table width (may include shape-bucket pad columns)
    nn_logical = int(scene.num_nodes)
    W = int(scene.width)
    C = int(scene.num_clusters)
    tri_map = jnp.asarray(scene.tri_map)
    n_lanes = int(np.asarray(scene.tri_map).shape[0])
    C_pad = n_lanes // W
    G = n_lanes // 128

    is_leaf = entry < 0
    leaf_cluster = np.where(is_leaf, (-entry - 1).astype(np.int64), 0)
    # sparse-table constants: for column i with interval [i, e), level k and
    # the two window starts i and e - 2^k
    length = np.maximum(exit_ - np.arange(nn), 1)
    kcol = np.floor(np.log2(length)).astype(np.int64)
    k_max = int(kcol.max())
    lo_idx = np.arange(nn)
    hi_idx = exit_ - (1 << kcol)
    flat_lo = kcol * nn + lo_idx
    flat_hi = kcol * nn + np.minimum(hi_idx, nn - 1)

    valid_lane = np.asarray(scene.tri_map) >= 0
    safe_lane = np.maximum(np.asarray(scene.tri_map), 0)
    has_bmat = getattr(scene, "bgroups", None) is not None

    # Wide-walk (group) table refit. Topology is fixed under refit, so each
    # occupied slot's box is a min/max reduce of the refitted cluster boxes
    # over the slot's subtree — a CONTIGUOUS range of upper-tree leaf
    # positions (children keep DFS order, build_wide_table docstring). Host
    # walk recovers leaf order + per-slot ranges once; the device pass is a
    # doubling-table segment reduce plus one scatter into the table. Without
    # this, refitted scenes silently demoted to the entry/exit kernel
    # (gnodes dropped), skewing refit-vs-rebuild comparisons by kernel path.
    gn_host = getattr(scene, "gnodes", None)
    has_wide = gn_host is not None
    if has_wide:
        gn_np = np.asarray(gn_host)
        Kw = (gn_np.shape[0] - 1) // 7
        Gn = gn_np.shape[1]
        pay = gn_np[6:7 * Kw:7, :]  # [K, Gn]
        gmask = gn_np[7 * Kw].astype(np.int64)
        leaf_slot = ((gmask[None, :] >> np.arange(Kw)[:, None]) & 1) > 0
        interior_slot = pay >= 0  # empty slots: payload -1, leaf bit unset
        cl_of = np.where(leaf_slot, (-pay).astype(np.int64) - 1, 0)
        slot_lo = np.zeros((Kw, Gn), np.int64)
        slot_hi = np.zeros((Kw, Gn), np.int64)
        leaf_order: list[int] = []

        def _walk(g: int) -> None:  # DFS over the group tree (depth <= gdepth)
            for k in range(Kw):
                if leaf_slot[k, g]:
                    slot_lo[k, g] = len(leaf_order)
                    leaf_order.append(int(cl_of[k, g]))
                    slot_hi[k, g] = len(leaf_order)
                elif interior_slot[k, g]:
                    slot_lo[k, g] = len(leaf_order)
                    _walk(int(pay[k, g]))
                    slot_hi[k, g] = len(leaf_order)

        _walk(0)
        assert len(leaf_order) == len(set(leaf_order)), \
            "group tree visits a cluster twice"
        occ = leaf_slot | interior_slot
        s_lo = slot_lo[occ]
        s_hi = slot_hi[occ]
        kseg = np.floor(np.log2(s_hi - s_lo)).astype(np.int64)
        kseg_max = int(kseg.max())
        n_leaf_ord = len(leaf_order)
        gseg_lo_j = jnp.asarray(kseg * n_leaf_ord + s_lo, jnp.int32)
        gseg_hi_j = jnp.asarray(kseg * n_leaf_ord + s_hi - (1 << kseg),
                                jnp.int32)
        kk, gg = np.nonzero(occ)
        rows6 = (7 * kk)[:, None] + np.arange(6)[None, :]
        scat_idx_j = jnp.asarray((rows6 * Gn + gg[:, None]).reshape(-1),
                                 jnp.int32)
        leaf_order_j = jnp.asarray(np.asarray(leaf_order), jnp.int32)
        gn_flat_j = jnp.asarray(gn_np.reshape(-1))

    leaf_cluster_j = jnp.asarray(leaf_cluster, jnp.int32)
    is_leaf_j = jnp.asarray(is_leaf)
    flat_lo_j = jnp.asarray(flat_lo, jnp.int32)
    flat_hi_j = jnp.asarray(flat_hi, jnp.int32)
    valid_j = jnp.asarray(valid_lane)
    safe_j = jnp.asarray(safe_lane, jnp.int32)
    entry_j = jnp.asarray(entry)
    exit_j = jnp.asarray(scene.smem_nodes[7])

    @jax.jit
    def refit_core(a, b, c):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        c = jnp.asarray(c, jnp.float32)
        a_l = a[safe_j]
        b_l = b[safe_j]
        c_l = c[safe_j]
        mn = jnp.minimum(jnp.minimum(a_l, b_l), c_l)
        mx = jnp.maximum(jnp.maximum(a_l, b_l), c_l)
        mn = jnp.where(valid_j[:, None], mn, _INF)
        mx = jnp.where(valid_j[:, None], mx, -_INF)
        cl_min = mn.reshape(C_pad, W, 3).min(axis=1)
        cl_max = mx.reshape(C_pad, W, 3).max(axis=1)
        cc = (cl_min + cl_max) * 0.5

        # packed group rows, cluster-relative to the refit centers
        ccl = jnp.repeat(cc, W, axis=0)
        av = jnp.where(valid_j[:, None], a_l - ccl, 0.0)
        e1 = jnp.where(valid_j[:, None], b_l - a_l, 0.0)
        e2 = jnp.where(valid_j[:, None], c_l - a_l, 0.0)
        rows = jnp.zeros((n_lanes, 16), jnp.float32)
        rows = rows.at[:, 0:3].set(av)
        rows = rows.at[:, 3:6].set(e1)
        rows = rows.at[:, 6:9].set(e2)
        groups = rows.reshape(G, 128, 16).transpose(0, 2, 1)

        # upper-table boxes: leaves take their cluster box; internals reduce
        # leaf boxes over their DFS interval via the sparse table
        lmin0 = jnp.where(is_leaf_j[:, None], cl_min[leaf_cluster_j], _INF)
        lmax0 = jnp.where(is_leaf_j[:, None], cl_max[leaf_cluster_j], -_INF)
        tabs_min = [lmin0]
        tabs_max = [lmax0]
        for k in range(1, k_max + 1):
            step = 1 << (k - 1)
            pm = tabs_min[-1]
            px = tabs_max[-1]
            sh_m = jnp.concatenate([pm[step:], jnp.full((step, 3), _INF)], axis=0)
            sh_x = jnp.concatenate([px[step:], jnp.full((step, 3), -_INF)], axis=0)
            tabs_min.append(jnp.minimum(pm, sh_m))
            tabs_max.append(jnp.maximum(px, sh_x))
        allm = jnp.concatenate(tabs_min, axis=0)  # [(k_max+1)*nn, 3]
        allx = jnp.concatenate(tabs_max, axis=0)
        tmin = jnp.minimum(allm[flat_lo_j], allm[flat_hi_j])
        tmax = jnp.maximum(allx[flat_lo_j], allx[flat_hi_j])
        if nn > nn_logical:
            # keep the shape-bucket pad columns bit-identical (their DFS
            # intervals contain no leaves, so the reduction would invert them)
            pad_col = (jnp.arange(nn) >= nn_logical)[:, None]
            tmin = jnp.where(pad_col, jnp.asarray(scene.smem_nodes[0:3]).T, tmin)
            tmax = jnp.where(pad_col, jnp.asarray(scene.smem_nodes[3:6]).T, tmax)
        smem_nodes = jnp.concatenate([
            tmin.T, tmax.T, entry_j[None, :], exit_j[None, :],
        ], axis=0)
        out = [smem_nodes, groups]
        if has_bmat:
            # keep the precomputed narrowphase forms in sync with the new
            # vertices (same shape as the host-built bgroups: C_pad clusters)
            blocks = bilinear_blocks(av, e1, e2, jnp)
            out.append(pack_bgroups(blocks, C_pad, W, jnp))
        if has_wide:
            # segment min/max of refitted cluster boxes over each slot's
            # leaf-order range (doubling tables; overlap is exact for
            # min/max), scattered into the constant-topology group table
            lmn = [cl_min[leaf_order_j]]
            lmx = [cl_max[leaf_order_j]]
            for k in range(1, kseg_max + 1):
                step = 1 << (k - 1)
                pm, px = lmn[-1], lmx[-1]
                shm = jnp.concatenate(
                    [pm[step:], jnp.full((step, 3), _INF)], axis=0)
                shx = jnp.concatenate(
                    [px[step:], jnp.full((step, 3), -_INF)], axis=0)
                lmn.append(jnp.minimum(pm, shm))
                lmx.append(jnp.maximum(px, shx))
            am = jnp.concatenate(lmn, axis=0)
            ax = jnp.concatenate(lmx, axis=0)
            smin_s = jnp.minimum(am[gseg_lo_j], am[gseg_hi_j])  # [n_occ, 3]
            smax_s = jnp.maximum(ax[gseg_lo_j], ax[gseg_hi_j])
            vals = jnp.concatenate([smin_s, smax_s], axis=1).reshape(-1)
            out.append(gn_flat_j.at[scat_idx_j].set(vals)
                       .reshape(gn_np.shape))
        return tuple(out)

    def refit(a, b, c) -> TightScene:
        out = refit_core(a, b, c)
        smem_nodes, groups = out[:2]
        bgroups = out[2] if has_bmat else None
        gnodes_new = out[-1] if has_wide else None
        return TightScene(smem_nodes, groups, tri_map, C, nn_logical, W,
                          bgroups, gnodes=gnodes_new,
                          gslot=scene.gslot if has_wide else None,
                          gdepth=int(getattr(scene, "gdepth", 0))
                          if has_wide else 0)

    refit.core = refit_core  # jit-composable inner (arrays only)
    return refit
