"""Quality-preserving incremental update — the TPU `update_shapes`.

The reference updates a BVH in place by removing each moved shape and
re-inserting it at the SAH-optimal seam (`/root/reference/src/bvh/
optimization.rs:304-315`); its README shows post-update traversal within
~1.1-1.4x of a full rebuild even at 50% churn (`README.md:217-238`).
Pointer surgery like that is hostile to the TPU (serial, data-dependent),
and plain topology-fixed refit (`device_build.make_refitter`) loses the
quality war: one moved triangle drags its whole cluster box across the
scene (round-2 bench: 2.6x traversal degradation at 1% churn).

The TPU-native equivalent of remove+reinsert is **mask+delta**:

  1. *Remove*: moved triangles' lanes in the static part's packed group
     rows are zeroed (a degenerate triangle never fires Moller-Trumbore).
     Every box table — SMEM entry/exit, wide-group, sweep, bf16-packed —
     is untouched: removing geometry only ever makes boxes conservative,
     so the static part traces at its original host-SAH quality forever.
  2. *Reinsert*: the moved triangles are rebuilt ON DEVICE into a small
     delta part (`device_build._build_core` over a fixed-capacity buffer,
     Morton clusters + fixed-fanout upper tree), the TPU analog of the
     reference's per-shape SAH descent — a fresh tree over exactly the
     shapes that moved.
  3. Trace chained: static part first, carried best-t prunes the delta
     part (`trace.trace_closest_hit_chained`).

Updates are expressed against the ORIGINAL scene with the cumulative
moved set, so per-frame cost is one fixed jitted program: a lane scatter
(~n_lanes x 16 f32) plus a delta build over <= max_moved tris. Rebuild on
host when the cumulative churn approaches max_moved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .cluster import ChainedScene, TIGHT, TightScene
from .device_build import _build_core, _grid_layout

_SMEM_BUDGET = 660_000  # bytes; see cluster.py (measured-safe prefetch cap)
_NODE_BYTES = 32  # [8, nn] f32 grid table


def _delta_layout(max_moved: int, W: int):
    """(slice_cap, D, Cd, nn_d): split the delta-buffer capacity into the
    fewest equal lane-aligned slices whose grid SMEM table each fits the
    scalar-prefetch budget. D == 1 (single delta part) for any max_moved
    up to ~300k at W=16; giant churn sets auto-route to a chained delta
    (the device analog of build_chained_scene_device's equal slicing)."""
    cap = -(-max_moved // W) * W
    D = 1
    while True:
        slice_cap = -(-(cap // D) // W) * W
        Cd = slice_cap // W
        nn_d = int(_grid_layout(Cd)[0].shape[0])
        if nn_d * _NODE_BYTES <= _SMEM_BUDGET or slice_cap == W:
            return slice_cap, D, Cd, nn_d
        D += 1


def make_updater(scene: TightScene, max_moved: int, delta_width: int = TIGHT,
                 max_added: int = 0):
    """Build ``update(a, b, c, moved_idx) -> ChainedScene`` for a TightScene.

    ``a, b, c``: the FULL new vertex arrays ([n, 3] each; unmoved rows may
    hold their old values — only rows listed in ``moved_idx`` are read).
    ``moved_idx``: int32 [max_moved], the cumulative set of triangles that
    moved since the scene was built, padded with -1. Duplicates are
    permitted (the delta part then narrowphases the triangle twice).

    The returned ChainedScene has two parts: the original scene with the
    moved lanes masked out (all box tables intact => original traversal
    quality) and a device-built delta part over the moved triangles. It
    plugs straight into ``trace_closest_hit_chained`` /
    ``trace_any_hit_chained``. Fully jittable; one compile per
    (scene shape-bucket, max_moved) pair.

    Giant churn sets route automatically: when ``max_moved`` exceeds one
    SMEM table (~300k tris at W=16), the delta is Morton-partitioned into
    the fewest equal budget-fitting slices — D same-shape delta parts
    sharing one compiled build/trace program (``_delta_layout``).

    **Scene growth** (the reference's ``add_shape``/``remove_shape``,
    /root/reference/src/bvh/optimization.rs:70-209, 214-301, re-designed
    for fixed-shape jit): pass ``max_added`` > 0 and the updater accepts
    NEW triangle ids in ``moved_idx`` — rows ``n <= id < n + max_added``
    of the (extended) vertex arrays. New triangles build into the delta
    part exactly like moved ones (a device build IS the TPU analog of the
    reference's SAH-guided insertion — a fresh SAH-quality subtree over
    the dynamic set). Removal: pass ``alive=False`` for the entry — the
    triangle's static lane is masked (if it had one) and it is excluded
    from the delta. No host rebuild at any step; capacity is
    ``max_moved + max_added`` delta slots.

    For scenes beyond one SMEM table (ChainedScene), make one updater per
    part and split ``moved_idx`` by part membership.
    """
    tri_map = np.asarray(scene.tri_map)
    n_lanes = tri_map.shape[0]
    n = int(tri_map.max()) + 1
    if max_moved < 1:
        raise ValueError("max_moved must be >= 1")
    if max_added < 0:
        raise ValueError("max_added must be >= 0")
    n_total = n + max_added
    # inverse permutation: original triangle id -> lane. Sized to the GROWN
    # id space: added ids (>= n) must map to the scatter-drop sentinel, not
    # clamp-gather onto some unrelated live lane.
    lanes_of = np.full(n_total, n_lanes, np.int32)  # OOB => scatter-drop
    occ = tri_map >= 0
    lanes_of[tri_map[occ]] = np.nonzero(occ)[0].astype(np.int32)
    lanes_of_j = jnp.asarray(lanes_of)
    max_moved = max_moved + max_added

    G = int(np.asarray(scene.groups).shape[0])
    groups_j = jnp.asarray(scene.groups)
    W = delta_width
    slice_cap, D, Cd, nn_d = _delta_layout(max_moved, W)
    cap = slice_cap * D  # lane-aligned total delta capacity
    # delta parts carry the group-walk tables when they fit (grid topology
    # is a host constant per capacity; boxes fill on device) — without
    # them the delta traced the slower entry/exit walk
    from .device_build import _grid_wide_meta, _grid_wide_ok

    wide_d = _grid_wide_ok(Cd)
    if wide_d:
        _, _, _, gslot_np, gdepth_d = _grid_wide_meta(Cd)
        gslot_d = jnp.asarray(gslot_np)
    else:
        gslot_d, gdepth_d = None, 0

    @jax.jit
    def update_core(a, b, c, moved_idx, alive=None):
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        c = jnp.asarray(c, jnp.float32)
        moved_idx = jnp.asarray(moved_idx, jnp.int32).reshape(-1)
        mvalid = moved_idx >= 0
        safe_m = jnp.maximum(moved_idx, 0)
        # alive=False: mask-only entries (removals) — lane masked below,
        # excluded from the delta build
        dvalid = mvalid if alive is None else (
            mvalid & jnp.asarray(alive, bool).reshape(-1))

        # 1) mask the moved lanes out of the static part's group rows
        # (added ids >= n map to the scatter-drop sentinel in lanes_of)
        lanes = jnp.where(mvalid, lanes_of_j[jnp.minimum(safe_m, n_total - 1)],
                          n_lanes)
        rows = groups_j.transpose(0, 2, 1).reshape(n_lanes, 16)
        rows = rows.at[lanes].set(0.0, mode="drop")
        masked_groups = rows.reshape(G, 128, 16).transpose(0, 2, 1)

        # 2) delta part(s) over the moved triangles (fixed-capacity buffer)
        pad = cap - moved_idx.shape[0]
        if pad:
            z = jnp.zeros((pad,), jnp.int32)
            safe_b = jnp.concatenate([safe_m, z])
            valid_b = jnp.concatenate([dvalid, z.astype(bool)])
        else:
            safe_b, valid_b = safe_m, dvalid
        if D > 1:
            # giant churn: Morton-partition the moved set into D spatially
            # compact equal slices (the chained-build slicing, update-sized)
            from ..bvh.lbvh import morton_codes as _morton
            cm_ = (a[safe_b] + b[safe_b] + c[safe_b]) * jnp.float32(1 / 3)
            cfin = jnp.where(valid_b[:, None], cm_, jnp.nan)
            lo = jnp.nan_to_num(jnp.nanmin(cfin, axis=0), nan=0.0)
            hi = jnp.nan_to_num(jnp.nanmax(cfin, axis=0), nan=0.0)
            codes = jnp.where(valid_b, _morton(cm_, lo, hi),
                              jnp.int32(0x7FFFFFFF))
            ordm = jnp.argsort(codes, stable=True).astype(jnp.int32)
            safe_b = safe_b[ordm]
            valid_b = valid_b[ordm]
        sl_s, sl_v = (safe_b.reshape(D, slice_cap),
                      valid_b.reshape(D, slice_cap))
        outs = [_build_core(a[sl_s[p]], b[sl_s[p]], c[sl_s[p]], W, "grid",
                            False, valid_in=sl_v[p], wide=wide_d)
                for p in range(D)]
        smem_d, groups_d, tmap_d = (jnp.stack([o[i] for o in outs])
                                    for i in range(3))
        gn_d = (jnp.stack([o[-1] for o in outs]) if wide_d
                else jnp.zeros((D,), jnp.float32))
        return masked_groups, smem_d, groups_d, tmap_d, sl_s, gn_d

    def update(a, b, c, moved_idx, alive=None) -> ChainedScene:
        if np.shape(moved_idx)[0] > cap:
            raise ValueError(
                f"{np.shape(moved_idx)[0]} moved ids > capacity {cap} "
                f"(max_moved + max_added); rebuild the scene (or raise them)")
        masked_groups, smem_d, groups_d, tmap_d, sl_s, gn_d = update_core(
            a, b, c, moved_idx, alive)
        # masked=True: vacated clusters keep their (now-stale) boxes, so a
        # box no longer proves live geometry inside — nearest queries must
        # not refine their pruning bound from these boxes
        static = scene._replace(groups=masked_groups, bgroups=None,
                                masked=True)
        parts = [static] + [TightScene(smem_d[p], groups_d[p], tmap_d[p],
                                       Cd, nn_d, W,
                                       gnodes=gn_d[p] if wide_d else None,
                                       gslot=gslot_d, gdepth=gdepth_d)
                            for p in range(D)]
        static_ids = jnp.arange(n, dtype=jnp.int32)
        ids = [static_ids] + [sl_s[p] for p in range(D)]
        return ChainedScene(parts=tuple(parts), orig_ids=tuple(ids))

    update.core = update_core  # jit-composable inner (arrays only)
    update.cap = cap  # delta-buffer geometry, reused by the chained wrapper
    update.delta_shape = (Cd, nn_d, W)
    update.delta_parts = D
    update.delta_wide = (wide_d, gslot_d, gdepth_d)
    return update


def make_chained_updater(chained: ChainedScene, max_moved: int,
                         delta_width: int = TIGHT):
    """Mask+delta update for a ChainedScene (scenes beyond one SMEM table).

    Returns ``update(a, b, c, moved_idx) -> ChainedScene`` where ``a/b/c``
    are the FULL new vertex arrays and ``moved_idx`` is the cumulative
    moved set ([max_moved] i32, -1 padded, GLOBAL triangle ids). Each
    static part gets its moved lanes masked (original SAH quality kept);
    each part's moved triangles are rebuilt on device into a delta part
    traced right after it (spatial coherence keeps the carried best-t
    pruning effective). Every delta shares one fixed capacity, so all
    deltas — and all (same-bucket) statics — reuse one compiled kernel.
    """
    parts = chained.parts
    ids_np = [np.asarray(i) for i in chained.orig_ids]
    n = int(max(i[i >= 0].max() for i in ids_np if (i >= 0).any())) + 1
    part_of = np.full(n, -1, np.int32)
    local_of = np.zeros(n, np.int32)
    for p, ids in enumerate(ids_np):
        v = ids >= 0
        part_of[ids[v]] = p
        local_of[ids[v]] = np.nonzero(v)[0].astype(np.int32)
    part_of_j = jnp.asarray(part_of)
    local_of_j = jnp.asarray(local_of)
    ids_j = [jnp.asarray(i, jnp.int32) for i in chained.orig_ids]
    upds = [make_updater(part, max_moved, delta_width) for part in parts]
    cap = upds[0].cap
    Cd, nn_d, W = upds[0].delta_shape
    D = upds[0].delta_parts
    wide_d, gslot_d, gdepth_d = upds[0].delta_wide

    def update(a, b, c, moved_idx) -> ChainedScene:
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        c = jnp.asarray(c, jnp.float32)
        moved_idx = jnp.asarray(moved_idx, jnp.int32).reshape(-1)
        if moved_idx.shape[0] > cap:
            raise ValueError(
                f"{moved_idx.shape[0]} moved ids > max_moved capacity {cap}")
        mvalid = moved_idx >= 0
        safe_g = jnp.maximum(moved_idx, 0)
        out_parts, out_ids = [], []
        for p, (part, upd) in enumerate(zip(parts, upds)):
            sel = ids_j[p]
            safe_sel = jnp.maximum(sel, 0)
            a_p, b_p, c_p = a[safe_sel], b[safe_sel], c[safe_sel]
            moved_l = jnp.where(mvalid & (part_of_j[safe_g] == p),
                                local_of_j[safe_g], -1)
            masked_groups, smem_d, groups_d, tmap_d, sl_s, gn_d = upd.core(
                a_p, b_p, c_p, moved_l)
            out_parts.append(part._replace(groups=masked_groups,
                                           bgroups=None, masked=True))
            out_ids.append(sel)
            for d in range(D):
                out_parts.append(TightScene(
                    smem_d[d], groups_d[d], tmap_d[d], Cd, nn_d, W,
                    gnodes=gn_d[d] if wide_d else None,
                    gslot=gslot_d, gdepth=gdepth_d))
                out_ids.append(safe_sel[sl_s[d]])  # part-local -> global
        return ChainedScene(parts=tuple(out_parts), orig_ids=tuple(out_ids))

    return update
