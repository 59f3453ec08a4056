"""Packet ray tracing kernel: SMEM-scalar broadphase + MXU narrowphase.

Each grid step owns a packet of 1024 rays (an [8, 128] VPU tile per vector
component). The packet shares ONE cursor into the cluster-level BVH whose
node table lives in SMEM — a broadphase step is 8 scalar reads, a dense slab
test on the whole packet, and one any() reduction (~150 ns measured). At a
cluster leaf, all 128 triangles are tested against all 1024 rays in a single
[1024, 16] @ [16, 512] MXU matmul via the bilinear Moller-Trumbore
decomposition (see ops/__init__), followed by a VPU epilogue that reduces the
per-cluster best hit per ray.

This is the TPU re-architecture of the reference's hot path: the per-ray
SIMD slab test (src/ray/intersect_simd.rs) becomes a packet-wide VPU tile
test, and the one-ray-at-a-time flat traversal (src/flat_bvh.rs:396-431)
becomes shared-cursor packet traversal + dense MXU intersection.
"""

from __future__ import annotations

import weakref
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ray import Ray
from ..bvh.traverse import HitRecord
from .cluster import CLUSTER, ClusterScene

PACKET = 1024  # default rays per packet: 8 sublanes x 128 lanes
_EPS = float(np.finfo(np.float32).eps)
_INF = float(np.inf)

# Device cache for host-built scene tables, keyed by buffer identity.
# Scene tables are numpy (host build output); converting with a bare
# jnp.asarray re-TRANSFERS them on every trace call — ~8 MB/call on the
# 120k headline and the dominant cost of the per-call public API on camera
# workloads (round-4 verdict: the plain camera leg ran 3x slower than the
# fully-jitted fwd+bwd leg that closes over the same tables). Entries evict
# when the numpy array is garbage-collected (the weakref callback), so
# device memory tracks scene lifetime.
_DEVICE_TABLE_CACHE: dict[int, tuple] = {}


def _dev(arr):
    """jnp.asarray with identity-caching for host numpy tables."""
    if arr is None or isinstance(arr, jax.Array):
        return arr
    if not isinstance(arr, np.ndarray):
        return jnp.asarray(arr)
    key = id(arr)
    ent = _DEVICE_TABLE_CACHE.get(key)
    if ent is not None and ent[0]() is arr:
        return ent[1]
    ja = jnp.asarray(arr)
    if isinstance(ja, jax.core.Tracer):
        # under jit TRACING asarray yields a tracer-wrapped constant;
        # caching it would leak the tracer out of the trace (and poison
        # eager calls with an UnexpectedTracerError)
        return ja
    try:
        ref = weakref.ref(arr, lambda _r, k=key: _DEVICE_TABLE_CACHE.pop(k, None))
    except TypeError:  # weakref-unsupported subclass: uncached transfer
        return ja
    _DEVICE_TABLE_CACHE[key] = (ref, ja)
    return ja


def _cross_rows(u0, u1, u2, v0, v1, v2):
    return (u1 * v2 - u2 * v1, u2 * v0 - u0 * v2, u0 * v1 - u1 * v0)


def _read_node(nodes_ref, cursor, packed):
    """(ax..bz, entry, exit) from a node table column.

    packed=True reads the bf16-pair layout (cluster.pack_node_table_bf16):
    rows 0-2 hold (min,max) as two bf16 halves of one f32 lane — 5 scalar
    SMEM reads instead of 8. Mosaic cannot bitcast SCALARS (tpu.bitcast is
    vector-only — a real-hardware lowering fact interpret mode hides), so
    the halves are split in the vector domain: the packed scalar broadcasts
    to a [1, 128] row (which the slab test needs anyway) and the mask/shift
    run as cheap one-vreg ops. Boxes are conservatively rounded outward at
    build, so traversal visits a superset, never misses.
    """
    if not packed:
        return (nodes_ref[0, cursor], nodes_ref[1, cursor], nodes_ref[2, cursor],
                nodes_ref[3, cursor], nodes_ref[4, cursor], nodes_ref[5, cursor],
                nodes_ref[6, cursor], nodes_ref[7, cursor])
    hi_mask = jnp.int32(~0xFFFF)

    def unpack(row):
        v = jnp.full((1, 128), nodes_ref[row, cursor], jnp.float32)
        bits = pltpu.bitcast(v, jnp.int32)
        lo = pltpu.bitcast(jax.lax.bitwise_and(bits, hi_mask), jnp.float32)
        hi = pltpu.bitcast(jax.lax.shift_left(bits, 16), jnp.float32)
        return lo, hi

    ax, bx = unpack(0)
    ay, by = unpack(1)
    az, bz = unpack(2)
    return ax, ay, az, bx, by, bz, nodes_ref[3, cursor], nodes_ref[4, cursor]


def _make_kernel(packet: int, precision, use_cc: bool, skip_narrow: bool = False):
    def _kernel(nodes_ref, cc_ref, tris_ref, slab_ref, lmat_ref, out_ref, best_ref, tbar_ref):
        return _kernel_body(
            nodes_ref, cc_ref, tris_ref, slab_ref, lmat_ref, out_ref, best_ref,
            tbar_ref, packet, precision, use_cc, skip_narrow,
        )
    return _kernel


def _kernel_body(nodes_ref, cc_ref, tris_ref, slab_ref, lmat_ref, out_ref, best_ref,
                 tbar_ref, PACKET, PRECISION, USE_CC, SKIP_NARROW=False):
    nc = nodes_ref.shape[1]

    ox = slab_ref[0, 0]
    oy = slab_ref[0, 1]
    oz = slab_ref[0, 2]
    ix = slab_ref[0, 3]
    iy = slab_ref[0, 4]
    iz = slab_ref[0, 5]

    best_ref[:, 0:1] = jnp.full((PACKET, 1), _INF, jnp.float32)  # t
    best_ref[:, 1:4] = jnp.zeros((PACKET, 3), jnp.float32)
    best_ref[:, 3:4] = jnp.full((PACKET, 1), -1.0, jnp.float32)  # id
    tbar_ref[0] = _INF

    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (PACKET, CLUSTER), 1)

    def narrowphase(cluster_f):
        c = (-cluster_f - 1.0).astype(jnp.int32)
        tr = tris_ref[pl.ds(c, 1)]  # [1, 16, 128]
        a0, a1, a2 = tr[0, 0:1, :], tr[0, 1:2, :], tr[0, 2:3, :]
        e10, e11, e12 = tr[0, 3:4, :], tr[0, 4:5, :], tr[0, 5:6, :]
        e20, e21, e22 = tr[0, 6:7, :], tr[0, 7:8, :], tr[0, 8:9, :]

        p00, p01, p02 = _cross_rows(e20, e21, e22, e10, e11, e12)  # e2 x e1
        q0, q1, q2 = _cross_rows(e20, e21, e22, a0, a1, a2)  # e2 x a'
        r0, r1, r2 = _cross_rows(e10, e11, e12, a0, a1, a2)  # e1 x a'
        n0, n1, n2 = _cross_rows(e10, e11, e12, e20, e21, e22)  # e1 x e2
        an = a0 * n0 + a1 * n1 + a2 * n2  # a'.n

        z1 = jnp.zeros((1, CLUSTER), jnp.float32)

        def rows(*rs):
            out = list(rs)
            while len(out) < 16:
                out.append(z1)
            return jnp.concatenate(out, axis=0)

        b_det = rows(p00, p01, p02)
        b_u = rows(-q0, -q1, -q2, e20, e21, e22)
        b_v = rows(r0, r1, r2, -e10, -e11, -e12)
        b_t = rows(z1, z1, z1, z1, z1, z1, n0, n1, n2, -an)
        bmat = jnp.concatenate([b_det, b_u, b_v, b_t], axis=1)  # [16, 512]

        lm = lmat_ref[0]  # [PACKET, 16]: d(3) m(3) o(3) 1 pad(6)
        if USE_CC:
            dx, dy, dz = lm[:, 0:1], lm[:, 1:2], lm[:, 2:3]
            ccx = cc_ref[0, c]
            ccy = cc_ref[1, c]
            ccz = cc_ref[2, c]
            cxd0 = ccy * dz - ccz * dy
            cxd1 = ccz * dx - ccx * dz
            cxd2 = ccx * dy - ccy * dx
            lp = jnp.concatenate(
                [
                    lm[:, 0:3],
                    lm[:, 3:4] - cxd0,
                    lm[:, 4:5] - cxd1,
                    lm[:, 5:6] - cxd2,
                    lm[:, 6:7] - ccx,
                    lm[:, 7:8] - ccy,
                    lm[:, 8:9] - ccz,
                    lm[:, 9:16],
                ],
                axis=1,
            )  # [PACKET, 16]
        else:
            lp = lm

        m = jax.lax.dot_general(
            lp,
            bmat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=PRECISION,
        )  # [PACKET, 512]

        det = m[:, 0:128]
        udet = m[:, 128:256]
        vdet = m[:, 256:384]
        tdet = m[:, 384:512]
        # division-free bound tests (det > 0 after the cull test)
        cull = det < _EPS
        ok = (
            ~cull
            & (udet >= 0.0)
            & (udet <= det)
            & (vdet >= 0.0)
            & (udet + vdet <= det)
            & (tdet > _EPS * det)
        )
        # approximate reciprocal is fine: the kernel's t only drives
        # comparisons; the exact distance is recomputed outside on the winner
        t = tdet * pl.reciprocal(jnp.where(cull, 1.0, det), approx=True)
        dist = jnp.where(ok, t, _INF)

        # single packed min-reduce: steal the low 7 mantissa bits of t for the
        # lane index (t > 0 ==> f32 bit pattern is order-preserving)
        key = pltpu.bitcast(dist, jnp.int32)
        key = jnp.where(ok, (key & ~jnp.int32(127)) | lanes_i, jnp.int32(0x7F000000))
        kmin = jnp.min(key, axis=1, keepdims=True)  # [PACKET, 1]
        hit_any = kmin < jnp.int32(0x7F000000)
        tmin_c = pltpu.bitcast(kmin & ~jnp.int32(127), jnp.float32)
        tmin_c = jnp.where(hit_any, tmin_c, _INF)
        first = (kmin & jnp.int32(127)).astype(jnp.float32)
        id_c = c.astype(jnp.float32) * float(CLUSTER) + first

        bt = best_ref[:, 0:1]
        closer = tmin_c < bt
        best_ref[:, 0:1] = jnp.where(closer, tmin_c, bt)
        best_ref[:, 3:4] = jnp.where(closer, id_c, best_ref[:, 3:4])
        tbar_ref[0] = jnp.max(best_ref[:, 0:1])

    def body(cursor):
        ax = nodes_ref[0, cursor]
        ay = nodes_ref[1, cursor]
        az = nodes_ref[2, cursor]
        bx = nodes_ref[3, cursor]
        by = nodes_ref[4, cursor]
        bz = nodes_ref[5, cursor]
        entry = nodes_ref[6, cursor]
        exit_ = nodes_ref[7, cursor]

        t1 = (ax - ox) * ix
        t2 = (bx - ox) * ix
        u1 = (ay - oy) * iy
        u2 = (by - oy) * iy
        v1 = (az - oz) * iz
        v2 = (bz - oz) * iz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)), jnp.minimum(v1, v2)
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)), jnp.maximum(v1, v2)
        )
        tbar = tbar_ref[0]
        useful = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < tbar)
        anyhit = jnp.any(useful)
        is_leaf = entry < 0.0

        @pl.when(is_leaf & anyhit & (not SKIP_NARROW))
        def _():
            narrowphase(entry)

        nxt = jax.lax.select(is_leaf | jnp.logical_not(anyhit), exit_, entry)
        return nxt.astype(jnp.int32)

    jax.lax.while_loop(lambda cur: cur < nc, body, 0)

    out_ref[0] = best_ref[:, :]


@partial(jax.jit, static_argnames=("num_nodes", "interpret", "packet", "precision", "use_cc", "skip_narrow"))
def _trace(smem_nodes, smem_cc, tris_rel, slab, lmat, num_nodes, interpret=False,
           packet=PACKET, precision=jax.lax.Precision.HIGHEST, use_cc=True,
           skip_narrow=False):
    p = slab.shape[0]
    sub = packet // CLUSTER
    # nodes/cc ride as scalar-prefetch operands: they are loaded into SMEM
    # once per kernel call and persist across all grid steps (a per-step SMEM
    # input block would be re-DMA'd every packet at ~270us a pop).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(p,),
        scratch_shapes=[
            pltpu.VMEM((packet, 4), jnp.float32),
            pltpu.SMEM((1,), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(tris_rel.shape, lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + slab.shape[1:], lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + lmat.shape[1:], lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, packet, 4), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_kernel(packet, precision, use_cc, skip_narrow),
        out_shape=jax.ShapeDtypeStruct((p, packet, 4), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(smem_nodes, smem_cc, tris_rel, slab, lmat)


def trace_closest_hit(
    scene: ClusterScene, rays: Ray, tris=None, interpret: bool = False,
    packet: int = PACKET, precision=jax.lax.Precision.HIGHEST,
    skip_narrow: bool = False,
) -> HitRecord:
    """Closest hit of a ray batch against a ClusterScene (flagship fast path).

    Rays are processed in 1024-ray packets (padded internally). For best
    performance pass rays sorted for coherence (see ``sort_rays``) or tiled
    camera rays. The kernel returns (t, triangle id); pass ``tris=(a, b, c)``
    to also get exact (u, v) via a single direct Moller-Trumbore recompute
    on the winning triangle (this is also the differentiable path).
    """
    r = rays.origin.shape[0]
    pad = (-r) % packet
    o = jnp.concatenate([rays.origin, jnp.full((pad, 3), 2.0e30, jnp.float32)], axis=0) if pad else rays.origin
    d = jnp.concatenate([rays.direction, jnp.ones((pad, 3), jnp.float32)], axis=0) if pad else rays.direction
    inv = jnp.concatenate([rays.inv_direction, jnp.ones((pad, 3), jnp.float32)], axis=0) if pad else rays.inv_direction
    rp = r + pad
    p = rp // packet
    sub = packet // CLUSTER

    slab = jnp.concatenate([o, inv], axis=1)  # [rp, 6]
    slab = slab.reshape(p, sub, CLUSTER, 6).transpose(0, 3, 1, 2)  # [p, 6, sub, 128]

    m = jnp.cross(o, d)
    ones = jnp.ones((rp, 1), jnp.float32)
    zeros = jnp.zeros((rp, 6), jnp.float32)
    lmat = jnp.concatenate([d, m, o, ones, zeros], axis=1).reshape(p, packet, 16)

    out = _trace(
        _dev(scene.smem_nodes),
        _dev(scene.smem_cc),
        _dev(scene.tris_rel),
        slab,
        lmat,
        num_nodes=int(scene.num_nodes),
        interpret=interpret,
        packet=packet,
        precision=precision,
        use_cc=bool(scene.relative),
        skip_narrow=skip_narrow,
    )
    out = out.reshape(rp, 4)[:r]
    t = out[:, 0]
    lane_id = out[:, 3].astype(jnp.int32)
    hit = jnp.isfinite(t)
    tri_map = _dev(scene.tri_map)
    sid = jnp.where(hit, tri_map[jnp.clip(lane_id, 0, tri_map.shape[0] - 1)], -1)
    if tris is not None:
        from ..ray import ray_intersects_triangle

        ta, tb, tc = tris
        safe = jnp.maximum(sid, 0)
        g9 = jnp.concatenate([ta, tb, tc], axis=1)[safe]  # one gather, not 3
        inter = ray_intersects_triangle(rays, g9[:, 0:3], g9[:, 3:6],
                                        g9[:, 6:9])
        u = jnp.where(hit, inter.u, 0.0)
        v = jnp.where(hit, inter.v, 0.0)
        t = jnp.where(hit, jnp.where(jnp.isfinite(inter.distance), inter.distance, t), t)
    else:
        u = jnp.zeros_like(t)
        v = jnp.zeros_like(t)
    return HitRecord(t, u, v, sid)


def sort_rays(origins: np.ndarray, directions: np.ndarray):
    """Coherence sort: group rays by direction octant, then by origin Morton
    cell. Returns (perm, inverse_perm) — trace sorted, scatter results back."""
    o = np.asarray(origins)
    d = np.asarray(directions)
    octant = (d[:, 0] > 0).astype(np.int64) << 2 | (d[:, 1] > 0).astype(np.int64) << 1 | (
        d[:, 2] > 0
    ).astype(np.int64)
    lo = o.min(axis=0)
    hi = o.max(axis=0)
    q = ((o - lo) / np.maximum(hi - lo, 1e-30) * 63.0).astype(np.int64)
    key = (octant << 18) | (q[:, 0] << 12) | (q[:, 1] << 6) | q[:, 2]
    perm = np.argsort(key, kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return perm, inv


# ---------------------------------------------------------------------------
# Tight-cluster kernel: SAH-cut 16-triangle leaves, 16-wide narrowphase.
#
# The 128-wide packet kernel above funnels every leaf visit through a
# [P,16]@[16,512] MXU call; with loose Morton leaves that is ~40x more
# ray-triangle work than the rays need. Here leaves are tight SAH subtrees
# (<= 16 tris, see ``cluster.build_tight_scene``), so the broadphase prunes
# like the reference tree does, and the narrowphase is a [P,16]@[16,64]
# matmul on the one 16-lane cluster extracted from its 128-lane group row
# with a dynamic lane roll.
#
# Shapes tried and measured on TPU v5e before settling on this flat loop
# (120k-tri scene, 1M random rays; broadphase-only floor 0.14s):
# * per-visit pl.when region (even with a trivial body): +~100 ns/visit;
# * reduce-dependent SMEM store (trigger list at a counted slot): +87 ns;
# * carried scalar bool (has_trig |= ...): +23 ns/visit;
# * nested while loops (inner traversal + outer drain, any cond shape):
#   inherit the full region cost — Mosaic stops pipelining the inner body;
# * vector trigger accumulators ([SUB,128] or folded [1,128] carry):
#   register spills at P=4096 erase the gain;
# * multi-stream cursors (2-4 packets per kernel instance): spill the
#   register file; >=4 streams degrade ~400x;
# * exit-at-trigger loops (trigger node in the carry / packed into the
#   cursor / written to SMEM outputs) feeding a separate narrowphase phase,
#   including a full two-kernel sweep+narrowphase wavefront with host
#   resumption: the trigger-aware loop alone costs ~60 ns/visit extra
#   (0.14s -> 0.38s per 1M rays), eating the entire separation win.
# Every mechanism that extracts per-visit trigger information from the loop
# pays the same reduce-consumer stall. The winning levers were the opposite
# direction: LESS live state (slab re-read from VMEM + FMA form), and a
# tighter/shallower tree (fewer visits), not a cleverer loop.
#
# ROUND-2 CORRECTION (measured with DCE-proof probes): the "plain loop"
# baseline above was an artifact — a loop whose result nothing consumes is
# dead-code-eliminated, so the 0.14s floor was an empty kernel. The honest
# numbers: ~160 ns/visit for ANY live traversal loop (one reduce consumer,
# one-term cond, bare-cursor carry — all shapes equal: deferred narrowphase,
# in-kernel two-phase, cursor-sign/range exits were each built and measured
# within noise of each other), ~195 ns/visit with the narrowphase region
# present. The cost is the serial SMEM-read -> vector slab (21 ops x 4
# vregs at P=4096) -> any() reduce -> select chain itself. Surviving
# levers: fewer visits, and the per-packet SWEEP GATE (_sweep_tight below:
# a narrowphase-free kernel answers "would this packet fire at all?" and
# the main kernel skips gated-off packets for ~free).


def _make_tight_kernel(packet: int, precision, skip_narrow: bool = False,
                       subtile: int = 1024, width: int = 16, n_hints: int = 0,
                       mode: str = "closest", bounded: bool = False,
                       use_bmat: bool = False, count_visits: bool = False,
                       resident: bool = False, gated: bool = False,
                       packed: bool = False):
    def _kernel(nodes_ref, hints_ref, gate_ref, groups_ref, slab_ref, lmat_ref,
                out_ref, bestk_ref, bestc_ref, vb_ref, cnt_ref, *rest):
        if resident:
            # groups arrived in ANY (HBM); copy ONCE into the persistent
            # VMEM scratch at grid step 0 (scratch survives across steps —
            # the pipelined per-step block fetch re-DMAs a constant-index
            # block every packet, measured at ~1.4 ms/packet for 41MB)
            gvmem_ref, dma_sem = rest

            @pl.when(pl.program_id(0) == 0)
            def _():
                cp = pltpu.make_async_copy(groups_ref, gvmem_ref, dma_sem)
                cp.start()
                cp.wait()

            groups_use = gvmem_ref
        else:
            groups_use = groups_ref
        return _tight_body(nodes_ref, hints_ref, gate_ref, groups_use, slab_ref,
                           lmat_ref, out_ref, bestk_ref, bestc_ref, vb_ref,
                           cnt_ref, packet, precision, skip_narrow, subtile,
                           width, n_hints, mode, bounded, use_bmat,
                           count_visits, gated, packed)
    return _kernel


_SENT_I = 0x7F800000  # +inf bit pattern (packed best-key sentinel)


def _narrow_cluster(c, ccx, ccy, ccz, box6, groups_ref, slab_ref, lmat_ref,
                    bestk_ref, bestc_ref, vb_ref, *, W, SUBTILE, PACKET,
                    PRECISION, MODE, BOUNDED, USE_BMAT):
    """Shared narrowphase: MXU Moller-Trumbore of cluster ``c`` against the
    packet, updating the packed best keys and per-lane pruning distances.

    ``c`` is the cluster id (i32 scalar); ``ccx/ccy/ccz`` the cluster-frame
    origin; ``box6 = (ax, ay, az, bx, by, bz)`` the leaf box used only for
    the per-subtile gating recompute when the packet is split into
    narrowphase subtiles. Used by both the entry/exit tight kernel and the
    group-walk kernel (one implementation, bit-identical results).
    """
    GSHIFT = (128 // W).bit_length() - 1
    GMASK = (128 // W) - 1
    SUBTILE = min(SUBTILE, PACKET)
    NT = max(PACKET // SUBTILE, 1)
    ST = SUBTILE // 128
    _SENT = jnp.int32(_SENT_I)
    ax, ay, az, bx, by, bz = box6

    if USE_BMAT:
        # groups_ref holds the PRECOMPUTED bilinear forms (see
        # cluster.pack_bgroups): the whole Moller-Trumbore matrix build
        # below — ~20 serial small-tile ops on the leaf-visit critical
        # path — collapses to one dynamic row fetch (+ a lane roll when
        # two W=16 clusters share a 128-lane row).
        per_row = max(128 // (4 * W), 1)
        if per_row > 1:
            g = jax.lax.shift_right_logical(c, 1)
            sub = jax.lax.bitwise_and(c, 1)
            tile = groups_ref[pl.ds(g, 1)][0]  # [16, 128]
            shift = jax.lax.bitwise_and(128 - sub * (4 * W), 127)
            bmat = pltpu.roll(tile, shift, axis=1)[:, 0:4 * W]
        else:
            bmat = groups_ref[pl.ds(c, 1)][0]  # [16, 4W]
    else:
        g = jax.lax.shift_right_logical(c, GSHIFT)
        sub = jax.lax.bitwise_and(c, GMASK)
        tile = groups_ref[pl.ds(g, 1)][0]  # [16, 128]
        shift = jax.lax.bitwise_and(128 - sub * W, 127)
        tr = pltpu.roll(tile, shift, axis=1)  # cluster's tris at lanes 0..W-1

        a0, a1, a2 = tr[0:1, 0:W], tr[1:2, 0:W], tr[2:3, 0:W]
        e10, e11, e12 = tr[3:4, 0:W], tr[4:5, 0:W], tr[5:6, 0:W]
        e20, e21, e22 = tr[6:7, 0:W], tr[7:8, 0:W], tr[8:9, 0:W]

        p00, p01, p02 = _cross_rows(e20, e21, e22, e10, e11, e12)  # e2 x e1
        q0, q1, q2 = _cross_rows(e20, e21, e22, a0, a1, a2)  # e2 x a'
        r0, r1, r2 = _cross_rows(e10, e11, e12, a0, a1, a2)  # e1 x a'
        n0, n1, n2 = _cross_rows(e10, e11, e12, e20, e21, e22)  # e1 x e2
        an = a0 * n0 + a1 * n1 + a2 * n2

        z1 = jnp.zeros((1, W), jnp.float32)

        def rows(*rs):
            out = list(rs)
            while len(out) < 16:
                out.append(z1)
            return jnp.concatenate(out, axis=0)

        b_det = rows(p00, p01, p02)
        b_u = rows(-q0, -q1, -q2, e20, e21, e22)
        b_v = rows(r0, r1, r2, -e10, -e11, -e12)
        b_t = rows(z1, z1, z1, z1, z1, z1, n0, n1, n2, -an)
        bmat = jnp.concatenate([b_det, b_u, b_v, b_t], axis=1)  # [16, 4W]

    def narrow_subtile(st):
        # TRANSPOSED narrowphase: rays ride the LANE axis throughout
        # ([4W, SUBTILE] product, [W, SUBTILE] blocks), so every op in
        # the hit test runs at full 128-lane density. The ray-major
        # orientation ([SUBTILE, W], W=16 lanes) cost 128 tiles per op
        # at 1/8 lane use — measured 54% of the aimed-workload time.
        lm = lmat_ref[0, :, st * SUBTILE:(st + 1) * SUBTILE]  # [16, SUBTILE]
        dx, dy, dz = lm[0:1], lm[1:2], lm[2:3]
        cxd0 = ccy * dz - ccz * dy
        cxd1 = ccz * dx - ccx * dz
        cxd2 = ccx * dy - ccy * dx
        lp = jnp.concatenate(
            [
                lm[0:3],
                lm[3:4] - cxd0,
                lm[4:5] - cxd1,
                lm[5:6] - cxd2,
                lm[6:7] - ccx,
                lm[7:8] - ccy,
                lm[8:9] - ccz,
                lm[9:16],
            ],
            axis=0,
        )  # [16, SUBTILE]

        m = jax.lax.dot_general(
            bmat, lp, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=PRECISION,
        )  # [4W, SUBTILE]

        det = m[0:W]
        udet = m[W:2 * W]
        vdet = m[2 * W:3 * W]
        tdet = m[3 * W:4 * W]
        cull = det < _EPS
        ok = (
            ~cull
            & (udet >= 0.0)
            & (udet <= det)
            & (vdet >= 0.0)
            & (udet + vdet <= det)
            & (tdet > _EPS * det)
        )
        t = tdet * pl.reciprocal(jnp.where(cull, 1.0, det), approx=True)
        dist = jnp.where(ok, t, _INF)

        # packed min-reduce: steal the low log2(W) mantissa bits of t
        # for the triangle index (t > 0 => f32 bits are order-preserving)
        LMASK = jnp.int32(W - 1)
        lanes_i = jax.lax.broadcasted_iota(jnp.int32, (W, SUBTILE), 0)
        key = pltpu.bitcast(dist, jnp.int32)
        key = jnp.where(ok, (key & ~LMASK) | lanes_i, _SENT)
        # sublane reduce straight into slab layout; everything after
        # also runs at dense 128-lane width. Mosaic lowers the
        # 1D->(rows,128) relayout only for full-tile (1024) or
        # single-row (128) sizes; odd subtile sizes reduce per
        # tile-aligned lane group and stack rows instead.
        if SUBTILE >= 1024 or SUBTILE == 128:
            km = jnp.min(key, axis=0).reshape(ST, 128)
        else:
            km = jnp.concatenate(
                [jnp.min(key[:, i * 128:(i + 1) * 128], axis=0,
                         keepdims=True) for i in range(ST)],
                axis=0,
            )

        sl = slice(st * ST, (st + 1) * ST)
        bk = bestk_ref[sl, :]
        closer = km < bk
        nbk = jnp.where(closer, km, bk)
        bestk_ref[sl, :] = nbk
        bestc_ref[sl, :] = jnp.where(closer, c, bestc_ref[sl, :])
        # refresh the per-lane pruning distances (+inf while no hit)
        nt = pltpu.bitcast(nbk & ~LMASK, jnp.float32)
        if MODE == "any":
            # occlusion query: a lane with any hit inside t_max is done —
            # -inf makes every later `tmin < vb` test fail, so the lane
            # stops pulling the packet into subtrees entirely
            tmx = slab_ref[0, 6, sl, :]
            vb_ref[sl, :] = jnp.where(nt < tmx, -_INF, tmx)
        elif BOUNDED:
            # keep vb <= t_max: a recorded hit beyond the bound must not
            # loosen pruning (the host drops it as a miss afterwards)
            vb_ref[sl, :] = jnp.minimum(nt, vb_ref[sl, :])
        else:
            vb_ref[sl, :] = nt

    if NT == 1:
        narrow_subtile(0)
    else:
        # recompute which subtiles hit this leaf's box (cheap per trigger)
        oix, oiy, oiz = slab_ref[0, 0], slab_ref[0, 1], slab_ref[0, 2]
        ix, iy, iz = slab_ref[0, 3], slab_ref[0, 4], slab_ref[0, 5]
        t1 = ax * ix - oix
        t2 = bx * ix - oix
        u1 = ay * iy - oiy
        u2 = by * iy - oiy
        v1 = az * iz - oiz
        v2 = bz * iz - oiz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
            jnp.minimum(v1, v2),
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
            jnp.maximum(v1, v2),
        )
        useful = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < vb_ref[:, :])
        for st in range(NT):
            flag = jnp.any(useful[st * ST:(st + 1) * ST, :])

            @pl.when(flag)
            def _(st=st):
                narrow_subtile(st)


def _tight_body(nodes_ref, hints_ref, gate_ref, groups_ref, slab_ref, lmat_ref,
                out_ref, bestk_ref, bestc_ref, vb_ref, cnt_ref, PACKET,
                PRECISION, SKIP_NARROW=False, SUBTILE=1024, W=16, N_HINTS=0,
                MODE="closest", BOUNDED=False, USE_BMAT=False,
                COUNT_VISITS=False, GATED=False, PACKED=False):
    assert W in (16, 32, 64, 128)
    assert MODE in ("closest", "any")
    nn = nodes_ref.shape[1]
    SUB = PACKET // 128  # sublane tiles of the ray packet
    # bound once at top level: program_id inside a pl.when region does not
    # lower in interpret mode (sweep-gated + seeded combination)
    pid = pl.program_id(0)

    # Per-ray best hit as a PACKED int key ([SUB,128] slab layout): high bits
    # the f32 t (order-preserving for t > 0), low log2(W) bits the triangle
    # lane; the winning cluster rides in a second int buffer. The per-fire
    # update is then min + compare + two stores — (t, id) decode happens once
    # at kernel end. Sentinel 0x7F800000 = +inf bits: above every valid key
    # AND bitcasts straight to the float +inf the pruning compares expect.
    _SENT = jnp.int32(0x7F800000)
    bestk_ref[:, :] = jnp.full((SUB, 128), _SENT, jnp.int32)
    bestc_ref[:, :] = jnp.zeros((SUB, 128), jnp.int32)
    # Per-lane pruning distance, in slab layout, seeded from the per-ray
    # t_max riding in slab row 6 (inf when unbounded). Slab rows are only
    # ever compared, never multiplied, so inf is safe there; best-t stays
    # inf-initialized and the host filters t >= t_max afterwards.
    vb_ref[:, :] = slab_ref[0, 6]
    if COUNT_VISITS:
        # instrumentation mode (NOT for timed runs: the counter stores cost
        # ~tens of ns/visit) — bench.py uses the counts for its roofline
        cnt_ref[0] = 0
        cnt_ref[1] = 0

    def narrowphase(node):
        ax, ay, az, bx, by, bz, cluster_f, _x = _read_node(nodes_ref, node, PACKED)
        c = (-cluster_f - 1.0).astype(jnp.int32)
        if COUNT_VISITS:
            cnt_ref[1] = cnt_ref[1] + 1
        # ray transform into the cluster frame. Packed scenes use the RAW
        # packed f32 scalars of rows 0-2 as the frame origin: their float
        # value is ~the box min corner (the bf16 min rides the high half;
        # the low-half junk shifts it by <2^-8 relative), any consistent
        # constant is a valid origin, and the host packs the group rows
        # against the bit-identical .view(float32) values — so no scalar
        # bitcast (unsupported on the scalar core) and no extra storage.
        if PACKED:
            ccx = nodes_ref[0, node]
            ccy = nodes_ref[1, node]
            ccz = nodes_ref[2, node]
        else:
            ccx = (ax + bx) * 0.5
            ccy = (ay + by) * 0.5
            ccz = (az + bz) * 0.5
        _narrow_cluster(
            c, ccx, ccy, ccz, (ax, ay, az, bx, by, bz), groups_ref, slab_ref,
            lmat_ref, bestk_ref, bestc_ref, vb_ref, W=W, SUBTILE=SUBTILE,
            PACKET=PACKET, PRECISION=PRECISION, MODE=MODE, BOUNDED=BOUNDED,
            USE_BMAT=USE_BMAT,
        )

    def visit(cursor):
        ax, ay, az, bx, by, bz, entry, exit_ = _read_node(nodes_ref, cursor, PACKED)

        # slab components re-read from VMEM each visit (holding them in
        # registers across the loop spills the register file); rows 0-2 are
        # o*inv precomputed so each bound costs one FMA
        oix, oiy, oiz = slab_ref[0, 0], slab_ref[0, 1], slab_ref[0, 2]
        ix, iy, iz = slab_ref[0, 3], slab_ref[0, 4], slab_ref[0, 5]
        t1 = ax * ix - oix
        t2 = bx * ix - oix
        u1 = ay * iy - oiy
        u2 = by * iy - oiy
        v1 = az * iz - oiz
        v2 = bz * iz - oiz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)), jnp.minimum(v1, v2)
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)), jnp.maximum(v1, v2)
        )
        useful = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < vb_ref[:, :])
        anyhit = jnp.any(useful)
        is_leaf = entry < 0.0
        if COUNT_VISITS:
            cnt_ref[0] = cnt_ref[0] + 1
        return anyhit, is_leaf, entry, exit_

    def run_traversal():
        # phase 0: seed per-lane pruning distances by narrowphasing the
        # sampled hint leaves (unconditional fori, idempotent; -1 disables)
        if N_HINTS and not SKIP_NARROW:
            base = pid * N_HINTS

            @pl.when(hints_ref[base] >= 0)
            def _():
                def seed(k, carry):
                    narrowphase(hints_ref[base + k])
                    return carry

                jax.lax.fori_loop(0, N_HINTS, seed, 0)

        def body(cursor):
            anyhit, is_leaf, entry, exit_ = visit(cursor)

            @pl.when(is_leaf & anyhit & (not SKIP_NARROW))
            def _():
                narrowphase(cursor)

            nxt = jax.lax.select(is_leaf | jnp.logical_not(anyhit), exit_, entry)
            return nxt.astype(jnp.int32)

        jax.lax.while_loop(lambda cur: cur < nn, body, 0)

    if GATED:
        # per-packet gate from the sweep pre-pass (see _sweep_tight): a
        # packet the sweep proved fires nothing skips the entire traversal
        # — its outputs decode from the untouched init (miss everywhere).
        # The branch reads a prefetched SMEM scalar: ~free.
        @pl.when(gate_ref[pid] > 0)
        def _():
            run_traversal()
    else:
        run_traversal()

    # one-time decode of the packed best keys: t (sentinel bitcasts to +inf
    # by construction) and global triangle lane id (-1 on miss)
    bk = bestk_ref[:, :]
    LMASK = jnp.int32(W - 1)
    out_ref[0, 0:SUB] = pltpu.bitcast(bk & ~LMASK, jnp.float32)
    hit = bk < jnp.int32(0x7F800000)
    gid = bestc_ref[:, :] * W + jax.lax.bitwise_and(bk, LMASK)
    out_ref[0, SUB:2 * SUB] = jnp.where(hit, gid, -1).astype(jnp.float32)
    if COUNT_VISITS:
        # overwrite the first two output rows with the packet's counters
        out_ref[0, 0:1] = jnp.full((1, 128), cnt_ref[0].astype(jnp.float32))
        out_ref[0, 1:2] = jnp.full((1, 128), cnt_ref[1].astype(jnp.float32))


@partial(jax.jit, static_argnames=("num_nodes", "interpret", "packet", "precision", "skip_narrow", "width", "n_hints", "mode", "bounded", "use_bmat", "count_visits", "resident", "gated", "packed"))
def _trace_tight(smem_nodes, hints, gate, groups, slab, lmat, num_nodes, interpret=False,
                 packet=2048, precision=jax.lax.Precision.HIGHEST, skip_narrow=False,
                 width=16, n_hints=0, mode="closest", bounded=False, use_bmat=False,
                 count_visits=False, resident=False, gated=False, packed=False):
    p = slab.shape[0]
    sub = packet // 128
    scratch = [
        pltpu.VMEM((sub, 128), jnp.int32),
        pltpu.VMEM((sub, 128), jnp.int32),
        pltpu.VMEM((sub, 128), jnp.float32),
        pltpu.SMEM((2,), jnp.int32),
    ]
    if resident:
        groups_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch += [pltpu.VMEM(groups.shape, jnp.float32), pltpu.SemaphoreType.DMA]
    else:
        groups_spec = pl.BlockSpec(groups.shape, lambda i, *_: (0, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(p,),
        scratch_shapes=scratch,
        in_specs=[
            groups_spec,
            pl.BlockSpec((1,) + slab.shape[1:], lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + lmat.shape[1:], lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * sub, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    # out layout: [p, 2*sub, 128] — rows 0..sub-1 best t, rows sub.. best id
    # (both in ray slab layout; hosts reshape back to per-ray)
    return pl.pallas_call(
        _make_tight_kernel(packet, precision, skip_narrow, width=width,
                           n_hints=n_hints, mode=mode, bounded=bounded,
                           use_bmat=use_bmat, count_visits=count_visits,
                           resident=resident, gated=gated, packed=packed),
        out_shape=jax.ShapeDtypeStruct((p, 2 * sub, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(smem_nodes, hints, gate, groups, slab, lmat)


def _make_sweep_kernel(packet: int, exit_on_fire, packed: bool = False,
                       gated: bool = False):
    if gated:
        def _kernel(nodes_ref, gate_ref, slab_ref, out_ref):
            # pre-gated packet: skip the whole sweep walk, report unfired
            out_ref[0, 0] = jnp.zeros((128,), jnp.float32)

            @pl.when(gate_ref[pl.program_id(0)] > 0)
            def _():
                _sweep_body(nodes_ref, slab_ref, out_ref, packet,
                            exit_on_fire, packed)
    else:
        def _kernel(nodes_ref, slab_ref, out_ref):
            return _sweep_body(nodes_ref, slab_ref, out_ref, packet,
                               exit_on_fire, packed)
    return _kernel


def _sweep_body(nodes_ref, slab_ref, out_ref, PACKET, EXIT_ON_FIRE,
                PACKED=False):
    """Broadphase-only sweep: would this packet fire any narrowphase?

    Contains NO narrowphase code and carries only the cursor. A visit
    still costs ~160 ns — the serial SMEM->vector->reduce->select chain;
    see the ROUND-2 CORRECTION note above (the once-reported 21 ns
    pipelined mode was a dead-code artifact). The sweep's value is that it
    lets the main kernel skip gated-off packets entirely, and it avoids
    the narrowphase region's extra ~35 ns/visit. Leaf entries -(cluster+1)
    are remapped on the fly to nn+cluster+2 (> nn), so a leaf-hit drives
    the cursor PAST the end: `cur > nn` after the loop IS the fired bit
    ("cursor-range exit" — one-term cond, single reduce consumer,
    bare-cursor carry: kept minimal because every addition measured a
    cost, not because any shape pipelines).
    """
    nn = nodes_ref.shape[1]

    def step(cursor, remap):
        ax, ay, az, bx, by, bz, entry, exit_ = _read_node(nodes_ref, cursor, PACKED)
        oix, oiy, oiz = slab_ref[0, 0], slab_ref[0, 1], slab_ref[0, 2]
        ix, iy, iz = slab_ref[0, 3], slab_ref[0, 4], slab_ref[0, 5]
        t1 = ax * ix - oix
        t2 = bx * ix - oix
        u1 = ay * iy - oiy
        u2 = by * iy - oiy
        v1 = az * iz - oiz
        v2 = bz * iz - oiz
        tmin = jnp.maximum(
            jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)), jnp.minimum(v1, v2)
        )
        tmax = jnp.minimum(
            jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)), jnp.maximum(v1, v2)
        )
        useful = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < slab_ref[0, 6])
        anyhit = jnp.any(useful)
        if remap:
            entry = jax.lax.select(entry < 0.0, (nn + 1.0) - entry, entry)
            nxt = jax.lax.select(anyhit, entry, exit_)
        else:
            is_leaf = entry < 0.0
            nxt = jax.lax.select(is_leaf | jnp.logical_not(anyhit), exit_, entry)
        return nxt.astype(jnp.int32), anyhit, entry

    if EXIT_ON_FIRE == "probe":
        # diagnostic: the plain no-trigger loop in this kernel's grid spec
        # (the probe that exposed the round-1 dead-code artifact: a loop
        # nothing consumes is eliminated; this one writes `fired`)
        cur = jax.lax.while_loop(lambda c: c < nn,
                                 lambda c: step(c, False)[0], jnp.int32(0))
        fired = cur > nn  # always False
    elif EXIT_ON_FIRE:
        cur = jax.lax.while_loop(lambda c: c < nn,
                                 lambda c: step(c, True)[0], jnp.int32(0))
        fired = cur > nn
    else:
        def body(carry):
            cursor, f = carry
            nxt, anyhit, entry = step(cursor, False)
            return nxt, f | ((entry < 0.0) & anyhit)

        _, fired = jax.lax.while_loop(lambda s: s[0] < nn, body,
                                      (jnp.int32(0), False))
    out_ref[0, 0] = jnp.full((128,), fired.astype(jnp.float32))


@partial(jax.jit, static_argnames=("num_nodes", "interpret", "packet", "exit_on_fire", "packed"))
def _sweep_tight(smem_nodes, slab, num_nodes, interpret=False, packet=2048,
                 exit_on_fire=True, packed=False, pre_gate=None):
    p = slab.shape[0]
    gated = pre_gate is not None
    operands = ([smem_nodes, pre_gate] if gated else [smem_nodes])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if gated else 1,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1,) + slab.shape[1:], lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_sweep_kernel(packet, exit_on_fire, packed, gated=gated),
        out_shape=jax.ShapeDtypeStruct((p, 1, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(*operands, slab)


# ---------------------------------------------------------------------------
# GROUP-WALK kernel: K-ary wide tree, ONE fired-mask reduce per K children.
#
# The tight kernel above retires ONE node per ~160-195 ns serial
# SMEM->vector->reduce->select chain — the chain latency, not the vector
# work, is the visit cost (see the ROUND-2 CORRECTION note). This kernel
# amortizes the chain K=16 ways: the tree is a true K-ary wide tree
# (``cluster.build_wide_table``), and one iteration slab-tests ALL K
# children of a group against the packet, OR-folds the per-ray fired bits
# into ONE K-bit scalar mask (a single reduce consumer), then walks the
# mask's set bits — leaf bits narrowphase, interior bits push the remaining
# mask and descend. Non-fired subtrees are never touched (the entry/exit
# walk paid a full chain per node just to skip them).
#
# Walk state is three scalars (depth, group, mask) plus a tiny SMEM stack;
# masks pop in DFS order so visit order — and therefore pruning behavior
# and results — matches the entry/exit kernel exactly.
#
# Reference analog being re-designed: the one-box-per-step stackless walk,
# /root/reference/src/flat_bvh.rs:396-431 (one AABB test per loop step).
# ---------------------------------------------------------------------------

WIDE_DMAX = 16  # fixed mask-stack depth (static => one compile per scene bucket)


def _make_wide_kernel(packet: int, precision, K: int = 16, subtile: int = 1024,
                      width: int = 16, n_hints: int = 0, mode: str = "closest",
                      bounded: bool = False, count_visits: bool = False,
                      gated: bool = False, subtree: bool = False,
                      resident: bool = False, exp: str = ""):
    def _kernel(gnodes_ref, hints_ref, gate_ref, startg_ref, groups_ref,
                slab_ref, lmat_ref, out_ref, bestk_ref, bestc_ref, vb_ref,
                cnt_ref, stk_ref, m2_ref, macc_ref, vbh_ref, *rest):
        if resident:
            # beyond-~12MB group tables (one-table 1M-triangle scenes):
            # groups arrive in ANY (HBM); copy ONCE into the persistent
            # VMEM scratch at grid step 0 (the pipelined constant-index
            # block fetch would re-DMA the whole table every packet —
            # measured ~1.4 ms/packet at 41 MB on the tight kernel)
            gvmem_ref, dma_sem = rest

            @pl.when(pl.program_id(0) == 0)
            def _():
                cp = pltpu.make_async_copy(groups_ref, gvmem_ref, dma_sem)
                cp.start()
                cp.wait()

            groups_use = gvmem_ref
        else:
            groups_use = groups_ref
        return _wide_body(gnodes_ref, hints_ref, gate_ref, startg_ref,
                          groups_use, slab_ref, lmat_ref, out_ref, bestk_ref,
                          bestc_ref, vb_ref, cnt_ref, stk_ref, m2_ref,
                          macc_ref, vbh_ref, packet,
                          precision, K, subtile, width, n_hints, mode, bounded,
                          count_visits, gated, subtree, exp)
    return _kernel


def _ctz16(m):
    """Index of the lowest set bit of a 16-bit mask (scalar selects)."""
    low = jax.lax.bitwise_and(m, -m)
    k = jnp.int32(0)
    for bit, msk in ((1, 0xAAAA), (2, 0xCCCC), (4, 0xF0F0), (8, 0xFF00)):
        k = k + jax.lax.select(
            jax.lax.bitwise_and(low, jnp.int32(msk)) != 0,
            jnp.int32(bit), jnp.int32(0))
    return k


def _make_mask_walk(gnodes_ref, stk_ref, m2_ref, enter, count_iter=None):
    """DFS mask-stack walk over a wide group table — the serial engine
    shared by the wide trace and wide nearest kernels.

    ``enter(child, en) -> interior mask`` tests a group (narrowphasing its
    fired leaves as a side effect) and returns the fired INTERIOR bits;
    the walk stacks only those. ``en`` is a scalar bool: when False the
    implementation must mask ALL its side effects and return 0 — the walk
    calls ``enter`` UNCONDITIONALLY every iteration (on a safe group id)
    instead of wrapping it in a pl.when region. Together with hoisting
    the read-only slab rows out of the loop this took the headline walk
    from 3427 to 2896 ns/iteration at P8192 (BENCH r4 roofline vs
    scratch/wide_walk_prof.py; the isolated serialized group test costs
    1263 ns — scratch/gt_bench.py variant A, T=32768). do_enter is true
    for >90% of iterations on the headline workload, so the wasted
    masked tests are noise. ``m2_ref`` is unused (kept for signature
    stability).
    ``count_iter``: optional callable bumping the iteration counter.

    Returns ``walk(g0, m0, skip=None)``; ``skip`` is an optional PAIR of
    traced group ids never entered (their subtrees were already fully
    processed by earlier phases); ids <= 0 are inert (no child has id 0).
    """
    del m2_ref

    def walk(g0, m0, skip=None):
        def body(carry):
            d, gid, mask = carry
            if count_iter is not None:
                count_iter()
            has = mask != 0
            k = _ctz16(mask)
            mask2 = jax.lax.bitwise_and(mask, mask - 1)
            child = gnodes_ref[7 * k + 6, gid].astype(jnp.int32)

            if skip is None:
                do_enter = has
            else:
                s1, s2 = skip
                do_enter = has & (child != s1) & (child != s2)

            g_safe = jax.lax.select(do_enter, child, jnp.int32(0))
            m2 = enter(g_safe, do_enter)

            # stack frame for the current depth (read back on pop); the
            # pop-iteration store targets the abandoned slot — harmless
            stk_ref[2 * d] = gid
            stk_ref[2 * d + 1] = mask2
            dm1 = jnp.maximum(d - 1, 0)
            pgid = stk_ref[2 * dm1]
            pmask = stk_ref[2 * dm1 + 1]
            push = has & (m2 != 0)  # leaf-only subgroup: nothing to push
            nd = jax.lax.select(push, d + 1, jax.lax.select(has, d, d - 1))
            ngid = jax.lax.select(push, child,
                                  jax.lax.select(has, gid, pgid))
            nmask = jax.lax.select(push, m2,
                                   jax.lax.select(has, mask2, pmask))
            return nd, ngid, nmask

        jax.lax.while_loop(lambda s: s[0] >= 0, body,
                           (jnp.int32(0), g0, m0))

    return walk



def _make_dual_walk(gnodes_ref, stk_ref, enter, count_iter=None):
    """EXPERIMENT ("dual"): two interleaved DFS mask-stack walks over
    disjoint subtree sets of the root group.

    Rationale: the single walk's per-iteration cost is the serial
    vector-test -> scalar-reduce -> mask-pop chain; the VPU idles during
    the scalar tail and the scalar core idles during the test. Two
    independent streams issue two group tests per loop body — stream B's
    vector work overlaps stream A's scalar tail (Mosaic schedules them
    freely: no data dependence). The root's fired interior bits are dealt
    round-robin (alternate set bits) to balance the streams.

    Visit ORDER differs from the single walk (A/B interleave), so packed
    min-key TIES (identical t and lane) may resolve to the other winner —
    measured-equal on the headline; gate on exactness before making this
    a default. A dead stream keeps calling ``enter`` masked-off (wasted
    vector work on unbalanced tails).
    """
    OFF = 2 * WIDE_DMAX  # stream B's stack region

    def walk2(g0):
        m0 = enter(g0, jnp.int32(0) == 0)
        # deal the root's fired interior bits round-robin to A and B
        mA = jnp.int32(0)
        mB = jnp.int32(0)
        toA = jnp.int32(0) == 0
        m = m0
        for _ in range(16):
            low = jax.lax.bitwise_and(m, -m)
            mA = mA | jax.lax.select(toA, low, jnp.int32(0))
            mB = mB | jax.lax.select(toA, jnp.int32(0), low)
            toA = jax.lax.select(low != 0, ~toA, toA)
            m = jax.lax.bitwise_and(m, m - 1)
        dA0 = jax.lax.select(mA != 0, jnp.int32(0), jnp.int32(-1))
        dB0 = jax.lax.select(mB != 0, jnp.int32(0), jnp.int32(-1))

        def body(carry):
            dA, gA, mA_, dB, gB, mB_ = carry
            if count_iter is not None:
                count_iter()
            # scalar pre-compute for both streams (independent)
            actA = dA >= 0
            hasA = actA & (mA_ != 0)
            kA = _ctz16(mA_)
            childA = gnodes_ref[7 * kA + 6, gA].astype(jnp.int32)
            gsA = jax.lax.select(hasA, childA, jnp.int32(0))
            actB = dB >= 0
            hasB = actB & (mB_ != 0)
            kB = _ctz16(mB_)
            childB = gnodes_ref[7 * kB + 6, gB].astype(jnp.int32)
            gsB = jax.lax.select(hasB, childB, jnp.int32(0))

            # two independent vector tests: B's test hides A's scalar tail
            intA = enter(gsA, hasA)
            intB = enter(gsB, hasB)

            mA2 = jax.lax.bitwise_and(mA_, mA_ - 1)
            dAc = jnp.maximum(dA, 0)
            stk_ref[2 * dAc] = gA
            stk_ref[2 * dAc + 1] = mA2
            dm1A = jnp.maximum(dA - 1, 0)
            pgA = stk_ref[2 * dm1A]
            pmA = stk_ref[2 * dm1A + 1]
            pushA = hasA & (intA != 0)
            ndA = jax.lax.select(
                pushA, dA + 1, jax.lax.select(hasA, dA, dA - 1))
            ndA = jax.lax.select(actA, ndA, dA)
            ngA = jax.lax.select(pushA, childA,
                                 jax.lax.select(hasA, gA, pgA))
            ngA = jax.lax.select(actA, ngA, gA)
            nmA = jax.lax.select(pushA, intA,
                                 jax.lax.select(hasA, mA2, pmA))
            nmA = jax.lax.select(actA, nmA, mA_)

            mB2 = jax.lax.bitwise_and(mB_, mB_ - 1)
            dBc = jnp.maximum(dB, 0)
            stk_ref[OFF + 2 * dBc] = gB
            stk_ref[OFF + 2 * dBc + 1] = mB2
            dm1B = jnp.maximum(dB - 1, 0)
            pgB = stk_ref[OFF + 2 * dm1B]
            pmB = stk_ref[OFF + 2 * dm1B + 1]
            pushB = hasB & (intB != 0)
            ndB = jax.lax.select(
                pushB, dB + 1, jax.lax.select(hasB, dB, dB - 1))
            ndB = jax.lax.select(actB, ndB, dB)
            ngB = jax.lax.select(pushB, childB,
                                 jax.lax.select(hasB, gB, pgB))
            ngB = jax.lax.select(actB, ngB, gB)
            nmB = jax.lax.select(pushB, intB,
                                 jax.lax.select(hasB, mB2, pmB))
            nmB = jax.lax.select(actB, nmB, mB_)
            return ndA, ngA, nmA, ndB, ngB, nmB

        jax.lax.while_loop(
            lambda s: (s[0] >= 0) | (s[3] >= 0), body,
            (dA0, g0, mA, dB0, g0, mB))

    return walk2


def _wide_body(gnodes_ref, hints_ref, gate_ref, startg_ref, groups_ref,
               slab_ref, lmat_ref, out_ref, bestk_ref, bestc_ref, vb_ref,
               cnt_ref, stk_ref, m2_ref, macc_ref, vbh_ref,
               PACKET, PRECISION, K=16, SUBTILE=1024, W=16, N_HINTS=0,
               MODE="closest", BOUNDED=False, COUNT_VISITS=False, GATED=False,
               SUBTREE=False, EXP=""):
    assert W in (16, 32, 64, 128)
    assert MODE in ("closest", "any")
    assert K in (8, 16)
    SUB = PACKET // 128
    KSHIFT = K.bit_length() - 1
    _SENT = jnp.int32(_SENT_I)
    # program_id is bound ONCE at kernel top level: binding it inside a
    # pl.when region fails to lower in interpret mode (no cpu MLIR rule)
    pid = pl.program_id(0)

    bestk_ref[:, :] = jnp.full((SUB, 128), _SENT, jnp.int32)
    bestc_ref[:, :] = jnp.zeros((SUB, 128), jnp.int32)
    vb_ref[:, :] = slab_ref[0, 6]
    vbh_ref[0] = jnp.max(slab_ref[0, 6])  # packet-max pruning bound (frs)
    m2_ref[0] = 0  # read unconditionally by the walk's first iteration
    if COUNT_VISITS:
        cnt_ref[0] = 0  # loop iterations (interior descends + pops)
        cnt_ref[1] = 0  # narrowphase fires
        cnt_ref[2] = 0  # group tests (each = K child boxes)

    def child_box(k, g):
        """Child k's box from the wide table column g (6 scalar reads).

        ``k`` may be a traced scalar: the row index is plain scalar
        arithmetic into the SMEM table (rows 7k..7k+5)."""
        base = 7 * k
        return (gnodes_ref[base, g], gnodes_ref[base + 1, g],
                gnodes_ref[base + 2, g], gnodes_ref[base + 3, g],
                gnodes_ref[base + 4, g], gnodes_ref[base + 5, g])

    def narrow_slot(k, g):
        """Narrowphase the leaf cluster sitting at slot (g, k)."""
        pay = gnodes_ref[7 * k + 6, g]
        c = (-pay - 1.0).astype(jnp.int32)
        ax, ay, az, bx, by, bz = child_box(k, g)
        if COUNT_VISITS:
            cnt_ref[1] = cnt_ref[1] + 1
        _narrow_cluster(
            c, (ax + bx) * 0.5, (ay + by) * 0.5, (az + bz) * 0.5,
            (ax, ay, az, bx, by, bz), groups_ref, slab_ref, lmat_ref,
            bestk_ref, bestc_ref, vb_ref, W=W, SUBTILE=SUBTILE, PACKET=PACKET,
            PRECISION=PRECISION, MODE=MODE, BOUNDED=BOUNDED, USE_BMAT=False,
        )
        if FRS:
            # refresh the scalar pruning bound (one reduce per FIRE — the
            # frs walk otherwise never syncs vector state to scalar)
            vbh_ref[0] = jnp.max(vb_ref[:, :])

    # The 6 ray slab rows are read-only for the whole walk: read them ONCE
    # and keep them live in vector registers. Re-reading them per group
    # test (the narrow kernel's live-state-minimizing rule) costs 7xSUB
    # vreg loads per test; the per-test VMEM load latency grows with SUB
    # and dominates the wide chain (gt_bench.py's hoisted serialized loop
    # runs at 1263 ns/test at P8192 vs 3427 measured in the real walk
    # before this change; hoisting + the region-free walk got 2896).
    # vbv must stay inside: the narrowphase refines it between tests.
    oix_h, oiy_h, oiz_h = slab_ref[0, 0], slab_ref[0, 1], slab_ref[0, 2]
    ix_h, iy_h, iz_h = slab_ref[0, 3], slab_ref[0, 4], slab_ref[0, 5]

    FRS = "frs" in EXP
    FR = ("fr" in EXP) and not FRS
    if FR or FRS:
        # Packet-frustum interval bounds (once per packet): the group test
        # at P8192 issues ~16 children x 15 ops x SUB vregs of VECTOR work
        # per iteration (~2 us at SUB=64 — the walk is VPU-throughput
        # bound, NOT chain-latency bound; the round-4 "dual" overlap
        # experiment measured -12% because the VPU is single-issue). Only
        # ~1-2 of 16 children actually fire, so a conservative SCALAR
        # interval slab test per child culls the vector work instead:
        # per-axis interval arithmetic over the packet's (oi, inv) ranges
        # — a superset of every per-ray test, so culled children are
        # provably miss for EVERY ray. The packet coherence sort is what
        # makes the intervals tight. TPU-shaped packet frustum culling
        # (the classic SIMD-packet trick, re-cast as scalar-vs-vector
        # work division).
        oix_lo, oix_hi = jnp.min(oix_h), jnp.max(oix_h)
        oiy_lo, oiy_hi = jnp.min(oiy_h), jnp.max(oiy_h)
        oiz_lo, oiz_hi = jnp.min(oiz_h), jnp.max(oiz_h)
        ix_lo, ix_hi = jnp.min(ix_h), jnp.max(ix_h)
        iy_lo, iy_hi = jnp.min(iy_h), jnp.max(iy_h)
        iz_lo, iz_hi = jnp.min(iz_h), jnp.max(iz_h)

        def _axis_iv(a_, b_, ivlo, ivhi, olo, ohi):
            """Interval (near_lo, far_hi) of the per-ray slab terms for one
            axis. Treating a ray's (oi, iv) as independent interval members
            is conservative (looser bounds, never tighter)."""
            t1lo = jnp.minimum(a_ * ivlo, a_ * ivhi) - ohi
            t1hi = jnp.maximum(a_ * ivlo, a_ * ivhi) - olo
            t2lo = jnp.minimum(b_ * ivlo, b_ * ivhi) - ohi
            t2hi = jnp.maximum(b_ * ivlo, b_ * ivhi) - olo
            return (jnp.minimum(t1lo, t2lo),  # near lower bound
                    jnp.maximum(t1hi, t2hi))  # far upper bound

        def frustum_pass(ax, ay, az, bx, by, bz, vbh=None):
            nxl, fxh = _axis_iv(ax, bx, ix_lo, ix_hi, oix_lo, oix_hi)
            nyl, fyh = _axis_iv(ay, by, iy_lo, iy_hi, oiy_lo, oiy_hi)
            nzl, fzh = _axis_iv(az, bz, iz_lo, iz_hi, oiz_lo, oiz_hi)
            tmin_lo = jnp.maximum(jnp.maximum(nxl, nyl), nzl)
            tmax_hi = jnp.minimum(jnp.minimum(fxh, fyh), fzh)
            # float-rounding slack: the interval chain rounds ~4 ulps; a
            # 1e-5-relative + small absolute inflation keeps the cull
            # conservative far beyond that (documented class; sub-slack
            # grazing fires are already in the kernel's grazing class).
            # NaN (empty slot) compares False => culled for free.
            lo = tmin_lo - (jnp.abs(tmin_lo) * 1e-5 + 1e-3)
            hi = tmax_hi + (jnp.abs(tmax_hi) * 1e-5 + 1e-3)
            ok = hi >= jnp.maximum(lo, 0.0)
            if vbh is not None:
                # packet-max pruning bound: any per-ray fire has
                # tmin_r < vb_r <= vbh and tmin_r >= lo, so lo < vbh
                ok = ok & (lo < vbh)
            return ok

    def group_test(g, en=None):
        """Slab-test all K children of group g; return the K-bit fired mask.

        K serial-chain-free child tests (each child's test depends only on
        its own 6 SMEM scalars — the scalar core runs ahead of the VPU),
        ONE log-tree OR fold and ONE reduce consumer at the end. Empty
        slots hold NaN boxes: every comparison is false, the bit never
        sets. With EXP "fr", each child's vector test is gated by the
        scalar frustum pre-test (`frustum_pass`); ``en`` folds the walk's
        enable bit into that gate so disabled iterations stay cheap."""
        oix, oiy, oiz = oix_h, oiy_h, oiz_h
        ix, iy, iz = ix_h, iy_h, iz_h
        vbv = vb_ref[:, :]
        if FR:
            macc_ref[:, :] = jnp.zeros((SUB, 128), jnp.int32)
            for k in range(K):
                ax, ay, az, bx, by, bz = child_box(k, g)
                ok = frustum_pass(ax, ay, az, bx, by, bz)
                if en is not None:
                    ok = ok & en

                @pl.when(ok)
                def _(ax=ax, ay=ay, az=az, bx=bx, by=by, bz=bz, k=k):
                    t1 = ax * ix - oix
                    t2 = bx * ix - oix
                    u1 = ay * iy - oiy
                    u2 = by * iy - oiy
                    v1 = az * iz - oiz
                    v2 = bz * iz - oiz
                    tmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                        jnp.minimum(v1, v2))
                    tmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                        jnp.maximum(v1, v2))
                    fired = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < vbv)
                    macc_ref[:, :] = macc_ref[:, :] | jnp.where(
                        fired, jnp.int32(1 << k), jnp.int32(0))
            macc = macc_ref[:, :]
        else:
            macc = jnp.zeros((SUB, 128), jnp.int32)
            for k in range(K):
                ax, ay, az, bx, by, bz = child_box(k, g)
                t1 = ax * ix - oix
                t2 = bx * ix - oix
                u1 = ay * iy - oiy
                u2 = by * iy - oiy
                v1 = az * iz - oiz
                v2 = bz * iz - oiz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                    jnp.minimum(v1, v2))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                    jnp.maximum(v1, v2))
                fired = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < vbv)
                macc = macc | jnp.where(fired, jnp.int32(1 << k), jnp.int32(0))
        # log-tree OR fold: sublanes, then lane rotations, then one reduce
        # (jnp.max over an all-equal tile == the OR; masks are nonnegative)
        # SUB must be a power of two or the halving fold drops rows
        # (_trace_wide_jit guards this; the auto-selection never routes
        # non-power-of-two packets here)
        assert SUB & (SUB - 1) == 0, SUB
        acc = macc
        s = SUB
        while s > 1:
            s //= 2
            acc = acc[:s, :] | acc[s:2 * s, :]
        for sh in (64, 32, 16, 8, 4, 2, 1):
            acc = acc | pltpu.roll(acc, sh, axis=1)
        if COUNT_VISITS:
            cnt_ref[2] = cnt_ref[2] + 1
        return jnp.max(acc)

    def narrow_mask(lm, g):
        """Narrowphase every set bit of the fired-LEAF mask ``lm`` of group
        ``g`` (a tight scalar ctz loop — no per-leaf walk iteration)."""

        def step(m):
            narrow_slot(_ctz16(m), g)
            return jax.lax.bitwise_and(m, m - 1)

        jax.lax.while_loop(lambda m: m != 0, step, lm)

    def enter(g, en=None):
        """Test group ``g``; narrowphase its fired leaves; return the
        fired INTERIOR bits (the only thing the walk stacks). ``en``
        (scalar bool) masks the whole call: the walk runs enter
        unconditionally (no pl.when region — see _make_mask_walk), so a
        disabled call must fire no narrowphase and return 0."""
        if "chainonly" in EXP or "walkall" in EXP:
            # DECOMPOSITION PROBES: the walk visits EVERY populated slot.
            # "chainonly" drops the vector test entirely (the pure serial
            # walk chain: ctz/stack/selects/back-edge + SMEM reads);
            # "walkall" keeps the test+reduce alive via an unprovable
            # sentinel compare but still visits everything. Both suppress
            # the narrowphase (every leaf would fire). Valid slots are
            # derived from payloads: leaf bits OR payload >= 0 (empty
            # slots hold payload -1 with the leaf bit clear — entering
            # them would walk garbage).
            lmask_p = gnodes_ref[7 * K, g].astype(jnp.int32)
            vmask = lmask_p
            for k in range(K):
                pay = gnodes_ref[7 * k + 6, g]
                vmask = vmask | jax.lax.select(
                    pay >= 0, jnp.int32(1 << k), jnp.int32(0))
            if "walkall" in EXP:
                mx = group_test(g)
                vmask = jax.lax.select(mx == jnp.int32(-123456),
                                       jnp.int32(0), vmask)
            m = vmask
            if en is not None:
                m = jax.lax.select(en, m, jnp.int32(0))
            return jax.lax.bitwise_and(m, jax.lax.bitwise_not(lmask_p))
        if FRS:
            # EXPERIMENT "frs": the scalar frustum mask IS the broadphase —
            # a conservative SUPERSET of the vector fired mask (interval
            # arithmetic over the packet bounds). No vector work, no
            # reduce->scalar sync in the walk at all; exactness is the
            # narrowphase's job (extra fired clusters only add real hit
            # candidates >= the true closest). Tie-class ids may differ
            # from the vector walk (looser vb pruning reaches tie
            # candidates the exact walk pruned).
            vbh = vbh_ref[0]
            m = jnp.int32(0)
            for k in range(K):
                ok = frustum_pass(*child_box(k, g), vbh=vbh)
                m = m | jax.lax.select(ok, jnp.int32(1 << k), jnp.int32(0))
            if COUNT_VISITS:
                cnt_ref[2] = cnt_ref[2] + 1
        else:
            m = group_test(g, en)
        if en is not None:
            m = jax.lax.select(en, m, jnp.int32(0))
        # leaf mask stored as a float VALUE (<= 2^K, exact in f32): scalar
        # f32<->i32 bitcast does not lower in Mosaic, int conversion does
        lmask = gnodes_ref[7 * K, g].astype(jnp.int32)
        lm = jax.lax.bitwise_and(m, lmask)
        if "nobase" in EXP:
            # pre-r5 behavior: unconditional nested loop (A/B reference)
            narrow_mask(lm, g)
        else:
            # DEFAULT (was EXP "nwhen"): skip the nested narrow-mask loop
            # when no leaf fired — miss-heavy walks fire leaves on ~0% of
            # iterations, and the zero-trip nested while still costs
            # (+2.7% ungated headline, results identical; r5 A/B)
            @pl.when(lm != 0)
            def _():
                narrow_mask(lm, g)
        return jax.lax.bitwise_and(m, jax.lax.bitwise_not(lmask))

    def _count_iter():
        cnt_ref[0] = cnt_ref[0] + 1

    walk = _make_mask_walk(gnodes_ref, stk_ref, m2_ref, enter,
                           count_iter=_count_iter if COUNT_VISITS else None)

    def run_traversal():
        if N_HINTS:
            base = pid * N_HINTS

            @pl.when(hints_ref[base] >= 0)
            def _():
                def seed(j, carry):
                    slot = hints_ref[base + j]
                    narrow_slot(jax.lax.bitwise_and(slot, K - 1),
                                jax.lax.shift_right_logical(slot, KSHIFT))
                    return carry

                jax.lax.fori_loop(0, N_HINTS, seed, 0)

        if SUBTREE:
            # Phase 1: walk the packet's predicted subtree(s) first — their
            # true best hits land in vb, so the phase-2 root walk is gated
            # down to the ancestor chain (VERDICT round-2 item 2; packet-ized
            # pruned descent, /root/reference/src/bvh/bvh_node.rs:327-374).
            # Two entry slots: packets whose samples span root children (the
            # planner's root-LCA tail) enter BOTH dominant subtrees. Any
            # pair is exact — even nested/equal entries — because each
            # skipped id's subtree is unconditionally fully walked here.
            sg = startg_ref[2 * pid]
            sg2 = startg_ref[2 * pid + 1]

            @pl.when(sg > 0)
            def _():
                walk(sg, enter(sg))

            # the second entry may be an ANCESTOR of the first (planner's
            # nested deep-first+LCA pair): skip the already-walked subtree
            # (inert when the pair is disjoint)
            @pl.when(sg2 > 0)
            def _():
                walk(sg2, enter(sg2), skip=(sg, sg))

            # Phase 2 (exactness): full walk from the root, skipping the
            # already-processed subtrees. Ids <= 0 never match a child id
            # (the root group 0 is nobody's child), so those skips are inert.
            walk(jnp.int32(0), enter(jnp.int32(0)), skip=(sg, sg2))
        elif "dual" in EXP:
            walk2 = _make_dual_walk(gnodes_ref, stk_ref, enter,
                                    count_iter=_count_iter
                                    if COUNT_VISITS else None)
            walk2(jnp.int32(0))
        else:
            walk(jnp.int32(0), enter(jnp.int32(0)))

    if GATED:
        @pl.when(gate_ref[pid] > 0)
        def _():
            run_traversal()
    else:
        run_traversal()

    bk = bestk_ref[:, :]
    LMASK = jnp.int32(W - 1)
    out_ref[0, 0:SUB] = pltpu.bitcast(bk & ~LMASK, jnp.float32)
    hit = bk < jnp.int32(_SENT_I)
    gid_out = bestc_ref[:, :] * W + jax.lax.bitwise_and(bk, LMASK)
    out_ref[0, SUB:2 * SUB] = jnp.where(hit, gid_out, -1).astype(jnp.float32)
    if COUNT_VISITS:
        out_ref[0, 0:1] = jnp.full((1, 128), cnt_ref[0].astype(jnp.float32))
        out_ref[0, 1:2] = jnp.full((1, 128), cnt_ref[1].astype(jnp.float32))
        out_ref[0, 2:3] = jnp.full((1, 128), cnt_ref[2].astype(jnp.float32))


def _trace_wide(gnodes, hints, gate, groups, slab, lmat, interpret=False,
                packet=2048, precision=jax.lax.Precision.HIGHEST,
                width=16, n_hints=0, mode="closest", bounded=False,
                count_visits=False, gated=False, k_ary=16, start_g=None,
                resident=None, exp: str = ""):
    if resident is None:
        # beyond ~12 MB the per-packet constant-index block re-fetch hits
        # the double-buffer cliff (CLAUDE.md); switch to the one-shot DMA
        resident = groups.size * 4 > 12 * 1024 * 1024
    p = slab.shape[0]
    subtree = start_g is not None
    if start_g is None:
        start_g = jnp.zeros((2 * p,), jnp.int32)
    else:
        # accept [p] (single entry) or [p, 2]; the kernel reads a flat
        # [2p] prefetch array (slots 2*pid, 2*pid+1)
        start_g = jnp.asarray(start_g, jnp.int32)
        if start_g.ndim == 1:
            start_g = jnp.stack(
                [start_g, jnp.full_like(start_g, -1)], axis=1)
        start_g = start_g.reshape(-1)
    return _trace_wide_jit(gnodes, hints, gate, start_g.astype(jnp.int32),
                           groups, slab, lmat, interpret=interpret,
                           packet=packet, precision=precision, width=width,
                           n_hints=n_hints, mode=mode, bounded=bounded,
                           count_visits=count_visits, gated=gated,
                           k_ary=k_ary, subtree=subtree, resident=resident,
                           exp=exp)


@partial(jax.jit, static_argnames=("interpret", "packet", "precision",
                                   "width", "n_hints", "mode", "bounded",
                                   "count_visits", "gated", "k_ary",
                                   "subtree", "resident", "exp"))
def _trace_wide_jit(gnodes, hints, gate, start_g, groups, slab, lmat,
                    interpret=False, packet=2048,
                    precision=jax.lax.Precision.HIGHEST,
                    width=16, n_hints=0, mode="closest", bounded=False,
                    count_visits=False, gated=False, k_ary=16,
                    subtree=False, resident=False, exp: str = ""):
    p = slab.shape[0]
    sub = packet // 128
    scratch = [
        pltpu.VMEM((sub, 128), jnp.int32),
        pltpu.VMEM((sub, 128), jnp.int32),
        pltpu.VMEM((sub, 128), jnp.float32),
        pltpu.SMEM((4,), jnp.int32),
        # 2*WIDE_DMAX slots per walk stream; the "dual" experiment runs two
        pltpu.SMEM((4 * WIDE_DMAX,), jnp.int32),
        pltpu.SMEM((1,), jnp.int32),
        # frustum-path fired-mask accumulator (per-child pl.when regions
        # cannot carry a vector loop value; unused on the base path)
        pltpu.VMEM((sub, 128), jnp.int32),
        # scalar packet-max pruning bound (frs frustum broadphase)
        pltpu.SMEM((1,), jnp.float32),
    ]
    if resident:
        groups_spec = pl.BlockSpec(memory_space=pltpu.ANY)
        scratch += [pltpu.VMEM(groups.shape, jnp.float32),
                    pltpu.SemaphoreType.DMA]
    else:
        groups_spec = pl.BlockSpec(groups.shape, lambda i, *_: (0, 0, 0),
                                   memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(p,),
        scratch_shapes=scratch,
        in_specs=[
            groups_spec,
            pl.BlockSpec((1,) + slab.shape[1:], lambda i, *_: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + lmat.shape[1:], lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * sub, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_wide_kernel(packet, precision, K=k_ary, width=width,
                          n_hints=n_hints, mode=mode, bounded=bounded,
                          count_visits=count_visits, gated=gated,
                          subtree=subtree, resident=resident, exp=exp),
        out_shape=jax.ShapeDtypeStruct((p, 2 * sub, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(gnodes, hints, gate, start_g, groups, slab, lmat)


def _pack_rays_tight(rays: Ray, packet: int, t_max=None, base=None, perm=None):
    """Pad rays to a packet multiple; build the slab and lmat kernel inputs.

    Slab rows: o*inv(3) | inv(3) | t_max. Row 6 seeds the per-lane pruning
    distance (inf when unbounded) — slab rows are only compared in the
    kernel, never multiplied, so inf is safe there.

    ``base``: a previous pack of the SAME rays/packet — only the t_max row
    is rebuilt (the chained tracer re-traces identical rays per part with a
    shrinking bound; rows 0-5 and the lmat transpose are the expensive
    part).

    ``perm``: optional [r] i32 coherence-sort permutation over UNSORTED
    ``rays``. When given, every slab/lmat row is built by one per-field
    gather that lands directly in the kernel layout — removing both XLA
    transposes ([rp,7]->[p,7,sub,128] and [p,packet,16]->[p,16,packet],
    ~180MB of HBM round-trips at 2M rays) plus the separate [r,3] ray
    gathers. Values are bit-identical to sorting first (elementwise ops
    commute with the permutation). Packed lanes follow sorted order, so
    kernel outputs come back in sorted order either way.
    """
    if packet < 128 or packet & (packet - 1):
        # every kernel path assumes power-of-two sublane counts (the wide
        # walk's sublane OR-fold drops rows otherwise — silently wrong
        # results, not an error) and 128-lane tiles; no shipped config is
        # non-power-of-two, so reject loudly instead
        raise ValueError(f"packet must be a power of two >= 128, got {packet}")
    r = rays.origin.shape[0]
    pad = (-r) % packet
    if base is not None:
        p, rp, slab_prev, lmat = base
        sub = packet // 128
        if t_max is None:
            tm = jnp.full((rp, 1), _INF, jnp.float32)
        else:
            tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1, 1), (r, 1))
            if pad:
                tm = jnp.concatenate([tm, jnp.full((pad, 1), _INF, jnp.float32)], axis=0)
        tm_r = tm.reshape(p, sub, 128)[:, None]  # [p, 1, sub, 128]
        return p, rp, jnp.concatenate([slab_prev[:, :6], tm_r], axis=1), lmat
    if perm is not None:
        rp = r + pad
        p = rp // packet
        sub = packet // 128
        pp = perm.astype(jnp.int32)
        if pad:
            # pad lanes gather an appended sentinel row (index r) per field
            pp = jnp.concatenate([pp, jnp.full((pad,), r, jnp.int32)])
        o, d, inv = rays.origin, rays.direction, rays.inv_direction
        inv_c = jnp.clip(inv, -1.0e30, 1.0e30)

        def row(f, padval):
            if pad:
                f = jnp.concatenate([f, jnp.full((1,), padval, jnp.float32)])
            return f[pp]

        # gather the 9 base fields (o, d, inv) plus the 3 cross rows; the
        # oi rows derive as single multiplies of gathered rows — one
        # rounding either side of the permutation, so bit-identical to
        # gathering precomputed oi (12 random gathers instead of 15;
        # gathers are the measured prep cost driver). The CROSS rows must
        # stay pre-gather: a*b - c*d invites FMA contraction, and the
        # compiler contracts differently in the gathered context (measured
        # exactly ulp(coord) = 2^-7 drift at 1e5 coordinates), breaking
        # the perm-vs-presorted bit-identity contract.
        m = jnp.cross(o, d)
        ox, oy, oz = row(o[:, 0], 2.0e30), row(o[:, 1], 2.0e30), row(o[:, 2], 2.0e30)
        dx, dy, dz = row(d[:, 0], 1.0), row(d[:, 1], 1.0), row(d[:, 2], 1.0)
        ivx, ivy, ivz = (row(inv_c[:, 0], 1.0), row(inv_c[:, 1], 1.0),
                         row(inv_c[:, 2], 1.0))
        mx, my, mz = row(m[:, 0], 0.0), row(m[:, 1], 0.0), row(m[:, 2], 0.0)

        def srow(f):
            return f.reshape(p, 1, sub, 128)

        def lrow(f):
            return f.reshape(p, 1, packet)

        if t_max is None:
            tm_r = jnp.full((p, 1, sub, 128), _INF, jnp.float32)
        else:
            tmf = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1), (r,))
            tm_r = srow(row(tmf, _INF))
        slab = jnp.concatenate(
            [srow(ox * ivx), srow(oy * ivy), srow(oz * ivz),
             srow(ivx), srow(ivy), srow(ivz),
             tm_r], axis=1)  # [p, 7, sub, 128]
        lmat = jnp.concatenate(
            [lrow(dx), lrow(dy), lrow(dz),
             lrow(mx), lrow(my), lrow(mz),
             lrow(ox), lrow(oy), lrow(oz),
             jnp.ones((p, 1, packet), jnp.float32),
             jnp.zeros((p, 6, packet), jnp.float32)], axis=1)  # [p, 16, packet]
        return p, rp, slab, lmat
    o = jnp.concatenate([rays.origin, jnp.full((pad, 3), 2.0e30, jnp.float32)], axis=0) if pad else rays.origin
    d = jnp.concatenate([rays.direction, jnp.ones((pad, 3), jnp.float32)], axis=0) if pad else rays.direction
    inv = jnp.concatenate([rays.inv_direction, jnp.ones((pad, 3), jnp.float32)], axis=0) if pad else rays.inv_direction
    rp = r + pad
    p = rp // packet
    sub = packet // 128

    # Clamp infinite inverse directions so the kernel's FMA slab form
    # (b*inv - o*inv) stays finite for axis-parallel rays. Consequence: a ray
    # lying exactly in a box's face plane counts as touching (the reference's
    # NaN quirk makes it a miss, src/ray/intersect_default.rs:22-28); the
    # pure-JAX traversal path keeps the reference semantics exactly.
    inv_c = jnp.clip(inv, -1.0e30, 1.0e30)
    if t_max is None:
        tm = jnp.full((rp, 1), _INF, jnp.float32)
    else:
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1, 1), (r, 1))
        if pad:
            tm = jnp.concatenate([tm, jnp.full((pad, 1), _INF, jnp.float32)], axis=0)
    slab = jnp.concatenate([o * inv_c, inv_c, tm], axis=1)  # [rp, 7]
    slab = slab.reshape(p, sub, 128, 7).transpose(0, 3, 1, 2)  # [p, 7, sub, 128]

    m = jnp.cross(o, d)
    ones = jnp.ones((rp, 1), jnp.float32)
    zeros = jnp.zeros((rp, 6), jnp.float32)
    # transposed layout [p, 16, packet]: the kernel's narrowphase keeps rays
    # on the lane axis (see narrow_subtile)
    lmat = (jnp.concatenate([d, m, o, ones, zeros], axis=1)
            .reshape(p, packet, 16).transpose(0, 2, 1))
    return p, rp, slab, lmat


def trace_closest_hit_tight(scene, rays: Ray, tris=None, interpret: bool = False,
                            packet: int = 2048,
                            precision=jax.lax.Precision.HIGHEST,
                            skip_narrow: bool = False,
                            hints: jnp.ndarray | None = None,
                            t_max=None, sweep: bool = False,
                            wide: bool | None = None,
                            pre_gate=None,
                            start_g: jnp.ndarray | None = None,
                            perm: jnp.ndarray | None = None,
                            _base=None, _exp: str = "") -> HitRecord:
    """Closest hit against a ``TightScene`` (the fast path for sparse scenes).

    Same contract as ``trace_closest_hit``: returns packed (t, triangle id);
    pass ``tris=(a, b, c)`` for exact (u, v, t) recomputed on the winner.

    ``hints``: optional [n_packets, K] i32 leaf-node ids per packet; those
    leaves are narrowphased before traversal to seed the per-lane pruning
    distances (see ``trace_closest_hit_seeded``). -1 in slot 0 disables a
    packet's seeding; other slots must repeat a valid hint. With ``perm``,
    packets follow SORTED order — compute hints (and ``start_g``) from the
    sorted rays, or the seeding addresses the wrong packets (results stay
    exact — seeded distances are real distances and the two-phase walk
    re-checks everything — but the hints stop helping).

    ``t_max``: optional scalar or [n] per-ray upper distance bound — hits at
    t >= t_max are misses, and the bound prunes traversal from the start.

    ``sweep``: run a narrowphase-free broadphase pre-pass per packet and
    skip the full traversal for packets that cannot fire. Large win on
    miss-heavy batches (+24% measured on the random headline: gated-off
    packets cost ~nothing), small overhead on hit-dense ones. Results are
    identical either way.

    ``perm``: optional [n] i32 coherence-sort permutation (from
    ``sort_rays_device``) over UNSORTED ``rays``. The sort is applied
    during packing via per-field gathers that write the kernel layout
    directly — cheaper than gathering the rays first (see
    ``_pack_rays_tight``). Outputs come back in SORTED order, exactly as
    if the caller had passed pre-sorted rays; un-permute with the inverse.

    Tolerance class: the kernel's packed min-reduce steals the low
    log2(width) mantissa bits of t for the winning lane, so the raw t (and
    the pruning/occlusion comparison against ``t_max``) can sit up to
    width-1 ulps below the true hit distance (~15 ulps at the default
    width=16; width 64/128 scenes widen it accordingly). Hits within that
    band of ``t_max`` may flip. Passing ``tris`` recomputes the winner's
    exact t. See also the grazing-edge / face-plane caveats in the module
    header.
    """
    r = rays.origin.shape[0]
    if r == 0:
        z = jnp.zeros((0,), jnp.float32)
        return HitRecord(z, z, z, jnp.zeros((0,), jnp.int32))
    p, rp, slab, lmat = _pack_rays_tight(rays, packet, t_max, base=_base,
                                         perm=perm)

    if hints is None:
        hints_arr = jnp.zeros((p * 1,), jnp.int32)
        n_hints = 0
    else:
        assert hints.shape[0] == p, (hints.shape, p)
        n_hints = int(hints.shape[1])
        hints_arr = hints.reshape(-1).astype(jnp.int32)
    bg = getattr(scene, "bgroups", None)
    pn = getattr(scene, "packed_nodes", None)
    gn = getattr(scene, "gnodes", None)
    auto_wide = gn is not None and bg is None and pn is None and not skip_narrow
    if wide is None:
        wide = auto_wide
    if wide:
        assert gn is not None, "scene built without wide tables (wide=False?)"
        assert bg is None and pn is None and not skip_narrow, \
            "wide walk composes with the default narrowphase only"
    if hints is not None and n_hints:
        # hint FORMAT is tied to the walk (wide: leaf slot ids g*K+k;
        # entry/exit: node-table ids) — the seeder emits the scene's
        # default format, so an explicit wide= override would misread them
        assert wide == auto_wide, \
            "hints follow the scene's default walk; do not override wide="
    sn = _dev(pn if pn is not None else scene.smem_nodes)
    pg = None if pre_gate is None else pre_gate.astype(jnp.int32)
    if sweep and not skip_narrow:
        swn = getattr(scene, "sweep_nodes", None)
        if swn is not None:
            swt, swp = _dev(swn), False
        else:
            swt, swp = sn, pn is not None
        fired = _sweep_tight(swt, slab, num_nodes=int(swt.shape[1]),
                             interpret=interpret, packet=packet, packed=swp,
                             pre_gate=pg)
        gate = (fired[:, 0, 0] > 0).astype(jnp.int32)
    elif pg is not None:
        gate = pg
    else:
        gate = jnp.zeros((p,), jnp.int32)
    if start_g is not None:
        assert wide, "start_g (subtree entry) requires the wide walk"
        assert start_g.shape[0] == p and start_g.ndim in (1, 2), \
            (start_g.shape, p)
    if wide:
        out = _trace_wide(
            _dev(gn),
            hints_arr,
            gate,
            _dev(scene.groups),
            slab,
            lmat,
            interpret=interpret,
            packet=packet,
            precision=precision,
            width=int(getattr(scene, "width", 16)),
            n_hints=n_hints,
            bounded=t_max is not None,
            gated=sweep or pg is not None,
            start_g=start_g,
            exp=_exp,
        )
    else:
        out = _trace_tight(
            sn,
            hints_arr,
            gate,
            _dev(bg if bg is not None else scene.groups),
            slab,
            lmat,
            num_nodes=int(sn.shape[1]),
            interpret=interpret,
            packet=packet,
            precision=precision,
            skip_narrow=skip_narrow,
            width=int(getattr(scene, "width", 16)),
            n_hints=n_hints,
            bounded=t_max is not None,
            use_bmat=bg is not None,
            gated=(sweep and not skip_narrow) or pg is not None,
            packed=pn is not None,
        )
    sub = packet // 128
    t = out[:, :sub].reshape(rp)[:r]
    lane_id = out[:, sub:].reshape(rp)[:r].astype(jnp.int32)
    if t_max is not None:
        # a miss leaves t parked at t_max; restore the t=inf miss contract
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1), (r,))
        if perm is not None and tm.shape[0] == r:
            tm = tm[perm]
        t = jnp.where(t < tm, t, _INF)
    hit = jnp.isfinite(t)
    tri_map = _dev(scene.tri_map)
    sid = jnp.where(hit, tri_map[jnp.clip(lane_id, 0, tri_map.shape[0] - 1)], -1)
    if tris is not None:
        from ..ray import ray_intersects_triangle

        # with perm, packed lanes (and hence outputs) follow SORTED order;
        # the winner recompute must gather the rays to match — only here
        # (gathering unconditionally would waste three [r,3] gathers on
        # the tris=None headline path)
        rays_p = rays if perm is None else jax.tree_util.tree_map(
            lambda x: x[perm], rays)
        ta, tb, tc = tris
        safe = jnp.maximum(sid, 0)
        # one interleaved gather, not three (gather cost tracks op COUNT
        # on this chip — r5 probe: 3x[n,3] 33.6 ms vs 1x[n,9] 9.2 ms/1M)
        g9 = jnp.concatenate([ta, tb, tc], axis=1)[safe]
        inter = ray_intersects_triangle(rays_p, g9[:, 0:3], g9[:, 3:6],
                                        g9[:, 6:9])
        u = jnp.where(hit, inter.u, 0.0)
        v = jnp.where(hit, inter.v, 0.0)
        t = jnp.where(hit, jnp.where(jnp.isfinite(inter.distance), inter.distance, t), t)
    else:
        u = jnp.zeros_like(t)
        v = jnp.zeros_like(t)
    return HitRecord(t, u, v, sid)


def make_tracer(scene, packet: int = 8192, sweep: bool = True,
                sort: str | None = "octant", bits: int = 2,
                tris=None, interpret: bool = False,
                plan: str | None = None,
                precision=jax.lax.Precision.HIGHEST):
    """ONE-program closest-hit pipeline over a fixed scene.

    ``trace_closest_hit_tight`` is a per-call API: each invocation
    dispatches sort, gathers, pack, sweep, walk, and epilogue as separate
    XLA programs. That is fine inside a larger jit (``diff.render_depth_fast``
    composes it), but the bare call path leaves ~3x on the floor for
    coherent camera batches (round-4 verdict item 2: plain camera 2.22 M
    vs 6.43 M rays/s for the IDENTICAL trace inside the jitted fwd+bwd
    leg). This factory closes over the scene's device tables and jits the
    whole pipeline — raw (origins, directions) in, ORIGINAL-order
    ``HitRecord`` out, one dispatch per call.

    ``sort``: "octant" / "morton" coherence sort inside the program, or
    None when the caller's rays are already coherent (camera tiles).
    ``tris``: optional (a, b, c) vertex arrays for the exact-(u, v, t)
    winner recompute, captured on device.
    ``plan="key"``: fold the free subtree-entry planner
    (``make_key_planner``) into the program — for aimed/convergent
    workloads on wide scenes (pair with ``sort="morton"``).

    Build once per scene (each factory call compiles its own program);
    reuse across batches of the same size. Reference analog: the amortized
    per-frame trace loop every renderer builds around flat_bvh.rs:396-431.
    """
    tris_d = None if tris is None else tuple(_dev(x) for x in tris)
    planner = (make_key_planner(scene, packet=packet) if plan == "key"
               else None)

    @jax.jit
    def tracer(origins, directions):
        if sort is not None:
            perm, inv = sort_rays_device(origins, directions, bits=bits,
                                         mode=sort)
            # ONE fused [r, 6] gather for o+d, then normalize: gather cost
            # tracks op COUNT, not bytes (r5 probes — the separate o/d
            # gathers cost ~13 ms more per 2M rays, and a
            # normalize-then-3-gather order another ~12%); bit-identical
            # (elementwise normalize commutes with the permutation).
            od = jnp.concatenate([origins, directions], axis=1)[perm]
            rays_s = Ray.create(od[:, 0:3], od[:, 3:6])
        else:
            rays_s = Ray.create(origins, directions)
        sg = planner(rays_s.origin) if planner is not None else None
        out = trace_closest_hit_tight(scene, rays_s, tris=tris_d,
                                      packet=packet, sweep=sweep,
                                      interpret=interpret,
                                      start_g=sg,
                                      precision=precision)
        if sort is None:
            return out
        bc = jax.lax.bitcast_convert_type
        # fused un-permute: t (bitcast to i32) and shape_id share ONE
        # gather. The fusion must run in the INT domain: hardware float
        # data movement CANONICALIZES NaN payloads (sid=-1 bitcast to f32
        # is 0xFFFFFFFF, a NaN, and came back 0x7FC00000 on the TPU —
        # caught by the r5 hardware verify; interpret mode hides it).
        # Int lanes carry any f32 bit pattern (inf included) inertly.
        if tris_d is None:
            # u/v are zeros on this path: no need to un-permute them
            comb = jnp.stack([bc(out.t, jnp.int32), out.shape_id],
                             axis=1)[inv]
            return HitRecord(bc(comb[:, 0], jnp.float32), out.u, out.v,
                             comb[:, 1])
        comb = jnp.stack(
            [bc(out.t, jnp.int32), bc(out.u, jnp.int32),
             bc(out.v, jnp.int32), out.shape_id], axis=1)[inv]
        return HitRecord(bc(comb[:, 0], jnp.float32),
                         bc(comb[:, 1], jnp.float32),
                         bc(comb[:, 2], jnp.float32), comb[:, 3])

    return tracer


def trace_any_hit_tight(scene, rays: Ray, t_max=None, interpret: bool = False,
                        packet: int = 2048,
                        precision=jax.lax.Precision.HIGHEST,
                        sweep: bool = False,
                        wide: bool | None = None,
                        pre_gate=None,
                        perm: jnp.ndarray | None = None,
                        _base=None) -> jnp.ndarray:
    """True per ray iff any triangle hit with t < t_max exists (occlusion).

    The shadow-ray / visibility query (the Pallas analog of
    ``bvh.any_hit_triangles``; reference semantics: ``traverse`` +
    per-shape intersection, src/bvh/bvh_impl.rs:350-378). Unlike the
    closest-hit trace, a lane is *disabled* the moment any in-range hit is
    found (its pruning distance drops to -inf) and the t_max bound prunes
    from the first node: measured 3.0M vs 1.36M rays/s (2.2x closest-hit)
    on the bench's aimed all-hit workload with a t_max at 1.2x the hit
    distance; unbounded any-hit matches closest-hit on sparse scenes (the
    cost is reaching the first leaf, identical in both modes).

    ``t_max``: scalar or [n] per-ray bound; pass the distance to the light
    for shadow rays. None means any hit at all occludes. The packed best-t
    carries a width-1-ulp truncation (see ``trace_closest_hit_tight``), so
    an occluder within ~width ulps of ``t_max`` may count as inside the
    bound.
    """
    r = rays.origin.shape[0]
    if r == 0:
        return jnp.zeros((0,), bool)
    p, rp, slab, lmat = _pack_rays_tight(rays, packet, t_max, base=_base,
                                         perm=perm)
    bg = getattr(scene, "bgroups", None)
    pn = getattr(scene, "packed_nodes", None)
    gn = getattr(scene, "gnodes", None)
    if wide is None:
        wide = gn is not None and bg is None and pn is None
    if wide:
        assert gn is not None, "scene built without wide tables (wide=False?)"
        assert bg is None and pn is None, \
            "wide walk composes with the default narrowphase only"
    sn = _dev(pn if pn is not None else scene.smem_nodes)
    pg = None if pre_gate is None else pre_gate.astype(jnp.int32)
    if sweep:
        swn = getattr(scene, "sweep_nodes", None)
        if swn is not None:
            swt, swp = _dev(swn), False
        else:
            swt, swp = sn, pn is not None
        fired = _sweep_tight(swt, slab, num_nodes=int(swt.shape[1]),
                             interpret=interpret, packet=packet, packed=swp,
                             pre_gate=pg)
        gate = (fired[:, 0, 0] > 0).astype(jnp.int32)
    elif pg is not None:
        gate = pg
    else:
        gate = jnp.zeros((p,), jnp.int32)
    if wide:
        out = _trace_wide(
            _dev(gn),
            jnp.zeros((p,), jnp.int32),
            gate,
            _dev(scene.groups),
            slab,
            lmat,
            interpret=interpret,
            packet=packet,
            precision=precision,
            width=int(getattr(scene, "width", 16)),
            mode="any",
            bounded=t_max is not None,
            gated=sweep or pg is not None,
        )
    else:
        out = _trace_tight(
            sn,
            jnp.zeros((p,), jnp.int32),
            gate,
            _dev(bg if bg is not None else scene.groups),
            slab,
            lmat,
            num_nodes=int(sn.shape[1]),
            interpret=interpret,
            packet=packet,
            precision=precision,
            width=int(getattr(scene, "width", 16)),
            mode="any",
            bounded=t_max is not None,
            use_bmat=bg is not None,
            gated=sweep or pg is not None,
            packed=pn is not None,
        )
    t = out[:, : packet // 128].reshape(rp)[:r]
    if t_max is None:
        return jnp.isfinite(t)
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1), (r,))
    if perm is not None:
        tm = tm[perm]
    return t < tm


@partial(jax.jit, static_argnames=("bits", "mode"))
def sort_rays_device(origins: jnp.ndarray, directions: jnp.ndarray,
                     bits: int = 6, mode: str = "octant"):
    """Device-side coherence sort. Returns (perm, inv) int32 permutations.

    The jnp analog of ``sort_rays`` — keeps the whole pipeline on-chip (the
    host round trip costs more than the sort on a remote-attached TPU).

    ``mode="octant"``: direction octant, then origin cell (x-major
    lexicographic at ``bits``/axis). Groups rays by heading first — best
    for sparse random-ray batches where direction coherence dominates.

    ``mode="morton"``: origin Morton cell (interleaved bits — compact 3-D
    cells, not slabs), then direction octant. Best for convergent /
    aimed / secondary-bounce bundles: a lexicographic key packs thin
    x-slabs whose tree-footprint LCA is the root, while Morton packets
    are spatially tight, so the subtree-entry planner
    (``make_planner``) actually engages (measured: root-frac 1.0 -> <0.3
    on the aimed workload; ``bits`` is ignored — the cell grid is the
    Morton 512^3).

    ``mode="octmorton"``: direction octant MAJOR, origin Morton cell
    minor — octant-first like the default (direction coherence dominates
    on sparse random batches) but with spatially-compact 3-D cells
    instead of the lex key's thin x-slabs.
    """
    o = origins
    d = directions
    octant = (
        (d[:, 0] > 0).astype(jnp.int32) * 4
        + (d[:, 1] > 0).astype(jnp.int32) * 2
        + (d[:, 2] > 0).astype(jnp.int32)
    )
    lo = o.min(axis=0)
    hi = o.max(axis=0)
    if mode == "morton":
        from ..bvh.lbvh import morton_codes
        m = morton_codes(o, lo, hi)  # 30-bit interleave, 1024^3
        key = ((m >> 3) << 3) | octant  # 512^3 cells + octant low bits
    elif mode == "octmorton":
        from ..bvh.lbvh import morton_codes
        m = morton_codes(o, lo, hi)
        key = (octant << 27) | (m >> 3)  # octant major, 512^3 cells minor
    else:
        scale = (2.0**bits - 1.0) / jnp.maximum(hi - lo, 1e-30)
        q = ((o - lo) * scale).astype(jnp.int32)
        key = (((octant << (3 * bits)) | (q[:, 0] << (2 * bits))
                | (q[:, 1] << bits)) | q[:, 2])
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(jnp.arange(perm.shape[0], dtype=jnp.int32))
    return perm, inv


def trace_closest_hit_seeded(scene, rays: Ray, tris=None, packet: int = 2048,
                             sample_stride: int = 32, k_hints: int = 64,
                             precision=jax.lax.Precision.HIGHEST,
                             interpret: bool = False) -> HitRecord:
    """Closest hit with sampled-hit seeding (hit-dense workloads).

    Traces every ``sample_stride``-th ray first, maps the sampled hits back
    to their leaf nodes, and passes up to ``k_hints`` distinct hit leaves per
    packet as seeding hints: the main trace narrowphases them before
    traversal, so the per-lane pruning distances are warm and the sweep
    skips most of the tree (the TPU-shaped analog of ray-history /
    hash-based traversal prediction). Misses nothing: seeding only tightens
    pruning bounds; results are identical to ``trace_closest_hit_tight``.

    An unhit lane keeps vb=inf and pulls its whole packet into every
    subtree, so coverage matters more than hint cost: stride 32 / 64 hints
    measured +35% on the aimed all-hit workload (a packet visits ~10.7k
    upper nodes cold vs ~40 genuinely needed); larger k went negative
    (each hint pays the narrowphase region latency). A LOSS on miss-heavy
    or wide-leaf workloads — benchmark before adopting.
    """
    hints = compute_seed_hints(scene, rays, packet=packet,
                               sample_stride=sample_stride, k_hints=k_hints,
                               precision=precision, interpret=interpret)
    if hints is None:
        return trace_closest_hit_tight(scene, rays, tris=tris, packet=packet,
                                       precision=precision, interpret=interpret)
    return trace_closest_hit_tight(
        scene, rays, tris=tris, packet=packet, precision=precision,
        interpret=interpret, hints=hints,
    )


def compute_seed_hints(scene, rays: Ray, packet: int = 2048,
                       sample_stride: int = 32, k_hints: int = 64,
                       precision=jax.lax.Precision.HIGHEST,
                       interpret: bool = False):
    """Sampled-hit seeding hints for ``trace_closest_hit_tight(hints=...)``.

    Host-side (numpy) — compute once per (scene, ray batch) OUTSIDE jit and
    pass the returned [n_packets, k] array into jitted render/trace calls
    (see ``diff.render_depth_fast``). Returns None when the batch is too
    small to sample.
    """
    import numpy as np_

    r = rays.origin.shape[0]
    if r == 0 or r < sample_stride:
        return None
    # the sample->packet mapping below reshapes by packet // sample_stride;
    # a stride that does not divide the packet would silently assign hints
    # to the wrong packets (correct results, zero seeding benefit)
    assert packet % sample_stride == 0, (packet, sample_stride)

    sample = Ray(
        rays.origin[::sample_stride],
        rays.direction[::sample_stride],
        rays.inv_direction[::sample_stride],
    )
    pre = trace_closest_hit_tight(scene, sample, packet=min(packet, 1024),
                                  precision=precision, interpret=interpret)
    # sampled hit triangle -> cluster -> hint id (host, small arrays)
    lane_of_tri, node_of_cluster, n_tris, W = _hint_tables(scene)

    sid = np_.asarray(pre.shape_id)
    pad = (-r) % packet
    p = (r + pad) // packet
    rpp = packet // sample_stride
    ns = p * rpp
    sid_pad = np_.full(ns, -1, np_.int64)
    sid_pad[: sid.shape[0]] = sid
    BIG = np_.int64(1 << 40)
    cl = np_.where(sid_pad >= 0, lane_of_tri[np_.clip(sid_pad, 0, None)] // W, BIG)
    cl = np_.sort(cl.reshape(p, rpp), axis=1)
    first = np_.ones_like(cl, dtype=bool)
    first[:, 1:] = cl[:, 1:] != cl[:, :-1]
    first &= cl < BIG
    # rank of each distinct cluster within its row; keep the first k_hints
    rank = np_.cumsum(first, axis=1) - 1
    keep = first & (rank < k_hints)
    hints = np_.full((p, k_hints), -1, np_.int64)
    rows = np_.nonzero(keep)[0]
    hints[rows, rank[keep]] = node_of_cluster[cl[keep]]
    # repeat-fill empty slots with the packet's first hint (idempotent)
    fill = hints[:, 0:1]
    hints = np_.where(hints < 0, fill, hints)
    return jnp.asarray(hints, jnp.int32)


def _traces_wide(scene) -> bool:
    """True iff the DEFAULT trace path for this scene is the wide group walk.

    Must mirror ``trace_closest_hit_tight``'s wide auto-selection exactly:
    hint FORMATS differ between the kernels (wide: leaf slot ids g*K+k;
    entry/exit: node-table ids), so a seeder/planner keying only on
    ``gnodes`` would feed wide slot ids to the entry/exit kernel on
    bmat/packed scenes — out-of-range cursors at best, garbage narrowphase
    records at worst.
    """
    return (getattr(scene, "gnodes", None) is not None
            and getattr(scene, "bgroups", None) is None
            and getattr(scene, "packed_nodes", None) is None)


def _hint_tables(scene):
    """Shared triangle->lane and cluster->hint-id tables for the seeding
    pipeline: ``(lane_of_tri, node_of_cluster, n_tris, W)``, int64 numpy.

    The hint-id FORMAT is tied to the scene's default walk
    (``_traces_wide``): wide scenes use leaf SLOT ids g*K+k, entry/exit
    scenes use node-table ids. Every consumer (``compute_seed_hints``,
    ``make_seeder``) must derive both tables HERE so the format cannot
    drift between them (the round-3 hint-format bug was exactly such a
    drift)."""
    tri_map = np.asarray(scene.tri_map)
    n_tris = int(tri_map.max()) + 1
    W = int(getattr(scene, "width", 16))
    lane_of_tri = np.zeros(n_tris, np.int64)
    valid = tri_map >= 0
    lane_of_tri[tri_map[valid]] = np.nonzero(valid)[0]
    if _traces_wide(scene):
        # wide-walk scenes: hints are leaf SLOT ids g*K+k (see _wide_body)
        node_of_cluster = np.asarray(scene.gslot, np.int64)
    else:
        nodes_entry = np.asarray(scene.smem_nodes[6])
        leaf_nodes = np.nonzero(nodes_entry < 0)[0]
        leaf_cluster = (-nodes_entry[leaf_nodes] - 1.0).astype(np.int64)
        node_of_cluster = np.zeros(int(scene.num_clusters), np.int64)
        node_of_cluster[leaf_cluster] = leaf_nodes
    return lane_of_tri, node_of_cluster, n_tris, W


def count_visits_tight(scene, rays: Ray, packet: int = 2048,
                       interpret: bool = False):
    """Broadphase-visit / narrowphase-fire counters per packet (debug mode).

    Runs the tight kernel with per-iteration SMEM counters (NOT a timed
    configuration: the counter stores serialize the loop) and returns
    ``(visits [n_packets], fires [n_packets])`` int arrays. bench.py feeds
    these into its roofline block — visits x measured ns/visit is this
    kernel's cost model.
    """
    r = rays.origin.shape[0]
    if r == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    p, rp, slab, lmat = _pack_rays_tight(rays, packet, None)
    bg = getattr(scene, "bgroups", None)
    # packed scenes must count through the packed table (like the timed
    # kernel does): the unpacked kernel derives the cluster-frame origin
    # from the f32 box center while packed group rows are packed against
    # the raw packed scalars — mixing them skews narrowphase distances and
    # therefore the pruning-dependent visit/fire counters
    pn = getattr(scene, "packed_nodes", None)
    sn = _dev(pn if pn is not None else scene.smem_nodes)
    out = _trace_tight(
        sn,
        jnp.zeros((p,), jnp.int32),
        jnp.zeros((p,), jnp.int32),
        _dev(bg if bg is not None else scene.groups),
        slab,
        lmat,
        num_nodes=int(sn.shape[1]),
        interpret=interpret,
        packet=packet,
        width=int(getattr(scene, "width", 16)),
        use_bmat=bg is not None,
        count_visits=True,
        packed=pn is not None,
    )
    visits = np.asarray(out[:, 0, 0]).astype(np.int64)
    fires = np.asarray(out[:, 1, 0]).astype(np.int64)
    return visits, fires


def count_visits_wide(scene, rays: Ray, packet: int = 2048,
                      interpret: bool = False, start_g=None, exp: str = ""):
    """Wide-kernel counters per packet (debug mode; NOT a timed config).

    Returns ``(iterations, fires, group_tests)`` int arrays [n_packets]:
    loop iterations (= fired children + pops), narrowphase fires, and
    16-child group tests. The wide kernel's cost model is
    ``iterations x chain_latency + group_tests x vector_cost +
    fires x narrow_cost`` — bench.py's roofline uses these.
    ``start_g``: optional per-packet subtree-entry groups (same as
    ``trace_closest_hit_tight``) so the two-phase walk can be costed.
    """
    r = rays.origin.shape[0]
    if r == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    gn = getattr(scene, "gnodes", None)
    assert gn is not None, "scene built without wide tables"
    p, rp, slab, lmat = _pack_rays_tight(rays, packet, None)
    out = _trace_wide(
        _dev(gn),
        jnp.zeros((p,), jnp.int32),
        jnp.zeros((p,), jnp.int32),
        _dev(scene.groups),
        slab,
        lmat,
        interpret=interpret,
        packet=packet,
        width=int(getattr(scene, "width", 16)),
        count_visits=True,
        start_g=start_g,
        exp=exp,
    )
    iters = np.asarray(out[:, 0, 0]).astype(np.int64)
    fires = np.asarray(out[:, 1, 0]).astype(np.int64)
    gtests = np.asarray(out[:, 2, 0]).astype(np.int64)
    return iters, fires, gtests


@jax.jit
def _part_root_gate(slab, box, best_t):
    """Per-packet gate for one chained part: does ANY ray in the packet hit
    the part's ROOT box closer than its current best t?

    One fused XLA op over [n_packets, packet] — replaces a full sweep-walk
    dispatch per part for packets that cannot touch the part at all (the
    parts are Morton-compact, so most packets miss most parts). The sweep
    still refines the survivors; a pre-gated-off packet skips both the
    sweep walk and the main kernel (VERDICT round-2 item 5).
    """
    oix, oiy, oiz = slab[:, 0], slab[:, 1], slab[:, 2]
    ix, iy, iz = slab[:, 3], slab[:, 4], slab[:, 5]
    ax, ay, az, bx, by, bz = (box[i] for i in range(6))
    t1 = ax * ix - oix
    t2 = bx * ix - oix
    u1 = ay * iy - oiy
    u2 = by * iy - oiy
    v1 = az * iz - oiz
    v2 = bz * iz - oiz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                       jnp.minimum(v1, v2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                       jnp.maximum(v1, v2))
    p, sub, lanes = tmin.shape
    bt = jnp.full((p * sub * lanes,), _INF, jnp.float32)
    bt = bt.at[: best_t.shape[0]].set(best_t).reshape(p, sub, lanes)
    fired = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < bt)
    return jnp.any(fired, axis=(1, 2)).astype(jnp.int32)


def trace_closest_hit_chained(chained, rays: Ray, tris=None,
                              packet: int = 2048,
                              precision=jax.lax.Precision.HIGHEST,
                              interpret: bool = False,
                              t_max=None, sweep: bool = True,
                              perm: jnp.ndarray | None = None) -> HitRecord:
    """Closest hit against a ``ChainedScene`` (scenes beyond one SMEM table).

    Parts trace sequentially; after each part the per-ray best t becomes the
    next part's ``t_max``, so the kernel's bounded pruning cuts every later
    part down to the subtrees that could still beat the current hit. Same
    contract as ``trace_closest_hit_tight``; shape ids are remapped to
    global triangle ids.

    Tolerance note: the grazing-edge class (winner may resolve to the
    adjacent triangle, t within ~0.3%) can DOUBLE at part boundaries — the
    adjacent-triangle pair may be split across parts, so each part resolves
    its half independently (observed <=0.8% t deviation on edge-aimed
    rays). Pass ``tris`` for the exact t of whichever winner was kept.
    """
    r = rays.origin.shape[0]
    if r == 0:
        z = jnp.zeros((0,), jnp.float32)
        return HitRecord(z, z, z, jnp.zeros((0,), jnp.int32))
    if t_max is None:
        best_t = jnp.full((r,), _INF, jnp.float32)
    else:
        best_t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1), (r,))
        if perm is not None:
            best_t = best_t[perm]  # whole chain runs in sorted order
    # per-part global-id gathers deferred to ONE end-of-chain gather:
    # the loop tracks a LOCAL winner id with the part's slot offset folded
    # in as a python constant (gather cost tracks op COUNT on this chip —
    # r5; this removes one [r]-gather + one where per part)
    best_loc = jnp.zeros((r,), jnp.int32)  # slot 0 = the -1 sentinel
    # rows 0-5 + lmat built once (perm folded into the pack; per-part t_max
    # rows below are already sorted-order so the base path needs no gather)
    base = _pack_rays_tight(rays, packet, None, perm=perm)
    off = 1
    for part, ids in zip(chained.parts, chained.orig_ids):
        # numpy slice is free; a device-built part's slice stays on device
        root = _dev(part.smem_nodes)[:6, 0]
        gate = _part_root_gate(base[2], root,
                               jnp.where(jnp.isfinite(best_t), best_t, _INF))
        hit = trace_closest_hit_tight(part, rays, packet=packet,
                                      precision=precision, interpret=interpret,
                                      t_max=jnp.where(jnp.isfinite(best_t),
                                                      best_t, _INF),
                                      sweep=sweep, pre_gate=gate, _base=base)
        closer = jnp.isfinite(hit.t) & (hit.t < best_t)
        best_t = jnp.where(closer, hit.t, best_t)
        # closer => a real hit => shape_id >= 0, so off + shape_id indexes
        # this part's segment of the concatenated id table
        best_loc = jnp.where(closer, hit.shape_id + off, best_loc)
        off += int(np.shape(ids)[0])
    ids_all = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32)]
        + [_dev(i).astype(jnp.int32) for i in chained.orig_ids])
    best_id = ids_all[best_loc]
    if t_max is not None:
        tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1), (r,))
        if perm is not None:
            tm = tm[perm]
        best_t = jnp.where(best_t < tm, best_t, _INF)
        best_id = jnp.where(jnp.isfinite(best_t), best_id, -1)
    t = best_t
    hitm = jnp.isfinite(t)
    if tris is not None:
        from ..ray import ray_intersects_triangle

        ta, tb_, tc = tris
        safe = jnp.maximum(best_id, 0)
        rays_p = rays if perm is None else jax.tree_util.tree_map(
            lambda x: x[perm], rays)
        g9 = jnp.concatenate([ta, tb_, tc], axis=1)[safe]  # one gather
        inter = ray_intersects_triangle(rays_p, g9[:, 0:3], g9[:, 3:6],
                                        g9[:, 6:9])
        u = jnp.where(hitm, inter.u, 0.0)
        v = jnp.where(hitm, inter.v, 0.0)
        t = jnp.where(hitm, jnp.where(jnp.isfinite(inter.distance), inter.distance, t), t)
    else:
        u = jnp.zeros_like(t)
        v = jnp.zeros_like(t)
    return HitRecord(t, u, v, best_id)


def trace_any_hit_chained(chained, rays: Ray, t_max=None, packet: int = 2048,
                          precision=jax.lax.Precision.HIGHEST,
                          interpret: bool = False,
                          sweep: bool = True,
                          perm: jnp.ndarray | None = None) -> jnp.ndarray:
    """Occlusion query over a ``ChainedScene``: parts short-circuit via a
    shrinking t_max (an occluded ray's bound drops to 0 => later parts prune
    it from the root)."""
    r = rays.origin.shape[0]
    if r == 0:
        return jnp.zeros((0,), bool)
    occ = jnp.zeros((r,), bool)
    if t_max is None:
        tm0 = jnp.full((r,), _INF, jnp.float32)
    else:
        tm0 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32).reshape(-1), (r,))
        if perm is not None:
            tm0 = tm0[perm]  # whole chain runs in sorted order
    base = _pack_rays_tight(rays, packet, None, perm=perm)
    for part in chained.parts:
        tm = jnp.where(occ, 0.0, tm0)
        root = _dev(part.smem_nodes)[:6, 0]
        gate = _part_root_gate(base[2], root, tm)
        got = trace_any_hit_tight(part, rays, t_max=tm, packet=packet,
                                  precision=precision, interpret=interpret,
                                  sweep=sweep, pre_gate=gate, _base=base)
        occ = occ | got
    return occ


def make_seeder(scene, packet: int = 2048, sample_stride: int = 32,
                k_hints: int = 64, precision=jax.lax.Precision.HIGHEST,
                interpret: bool = False):
    """Device-side seeding-hints factory: ``seeder(rays) -> hints``.

    ``compute_seed_hints`` maps sampled hits to leaf nodes on the HOST — a
    result pull plus numpy per batch (the tunnel fence alone is ~27 ms).
    This factory precomputes the (static per scene) triangle->lane and
    cluster->leaf-node tables once and returns a fully jittable function, so
    the seeded trace composes into one device program:

        seeder = make_seeder(scene)
        hints = seeder(rays)                        # stays on device
        trace_closest_hit_tight(scene, rays, hints=hints)
    """
    lane_of_tri, node_of_cluster, n_tris, W = _hint_tables(scene)
    lane_j = jnp.asarray(lane_of_tri.astype(np.int32))
    node_j = jnp.asarray(node_of_cluster.astype(np.int32))
    BIG = jnp.int32(0x7FFFFFF0)

    def seeder(rays: Ray):
        r = rays.origin.shape[0]
        if r < sample_stride:
            return None
        assert packet % sample_stride == 0, (packet, sample_stride)
        sample = Ray(
            rays.origin[::sample_stride],
            rays.direction[::sample_stride],
            rays.inv_direction[::sample_stride],
        )
        pre = trace_closest_hit_tight(scene, sample, packet=min(packet, 1024),
                                      precision=precision, interpret=interpret)
        rpp = packet // sample_stride
        ns = pre.shape_id.shape[0]
        p = -(-r // packet)
        pad = p * rpp - ns
        sid = jnp.concatenate(
            [pre.shape_id, jnp.full((pad,), -1, jnp.int32)]) if pad else pre.shape_id
        cl = jnp.where(sid >= 0,
                       lane_j[jnp.clip(sid, 0, n_tris - 1)] // W, BIG)
        cl = jnp.sort(cl.reshape(p, rpp), axis=1)
        first = jnp.concatenate(
            [jnp.ones((p, 1), bool), cl[:, 1:] != cl[:, :-1]], axis=1)
        first = first & (cl < BIG)
        rank = jnp.cumsum(first, axis=1) - 1
        slot = jnp.where(first & (rank < k_hints), rank, k_hints)
        hints = jnp.full((p, k_hints + 1), -1, jnp.int32)
        node = node_j[jnp.clip(cl, 0, node_j.shape[0] - 1)]
        hints = hints.at[jnp.arange(p)[:, None], slot].set(
            jnp.where(slot < k_hints, node, -1).astype(jnp.int32))
        hints = hints[:, :k_hints]
        fill = hints[:, 0:1]
        return jnp.where(hints < 0, fill, hints)

    return seeder


def make_planner(scene, packet: int = 2048, sample_stride: int = 32,
                 k_hints: int = 64, precision=jax.lax.Precision.HIGHEST,
                 interpret: bool = False):
    """Per-packet traversal planner: ``plan(rays) -> (hints, start_g)``.

    Builds on ``make_seeder``: the sampled hits give seeding hints AND
    per-packet subtree-entry groups (``start_g`` is [p, 2]) — slot 0 is
    the LCA (in the wide group tree) of every group the samples landed
    in. The kernel walks that subtree FIRST (phase 1 finds the true
    closest hit for almost every lane), then the exactness pass from the
    root is gated down to the ancestor chain by the warm pruning bounds
    (``_wide_body`` SUBTREE mode). When the samples span root children
    (LCA == root — the tail where a single entry cannot engage), the
    packet instead enters the TWO dominant depth-1 subtrees (partition by
    depth-1 ancestor, per-subset LCAs in both slots). A packet whose
    samples all missed gets (-1, -1) (plain single-phase walk). Results
    are identical to the unplanned trace for ANY start_g — even nested or
    equal pairs — because phase 2 re-checks everything outside the
    phase-1 subtrees; the planner is a pure performance hint.

    TPU re-design of the reference's pruned descent
    (/root/reference/src/bvh/bvh_node.rs:327-374): instead of per-ray
    descent decisions, one subtree prediction per 2048-ray packet.

        plan = make_planner(scene)
        hints, start_g = plan(rays)
        trace_closest_hit_tight(scene, rays, hints=hints, start_g=start_g)
    """
    from .cluster import wide_group_meta

    assert _traces_wide(scene), \
        "subtree entry requires a scene whose default path is the wide " \
        "group walk (gnodes present, bmat/packed off)"
    K = (np.asarray(scene.gnodes).shape[0] - 1) // 7
    KSHIFT = K.bit_length() - 1
    parent, gdepth, anc = wide_group_meta(scene.gnodes)
    # two-entry plans only pay when (a) the root has interior children
    # left to skip-gate AFTER the two entered ones (with <= 2, phase 1
    # covers the whole interior and the second walk is pure duplicate
    # work), and (b) depth-1 subtrees have interior structure of their own
    # (on a depth-1 tree each entry is a single group test — phase 1 just
    # prepays what phase 2 would have paid)
    n_root_int = int((np.asarray(parent) == 0).sum())
    deep_enough = int(np.asarray(gdepth).max()) >= 2
    anc_j = jnp.asarray(anc, jnp.int32)  # [Gn, D]
    seeder = make_seeder(scene, packet=packet, sample_stride=sample_stride,
                         k_hints=k_hints, precision=precision,
                         interpret=interpret)

    def plan(rays: Ray):
        hints = seeder(rays)
        if hints is None:
            return None, None
        p = hints.shape[0]
        ar = jnp.arange(p)
        has = hints[:, 0] >= 0  # packets whose samples all missed get -1
        g = jax.lax.shift_right_logical(jnp.maximum(hints, 0), KSHIFT)
        A = anc_j[g]  # [p, k_hints, D]
        ref = A[:, 0:1, :]
        # chains agree on a prefix of depths; the LCA depth is the length
        # of that prefix - 1 (cumulative AND enforces prefix semantics)
        same = jnp.all((A == ref) & (ref >= 0), axis=1)  # [p, D]
        same = jnp.cumprod(same.astype(jnp.int32), axis=1)
        lca_d = jnp.sum(same, axis=1) - 1  # [p] (>= 0 when has)
        safe_d = jnp.clip(lca_d, 0, anc_j.shape[1] - 1)
        start = A[ar, 0, safe_d]
        e1 = jnp.where(has & (lca_d > 0), start, -1)
        e2 = jnp.full((p,), -1, jnp.int32)
        if anc_j.shape[1] > 1 and n_root_int > 2 and deep_enough:
            # Root-LCA tail (the measured ~28% of morton-sorted aimed
            # packets): samples span root children, so no single subtree
            # covers them. Partition by depth-1 ancestor and enter the two
            # dominant subtrees; the kernel's phase 2 skips both.
            def subset_lca(ref_chain, member):
                # deepest chain-prefix shared by every member sample
                s = jnp.all(((A == ref_chain) & (ref_chain >= 0))
                            | ~member[:, :, None], axis=1)
                s = jnp.cumprod(s.astype(jnp.int32), axis=1)
                d = jnp.sum(s, axis=1) - 1
                dsafe = jnp.clip(d, 0, anc_j.shape[1] - 1)
                return d, ref_chain[:, 0, :][ar, dsafe]

            # ancestor at the split depth lca_d+1 per sample (-1: the
            # sample's chain ends at/above the LCA — its leaves are warmed
            # by the hint seeding either way)
            sdep = jnp.clip(lca_d + 1, 1, anc_j.shape[1] - 1)
            c1 = jnp.take_along_axis(A, sdep[:, None, None],
                                     axis=2)[:, :, 0]
            r1 = c1[:, 0:1]
            in1 = c1 == r1
            other = (~in1) & (c1 >= 0)
            idx2 = jnp.argmax(other, axis=1)
            exists2 = other[ar, idx2]
            refB = jnp.take_along_axis(A, idx2[:, None, None], axis=1)
            in2 = c1 == jnp.take_along_axis(refB[:, 0, :], sdep[:, None],
                                            axis=1)
            d1, g1 = subset_lca(ref, in1)
            d2, g2 = subset_lca(refB, in2)
            # Engage ONLY on root-LCA packets. Measured alternatives (120k
            # aimed morton, 64k rays, iters/pkt): split at lca_d+1 for ALL
            # packets 355; nested deep-first+full-LCA pair 168 but +1 iter
            # on camera tiles (7 -> 8); this root-only form 168 with no
            # camera overhead — deeper entries never beat entering the
            # full LCA when one exists.
            two = has & (lca_d == 0) & (r1[:, 0] >= 0) & (d1 > 0)
            e1 = jnp.where(two, g1, e1)
            e2 = jnp.where(two & exists2 & (d2 > 0), g2, e2)
        start_g = jnp.stack([e1, e2], axis=1).astype(jnp.int32)
        return hints, start_g

    return plan


def make_key_planner(scene, packet: int = 8192, grid_bits: int = 5):
    """FREE per-packet subtree entry: ``plan(sorted_origins) -> start_g``.

    ``make_planner`` predicts entries from a sampling pre-pass trace whose
    cost INVERTS its benefit on the wide walk (round-3 hardware A/B: plain
    2.64 M > hints 1.64 M > planner 1.53 M rays/s on the aimed workload).
    This planner derives the same [p, 2] entry groups from the geometry the
    presort already computed — packet origin BOUNDS — at the cost of one
    segment-min/max over the sorted origins plus four table gathers: no
    trace, no narrowphase, no host round trip.

    Host precompute (once per scene): a ``2^grid_bits``-per-axis cell table
    over the root box mapping each cell to the DEEPEST wide group whose
    subtree box contains it (parent-first claim; overlap cells keep the
    first claimant — a prediction tie, not a correctness issue). Per
    packet: the origin bbox corners' cells look up two groups whose wide-
    tree LCA (ancestor-table prefix compare, as in ``make_planner``)
    becomes the phase-1 entry; packets whose corners span root children
    enter the two corners' depth-1 subtrees instead. Exactness is the
    kernel's two-phase contract: ANY start_g yields identical results
    (phase 2 re-walks everything outside the entered subtrees).

    Prediction model: entries warm the pruning bounds only when the
    packet's HITS lie in the entered subtree, so this pays on workloads
    whose origins sit near their targets (aimed/secondary bundles,
    morton-sorted). Camera-at-infinity packets fall back to the plain walk
    (origin cells map to the root => start -1).

    Reference analog: pruned ordered descent,
    /root/reference/src/bvh/bvh_node.rs:327-374 — packet-ized, with the
    descent decision precomputed as a spatial table.
    """
    from .cluster import wide_group_meta

    assert _traces_wide(scene), \
        "subtree entry requires a scene whose default path is the wide " \
        "group walk (gnodes present, bmat/packed off)"
    gn = np.asarray(scene.gnodes)
    K = (gn.shape[0] - 1) // 7
    parent, gdepth, anc = wide_group_meta(scene.gnodes)
    parent = np.asarray(parent)
    Gn = gn.shape[1]
    D = anc.shape[1]
    n_root_int = int((parent == 0).sum())
    deep_enough = int(np.asarray(gdepth).max()) >= 2

    # per-group subtree box: union over populated child slots
    bmin = np.full((Gn, 3), np.inf, np.float32)
    bmax = np.full((Gn, 3), -np.inf, np.float32)
    for k in range(K):
        box = gn[7 * k:7 * k + 6]  # [6, Gn]
        valid = np.isfinite(box[0])
        bmin[valid] = np.minimum(bmin[valid], box[0:3, valid].T)
        bmax[valid] = np.maximum(bmax[valid], box[3:6, valid].T)

    cells = 1 << grid_bits
    lo = bmin[0].copy()
    span = np.maximum(bmax[0] - lo, 1e-30)
    step = span / cells
    cell_group = np.zeros((cells, cells, cells), np.int32)  # root everywhere
    order = np.nonzero(parent >= 0)[0]  # ids ascend => parents first
    for g in order:
        # cell range FULLY covered by g's box (partial cells stay parent's)
        i0 = np.ceil((bmin[g] - lo) / step - 1e-6).astype(np.int64)
        i1 = np.floor((bmax[g] - lo) / step + 1e-6).astype(np.int64)
        i0 = np.clip(i0, 0, cells)
        i1 = np.clip(i1, 0, cells)
        if (i1 <= i0).any():
            continue
        sub = cell_group[i0[0]:i1[0], i0[1]:i1[1], i0[2]:i1[2]]
        sub[sub == parent[g]] = g
    cell_j = jnp.asarray(cell_group.reshape(-1))
    anc_j = jnp.asarray(np.asarray(anc), jnp.int32)
    lo_j = jnp.asarray(lo)
    inv_step_j = jnp.asarray((1.0 / step).astype(np.float32))

    def _cell_of(pt):
        q = jnp.clip(((pt - lo_j) * inv_step_j).astype(jnp.int32),
                     0, cells - 1)
        return cell_j[(q[:, 0] * cells + q[:, 1]) * cells + q[:, 2]]

    def plan(origins):
        """[r, 3] SORTED origins -> [p, 2] i32 start groups (jittable)."""
        r = origins.shape[0]
        pad = (-r) % packet
        if pad:
            origins = jnp.concatenate(
                [origins, jnp.broadcast_to(origins[-1:], (pad, 3))])
        p = origins.shape[0] // packet
        ob = origins.reshape(p, packet, 3)
        blo, bhi = ob.min(axis=1), ob.max(axis=1)
        g1, g2 = _cell_of(blo), _cell_of(bhi)
        A1, A2 = anc_j[g1], anc_j[g2]  # [p, D]
        same = jnp.cumprod(((A1 == A2) & (A1 >= 0)).astype(jnp.int32),
                           axis=1)
        lca_d = jnp.sum(same, axis=1) - 1
        ar = jnp.arange(p)
        start = A1[ar, jnp.clip(lca_d, 0, D - 1)]
        e1 = jnp.where(lca_d > 0, start, -1)
        e2 = jnp.full((p,), -1, jnp.int32)
        if D > 1 and n_root_int > 2 and deep_enough:
            # corners under different root children: enter both depth-1
            # subtrees (the planner's root-LCA tail treatment)
            d1a, d1b = A1[:, 1], A2[:, 1]
            two = (lca_d == 0) & (d1a >= 0)
            e1 = jnp.where(two, d1a, e1)
            e2 = jnp.where(two & (d1b >= 0) & (d1b != d1a), d1b, e2)
        return jnp.stack([e1, e2], axis=1).astype(jnp.int32)

    return plan
