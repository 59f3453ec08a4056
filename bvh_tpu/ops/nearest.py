"""Kernel-speed nearest-triangle queries against a ``TightScene``.

The TPU re-design of the reference's CPU nearest-neighbor fast paths —
``nearest_to`` on the flat BVH (``/root/reference/src/flat_bvh.rs:513-562``)
and the pruned descent of ``nearest_child`` / ``nearest_to`` on the pointer
tree (``/root/reference/src/bvh/bvh_node.rs:327-374``, ``bvh_impl.rs:221-238``)
— using the same SMEM/VPU/MXU machinery as the ray trace kernels
(``ops/trace.py``): a packet of 128-lane point tiles walks the DFS
entry/exit upper table with per-lane squared-distance pruning, and leaf
visits run an MXU point-triangle narrowphase over the cluster's W packed
triangles.

Design notes (why this differs from the per-point reference loop):

* Pruning bound seeding. The reference seeds its bound with the first leaf
  the descent reaches; a packet kernel wants a bound *before* narrowphase.
  Every VISITED node's box bounds >=1 real triangle, so the squared
  distance to its FARTHEST face corner is a valid upper bound on the
  nearest-triangle distance; each visit refines ``vb = min(vb, d2max(box))``
  for ~6 extra VPU ops, so the pruning radius tightens monotonically as
  the walk descends — no separate seeding pass needed.

* MXU narrowphase. Closest-point-on-triangle (Ericson 5.1.5, the same
  algorithm as the reference's testbase ``Triangle`` PointDistance impl,
  ``/root/reference/src/testbase.rs:314-443``) needs, per (triangle, point)
  pair, only the two edge projections ``d1 = e1.ap``, ``d2 = e2.ap`` plus
  per-triangle constants (|e1|^2, e1.e2, |e2|^2, a'.a', ...). All of those
  are bilinear in (triangle row, point column), so ONE [8, 6W] x [8, P]
  ``dot_general`` per leaf yields every input of the region logic with
  points riding the 128-lane axis at full density; per-triangle constants
  are broadcast through the matmul via the point matrix's ones-row. The
  region select cascade then runs on [W, P] tiles.

Exactness: the region candidates divide by |e1|^2, |e2|^2 and the face
normal's squared length; zero-area (degenerate) triangles produce NaN
distances whose bit patterns exceed the +inf sentinel, so they can never
win — consistent with the reference testbase, which assumes non-degenerate
triangles. The packed min-reduce steals log2(W) mantissa bits of the f32
squared distance for the winning lane (same tolerance class as the trace
kernels: up to W-1 ulps of d^2).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import _dev

_INF = np.float32(np.inf)
_SENT_I = 0x7F800000  # +inf bits: sentinel above every finite d2 key


def _point_narrow(c, ccx, ccy, ccz, groups_ref, pmat_ref, bestk_ref,
                  bestc_ref, vb_ref, W, PACKET, PRECISION):
    """MXU point-triangle narrowphase of cluster ``c`` (frame origin
    ``cc*``): Ericson region cascade over the cluster's W packed
    triangles, packed-key min into bestk/bestc, pruning-bound update.
    Shared by the entry/exit and group-walk nearest kernels."""
    SUB = PACKET // 128
    GSHIFT = (128 // W).bit_length() - 1
    GMASK = (128 // W) - 1
    _SENT = jnp.int32(_SENT_I)
    g = jax.lax.shift_right_logical(c, GSHIFT)
    sub = jax.lax.bitwise_and(c, GMASK)
    tile = groups_ref[pl.ds(g, 1)][0]  # [16, 128]
    shift = jax.lax.bitwise_and(128 - sub * W, 127)
    tr = pltpu.roll(tile, shift, axis=1)  # cluster tris at lanes 0..W-1

    a0, a1, a2 = tr[0:1, 0:W], tr[1:2, 0:W], tr[2:3, 0:W]
    e10, e11, e12 = tr[3:4, 0:W], tr[4:5, 0:W], tr[5:6, 0:W]
    e20, e21, e22 = tr[6:7, 0:W], tr[7:8, 0:W], tr[8:9, 0:W]

    # per-triangle scalars, [1, W] rows
    s_e1a = e10 * a0 + e11 * a1 + e12 * a2
    s_e2a = e20 * a0 + e21 * a1 + e22 * a2
    s_aa = a0 * a0 + a1 * a1 + a2 * a2
    q_aa = e10 * e10 + e11 * e11 + e12 * e12
    q_bc = e10 * e20 + e11 * e21 + e12 * e22
    q_cc = e20 * e20 + e21 * e21 + e22 * e22

    z1 = jnp.zeros((1, W), jnp.float32)
    one1 = jnp.ones((1, W), jnp.float32)

    def rows(*rs):
        out = list(rs)
        while len(out) < 8:
            out.append(z1)
        return jnp.concatenate(out, axis=0)

    # 14 blocks of W columns each; contraction over 8 sublane rows of
    # the point matrix (x', y', z', 1, 0...). Blocks 6-13 materialize the
    # per-pair displacement q = p' - a' and the edge broadcasts so the
    # FINAL distance is evaluated componentwise on small magnitudes —
    # |v e1 + w e2 - q|^2 — instead of the catastrophically cancelling
    # |p'|^2 + (a'a' - 2a'p') form (two ~span^2 terms whose difference is
    # the answer: at wide-leaf sparse clusters the span reaches 1e4, the
    # terms 1e8, and f32 lost ~10 units^2 of absolute accuracy, enough to
    # report d=0 for a point 20 units away).
    bmat = jnp.concatenate(
        [
            rows(e10, e11, e12, -s_e1a),   # d1 = e1 . (p' - a')
            rows(e20, e21, e22, -s_e2a),   # d2 = e2 . (p' - a')
            rows(z1, z1, z1, q_aa),        # |e1|^2 broadcast
            rows(z1, z1, z1, q_bc),        # e1.e2 broadcast
            rows(z1, z1, z1, q_cc),        # |e2|^2 broadcast
            rows(one1, z1, z1, -a0),       # qx = p'x - a'x
            rows(z1, one1, z1, -a1),       # qy
            rows(z1, z1, one1, -a2),       # qz
            rows(z1, z1, z1, e10),         # e1 broadcasts
            rows(z1, z1, z1, e11),
            rows(z1, z1, z1, e12),
            rows(z1, z1, z1, e20),         # e2 broadcasts
            rows(z1, z1, z1, e21),
            rows(z1, z1, z1, e22),
        ],
        axis=1,
    )  # [8, 14W]

    pm = pmat_ref[0]  # [8, PACKET]
    lp = jnp.concatenate(
        [pm[0:1] - ccx, pm[1:2] - ccy, pm[2:3] - ccz, pm[3:8]], axis=0
    )  # [8, PACKET]; rows 3 = ones, 4-7 = zeros

    m = jax.lax.dot_general(
        bmat, lp, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=PRECISION,
    )  # [14W, PACKET]

    d1 = m[0:W]
    d2 = m[W:2 * W]
    aa = m[2 * W:3 * W]
    bc = m[3 * W:4 * W]
    cc = m[4 * W:5 * W]
    qx = m[5 * W:6 * W]
    qy = m[6 * W:7 * W]
    qz = m[7 * W:8 * W]
    e1xb = m[8 * W:9 * W]
    e1yb = m[9 * W:10 * W]
    e1zb = m[10 * W:11 * W]
    e2xb = m[11 * W:12 * W]
    e2yb = m[12 * W:13 * W]
    e2zb = m[13 * W:14 * W]

    # Ericson 5.1.5 region cascade. Wheres applied in REVERSE priority
    # (A > B > AB > C > AC > BC > face), so the earliest region wins.
    d3 = d1 - aa
    d4 = d2 - bc
    d5 = d1 - bc
    d6 = d2 - cc
    va = d3 * d6 - d5 * d4
    vb2 = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    t_bc = (d4 - d3) / ((d4 - d3) + (d5 - d6))
    denom = va + vb2 + vc
    v = vb2 / denom
    w = vc / denom
    r_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)
    v = jnp.where(r_bc, 1.0 - t_bc, v)
    w = jnp.where(r_bc, t_bc, w)
    r_ac = (vb2 <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    v = jnp.where(r_ac, 0.0, v)
    w = jnp.where(r_ac, d2 / (d2 - d6), w)
    r_c = (d6 >= 0.0) & (d5 <= d6)
    v = jnp.where(r_c, 0.0, v)
    w = jnp.where(r_c, 1.0, w)
    r_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    v = jnp.where(r_ab, d1 / (d1 - d3), v)
    w = jnp.where(r_ab, 0.0, w)
    r_b = (d3 >= 0.0) & (d4 <= d3)
    v = jnp.where(r_b, 1.0, v)
    w = jnp.where(r_b, 0.0, w)
    r_a = (d1 <= 0.0) & (d2 <= 0.0)
    v = jnp.where(r_a, 0.0, v)
    w = jnp.where(r_a, 0.0, w)

    # componentwise displacement to the closest point (small magnitudes,
    # no span^2 cancellation): f = v e1 + w e2 - q
    fx = v * e1xb + w * e2xb - qx
    fy = v * e1yb + w * e2yb - qy
    fz = v * e1zb + w * e2zb - qz
    d2out = fx * fx + fy * fy + fz * fz
    # pad / degenerate slots (aa == 0) can never win; NaNs from their
    # divisions have bit patterns above the +inf sentinel already, but
    # mask explicitly so a padded slot (q finite) cannot steal the min
    d2out = jnp.where(aa > 0.0, d2out, _INF)

    LMASK = jnp.int32(W - 1)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (W, PACKET), 0)
    key = pltpu.bitcast(d2out, jnp.int32)
    key = jnp.where(d2out < _INF, (key & ~LMASK) | lanes_i, _SENT)
    if PACKET >= 1024 or PACKET == 128:
        km = jnp.min(key, axis=0).reshape(SUB, 128)
    else:
        km = jnp.concatenate(
            [jnp.min(key[:, i * 128:(i + 1) * 128], axis=0,
                     keepdims=True) for i in range(SUB)],
            axis=0,
        )

    bk = bestk_ref[:, :]
    closer = km < bk
    nbk = jnp.where(closer, km, bk)
    bestk_ref[:, :] = nbk
    bestc_ref[:, :] = jnp.where(closer, c, bestc_ref[:, :])
    nt = pltpu.bitcast(nbk & ~LMASK, jnp.float32)
    vb_ref[:, :] = jnp.minimum(nt, vb_ref[:, :])


def _nearest_body(nodes_ref, groups_ref, pslab_ref, pmat_ref, out_ref,
                  bestk_ref, bestc_ref, vb_ref, cnt_ref, PACKET, PRECISION,
                  W=16, COUNT_VISITS=False, REFINE=True):
    assert W in (16, 32, 64, 128)
    nn = nodes_ref.shape[1]
    SUB = PACKET // 128
    GSHIFT = (128 // W).bit_length() - 1
    GMASK = (128 // W) - 1
    _SENT = jnp.int32(_SENT_I)

    bestk_ref[:, :] = jnp.full((SUB, 128), _SENT, jnp.int32)
    bestc_ref[:, :] = jnp.zeros((SUB, 128), jnp.int32)
    # per-lane pruning bound = squared distance; row 3 carries d_max^2
    vb_ref[:, :] = pslab_ref[0, 3]
    if COUNT_VISITS:
        cnt_ref[0] = 0
        cnt_ref[1] = 0

    def narrowphase(node):
        c = (-nodes_ref[6, node] - 1.0).astype(jnp.int32)
        if COUNT_VISITS:
            cnt_ref[1] = cnt_ref[1] + 1
        # triangles are stored cluster-relative to the box center
        ccx = (nodes_ref[0, node] + nodes_ref[3, node]) * 0.5
        ccy = (nodes_ref[1, node] + nodes_ref[4, node]) * 0.5
        ccz = (nodes_ref[2, node] + nodes_ref[5, node]) * 0.5
        _point_narrow(c, ccx, ccy, ccz, groups_ref, pmat_ref, bestk_ref,
                      bestc_ref, vb_ref, W, PACKET, PRECISION)


    def visit(cursor):
        ax, ay, az = nodes_ref[0, cursor], nodes_ref[1, cursor], nodes_ref[2, cursor]
        bx, by, bz = nodes_ref[3, cursor], nodes_ref[4, cursor], nodes_ref[5, cursor]
        entry = nodes_ref[6, cursor]
        exit_ = nodes_ref[7, cursor]
        px, py, pz = pslab_ref[0, 0], pslab_ref[0, 1], pslab_ref[0, 2]
        # min squared distance to the box (0 inside)
        tx = jnp.maximum(jnp.maximum(ax - px, px - bx), 0.0)
        ty = jnp.maximum(jnp.maximum(ay - py, py - by), 0.0)
        tz = jnp.maximum(jnp.maximum(az - pz, pz - bz), 0.0)
        d2min = tx * tx + ty * ty + tz * tz
        # max squared distance to the box's farthest face corner: a valid
        # upper bound on the nearest triangle inside (monotone refinement)
        if REFINE:
            mx = jnp.maximum(px - ax, bx - px)
            my = jnp.maximum(py - ay, by - py)
            mz = jnp.maximum(pz - az, bz - pz)
            d2max = mx * mx + my * my + mz * mz
            vb = jnp.minimum(vb_ref[:, :], d2max)
            vb_ref[:, :] = vb
        else:
            # masked scenes: a box no longer proves a live triangle inside,
            # so its farthest corner is NOT an upper bound on the nearest
            # distance — prune only against found results and d_max
            vb = vb_ref[:, :]
        fired = jnp.any(d2min < vb)
        is_leaf = entry < 0.0
        if COUNT_VISITS:
            cnt_ref[0] = cnt_ref[0] + 1
        return fired, is_leaf, entry, exit_

    def body(cursor):
        fired, is_leaf, entry, exit_ = visit(cursor)

        @pl.when(is_leaf & fired)
        def _():
            narrowphase(cursor)

        nxt = jax.lax.select(is_leaf | jnp.logical_not(fired), exit_, entry)
        return nxt.astype(jnp.int32)

    jax.lax.while_loop(lambda cur: cur < nn, body, 0)

    bk = bestk_ref[:, :]
    LMASK = jnp.int32(W - 1)
    out_ref[0, 0:SUB] = pltpu.bitcast(bk & ~LMASK, jnp.float32)
    hit = bk < jnp.int32(_SENT_I)
    gid = bestc_ref[:, :] * W + jax.lax.bitwise_and(bk, LMASK)
    out_ref[0, SUB:2 * SUB] = jnp.where(hit, gid, -1).astype(jnp.float32)
    if COUNT_VISITS:
        out_ref[0, 0:1] = jnp.full((1, 128), cnt_ref[0].astype(jnp.float32))
        out_ref[0, 1:2] = jnp.full((1, 128), cnt_ref[1].astype(jnp.float32))


def _make_nearest_kernel(packet, precision, width, count_visits, refine):
    def _kernel(nodes_ref, groups_ref, pslab_ref, pmat_ref, out_ref,
                bestk_ref, bestc_ref, vb_ref, cnt_ref):
        return _nearest_body(nodes_ref, groups_ref, pslab_ref, pmat_ref,
                             out_ref, bestk_ref, bestc_ref, vb_ref, cnt_ref,
                             packet, precision, W=width,
                             COUNT_VISITS=count_visits, REFINE=refine)
    return _kernel


@partial(jax.jit, static_argnames=("num_nodes", "interpret", "packet",
                                   "precision", "width", "count_visits",
                                   "refine"))
def _nearest_tight(smem_nodes, groups, pslab, pmat, num_nodes,
                   interpret=False, packet=2048,
                   precision=jax.lax.Precision.HIGHEST, width=16,
                   count_visits=False, refine=True):
    p = pslab.shape[0]
    sub = packet // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        scratch_shapes=[
            pltpu.VMEM((sub, 128), jnp.int32),
            pltpu.VMEM((sub, 128), jnp.int32),
            pltpu.VMEM((sub, 128), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(groups.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + pslab.shape[1:], lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + pmat.shape[1:], lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * sub, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_nearest_kernel(packet, precision, width, count_visits,
                             refine),
        out_shape=jax.ShapeDtypeStruct((p, 2 * sub, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(smem_nodes, groups, pslab, pmat)


def _nearest_wide_body(gnodes_ref, groups_ref, pslab_ref, pmat_ref, out_ref,
                       bestk_ref, bestc_ref, vb_ref, cnt_ref, stk_ref, m2_ref,
                       PACKET, PRECISION, K=16, W=16, COUNT_VISITS=False,
                       REFINE=True):
    """Group-walk nearest: the wide-tree analog of ``_nearest_body``.

    Same mask-stack walk as the trace kernel's ``_wide_body``
    (ops/trace.py): one iteration distance-tests all K children of a
    group against the per-lane squared-distance bound (one reduce
    consumer), narrowphases the fired leaf bits, and pops interior bits
    in DFS order. The bound refines with min over nonempty children's
    farthest-corner d2max exactly like the entry/exit kernel's visits, so
    the pruning behavior class is unchanged and results are bit-identical
    (child order = DFS order)."""
    assert W in (16, 32, 64, 128)
    assert K == 16
    SUB = PACKET // 128
    _SENT = jnp.int32(_SENT_I)

    bestk_ref[:, :] = jnp.full((SUB, 128), _SENT, jnp.int32)
    bestc_ref[:, :] = jnp.zeros((SUB, 128), jnp.int32)
    vb_ref[:, :] = pslab_ref[0, 3]  # d_max^2 (inf when unbounded)
    m2_ref[0] = 0
    if COUNT_VISITS:
        cnt_ref[0] = 0  # loop iterations
        cnt_ref[1] = 0  # narrowphase fires

    def child_box(k, g):
        base = 7 * k
        return (gnodes_ref[base, g], gnodes_ref[base + 1, g],
                gnodes_ref[base + 2, g], gnodes_ref[base + 3, g],
                gnodes_ref[base + 4, g], gnodes_ref[base + 5, g])

    def narrow_slot(k, g):
        pay = gnodes_ref[7 * k + 6, g]
        c = (-pay - 1.0).astype(jnp.int32)
        ax, ay, az, bx, by, bz = child_box(k, g)
        if COUNT_VISITS:
            cnt_ref[1] = cnt_ref[1] + 1
        _point_narrow(c, (ax + bx) * 0.5, (ay + by) * 0.5, (az + bz) * 0.5,
                      groups_ref, pmat_ref, bestk_ref, bestc_ref, vb_ref,
                      W, PACKET, PRECISION)

    # the 3 point rows are read-only for the whole walk: keep them live in
    # vector registers instead of re-loading per group test (the per-test
    # VMEM load latency dominated the wide trace chain; same fix here)
    px_h, py_h, pz_h = pslab_ref[0, 0], pslab_ref[0, 1], pslab_ref[0, 2]

    def group_test(g, en=None):
        """Distance-test all K children; refine the bound; K-bit mask.

        ``en`` (scalar bool) masks the call: the walk runs it
        unconditionally (no pl.when region, see trace._make_mask_walk), so
        a disabled call must not refine the bound and must return 0.

        Empty slots hold NaN boxes: their d2min comparisons are false (bit
        never sets) and their NaN d2max is excluded from the bound
        refinement (min over a NaN would poison every lane's bound)."""
        px, py, pz = px_h, py_h, pz_h
        vbv = vb_ref[:, :]
        refine = vbv
        macc = jnp.zeros((SUB, 128), jnp.int32)
        for k in range(K):
            ax, ay, az, bx, by, bz = child_box(k, g)
            tx = jnp.maximum(jnp.maximum(ax - px, px - bx), 0.0)
            ty = jnp.maximum(jnp.maximum(ay - py, py - by), 0.0)
            tz = jnp.maximum(jnp.maximum(az - pz, pz - bz), 0.0)
            d2min = tx * tx + ty * ty + tz * tz
            if REFINE:
                mx = jnp.maximum(px - ax, bx - px)
                my = jnp.maximum(py - ay, by - py)
                mz = jnp.maximum(pz - az, bz - pz)
                d2max = mx * mx + my * my + mz * mz
                refine = jnp.minimum(refine,
                                     jnp.where(d2max == d2max, d2max, _INF))
            fired = d2min < vbv
            macc = macc | jnp.where(fired, jnp.int32(1 << k), jnp.int32(0))
        if REFINE:
            if en is not None:
                refine = jnp.where(en, refine, vbv)
            vb_ref[:, :] = refine
        acc = macc
        s = SUB
        assert s & (s - 1) == 0, s
        while s > 1:
            s //= 2
            acc = acc[:s, :] | acc[s:2 * s, :]
        for sh in (64, 32, 16, 8, 4, 2, 1):
            acc = acc | pltpu.roll(acc, sh, axis=1)
        return jnp.max(acc)

    from .trace import _ctz16, _make_mask_walk

    def narrow_mask(lm, g):
        def step(m):
            narrow_slot(_ctz16(m), g)
            return jax.lax.bitwise_and(m, m - 1)

        jax.lax.while_loop(lambda m: m != 0, step, lm)

    def enter(g, en=None):
        m = group_test(g, en)
        if en is not None:
            m = jax.lax.select(en, m, jnp.int32(0))
        lmask = gnodes_ref[7 * K, g].astype(jnp.int32)
        lm = jax.lax.bitwise_and(m, lmask)
        narrow_mask(lm, g)
        return jax.lax.bitwise_and(m, jax.lax.bitwise_not(lmask))

    def _count_iter():
        cnt_ref[0] = cnt_ref[0] + 1

    walk = _make_mask_walk(gnodes_ref, stk_ref, m2_ref, enter,
                           count_iter=_count_iter if COUNT_VISITS else None)
    walk(jnp.int32(0), enter(jnp.int32(0)))

    bk = bestk_ref[:, :]
    LMASK = jnp.int32(W - 1)
    out_ref[0, 0:SUB] = pltpu.bitcast(bk & ~LMASK, jnp.float32)
    hit = bk < jnp.int32(_SENT_I)
    gid = bestc_ref[:, :] * W + jax.lax.bitwise_and(bk, LMASK)
    out_ref[0, SUB:2 * SUB] = jnp.where(hit, gid, -1).astype(jnp.float32)
    if COUNT_VISITS:
        out_ref[0, 0:1] = jnp.full((1, 128), cnt_ref[0].astype(jnp.float32))
        out_ref[0, 1:2] = jnp.full((1, 128), cnt_ref[1].astype(jnp.float32))


def _make_nearest_wide_kernel(packet, precision, width, count_visits,
                              refine):
    def _kernel(gnodes_ref, groups_ref, pslab_ref, pmat_ref, out_ref,
                bestk_ref, bestc_ref, vb_ref, cnt_ref, stk_ref, m2_ref):
        return _nearest_wide_body(gnodes_ref, groups_ref, pslab_ref, pmat_ref,
                                  out_ref, bestk_ref, bestc_ref, vb_ref,
                                  cnt_ref, stk_ref, m2_ref, packet, precision,
                                  W=width, COUNT_VISITS=count_visits,
                                  REFINE=refine)
    return _kernel


@partial(jax.jit, static_argnames=("interpret", "packet", "precision",
                                   "width", "count_visits", "refine"))
def _nearest_wide(gnodes, groups, pslab, pmat, interpret=False, packet=2048,
                  precision=jax.lax.Precision.HIGHEST, width=16,
                  count_visits=False, refine=True):
    from .trace import WIDE_DMAX

    p = pslab.shape[0]
    sub = packet // 128
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        scratch_shapes=[
            pltpu.VMEM((sub, 128), jnp.int32),
            pltpu.VMEM((sub, 128), jnp.int32),
            pltpu.VMEM((sub, 128), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((2 * WIDE_DMAX,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec(groups.shape, lambda i, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + pslab.shape[1:], lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + pmat.shape[1:], lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * sub, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _make_nearest_wide_kernel(packet, precision, width, count_visits,
                                  refine),
        out_shape=jax.ShapeDtypeStruct((p, 2 * sub, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(gnodes, groups, pslab, pmat)


def _pack_points(points, packet, d_max=None):
    """Pads points to a packet multiple (replicating the last point, which
    adds no traversal work) and builds the two kernel layouts: the slab
    [p, 4, sub, 128] (x, y, z, d_max^2) and the lane-major point matrix
    [p, 8, packet] (x, y, z, 1, 0...) for the MXU narrowphase."""
    pts = jnp.asarray(points, jnp.float32)
    r = pts.shape[0]
    pad = (-r) % packet
    if pad:
        pts = jnp.concatenate(
            [pts, jnp.broadcast_to(pts[r - 1], (pad, 3))], axis=0)
    rp = r + pad
    p = rp // packet
    sub = packet // 128
    if d_max is None:
        bound = jnp.full((rp, 1), _INF, jnp.float32)
    else:
        d = jnp.broadcast_to(jnp.asarray(d_max, jnp.float32).reshape(-1),
                             (r,)).reshape(-1, 1)
        bound = d * d
        if pad:
            # pad lanes get a ZERO bound: d2min < 0 never fires, so the
            # padding really adds no traversal work (an inf bound would
            # make the pad lanes traverse unbounded and drag their whole
            # packet through the full tree despite every real lane's
            # radius pruning)
            bound = jnp.concatenate(
                [bound, jnp.zeros((pad, 1), jnp.float32)], axis=0)
    slab = jnp.concatenate([pts, bound], axis=1)
    slab = slab.reshape(p, sub, 128, 4).transpose(0, 3, 1, 2)
    ones = jnp.ones((rp, 1), jnp.float32)
    zeros = jnp.zeros((rp, 4), jnp.float32)
    pmat = (jnp.concatenate([pts, ones, zeros], axis=1)
            .reshape(p, packet, 8).transpose(0, 2, 1))
    return p, rp, slab, pmat


def sort_points_device(points):
    """Morton coherence sort for point batches: ``(perm, inv)`` i32.

    The walk is packet-coherent (one cursor per packet; a group fires if
    ANY lane needs it), so a packet of spatially scattered points visits
    the UNION of its lanes' subtrees — nearly the whole tree for random
    batches (measured 18 s/M points unsorted vs sorted on hardware).
    Morton-sorted packets are spatially tight and prune like single
    points. Per-lane results are exact either way: every fired group
    narrowphases all lanes, so grouping only changes visit supersets.
    """
    pts = jnp.asarray(points, jnp.float32)
    from ..bvh.lbvh import morton_codes
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    key = morton_codes(pts, lo, hi)
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=jnp.int32))
    return perm, inv


def nearest_tight(scene, points, packet: int = 2048, d_max=None,
                  interpret: bool = False,
                  precision=jax.lax.Precision.HIGHEST,
                  wide: bool | None = None, sort: bool = True):
    """Nearest triangle to each point (kernel path).

    Returns ``(shape_id [n] i32, distance [n] f32)``: the global triangle
    id nearest each point and its exact euclidean distance (sqrt of the
    kernel's squared distance). ``shape_id`` is -1 (distance +inf) only
    when ``d_max`` is given and no triangle lies within it, or the scene
    is empty — the contract of the reference's ``nearest_to``
    (``/root/reference/src/flat_bvh.rs:513-562``) with an optional radius.

    ``d_max``: optional scalar or [n] search radius; triangles at
    distance >= d_max are ignored and the radius prunes traversal from
    the start.

    Scenes carrying group-walk tables default to the wide nearest kernel
    (one iteration distance-tests all 16 children — the trace kernels'
    serial-chain amortization); results are bit-identical to the
    entry/exit walk. ``wide=False`` forces the entry/exit kernel.

    ``sort=True`` (default) Morton-sorts the batch on device so packets
    are spatially tight (see ``sort_points_device``); results come back
    in input order and are exact regardless. Pass ``sort=False`` only
    for batches you already sorted.
    """
    pts = jnp.asarray(points, jnp.float32)
    r = pts.shape[0]
    if r == 0 or scene.num_nodes == 0:
        return (jnp.full((r,), -1, jnp.int32),
                jnp.full((r,), _INF, jnp.float32))
    if sort and r > 128:
        perm, inv = sort_points_device(pts)
        dm = d_max
        if dm is not None:
            dm = jnp.asarray(dm, jnp.float32)
            if dm.ndim and dm.shape[0] == r:
                dm = dm[perm]
        sid_s, dist_s = nearest_tight(
            scene, pts[perm], packet=packet, d_max=dm, interpret=interpret,
            precision=precision, wide=wide, sort=False)
        # one fused un-permute (int domain: f32 bits ride int32 lanes
        # inertly; hardware float moves canonicalize NaN payloads — r5)
        comb = jnp.stack(
            [sid_s, jax.lax.bitcast_convert_type(dist_s, jnp.int32)],
            axis=1)[inv]
        return comb[:, 0], jax.lax.bitcast_convert_type(comb[:, 1],
                                                        jnp.float32)
    assert getattr(scene, "packed_nodes", None) is None, \
        "nearest_tight reads f32 node tables (build with packed=False)"
    p, rp, pslab, pmat = _pack_points(pts, packet, d_max)
    gn = getattr(scene, "gnodes", None)
    if wide is None:
        wide = gn is not None
    # masked scenes (make_updater static part): boxes may cover no live
    # triangle, so the farthest-corner bound refinement is unsound there
    # — disable it (weaker pruning, exact results)
    refine = not bool(getattr(scene, "masked", False))
    if wide:
        assert gn is not None, "scene built without wide tables"
        out = _nearest_wide(
            _dev(gn), _dev(scene.groups), pslab, pmat,
            interpret=interpret, packet=packet, precision=precision,
            width=int(getattr(scene, "width", 16)), refine=refine,
        )
    else:
        out = _nearest_tight(
            _dev(scene.smem_nodes), _dev(scene.groups),
            pslab, pmat, num_nodes=scene.num_nodes, interpret=interpret,
            packet=packet, precision=precision,
            width=int(getattr(scene, "width", 16)), refine=refine,
        )
    sub = packet // 128
    d2 = out[:, :sub].reshape(rp)[:r]
    lane_id = out[:, sub:2 * sub].reshape(rp)[:r].astype(jnp.int32)
    hit = jnp.isfinite(d2)
    if d_max is not None:
        # packed keys truncate d2 downward (lane bits stolen), so compare
        # with the exact bound only as a conservative filter
        dm = jnp.broadcast_to(jnp.asarray(d_max, jnp.float32).reshape(-1),
                              (r,))
        hit = hit & (d2 < dm * dm)
    tri_map = _dev(scene.tri_map)
    sid = jnp.where(hit, tri_map[jnp.clip(lane_id, 0, tri_map.shape[0] - 1)],
                    -1)
    dist = jnp.where(hit, jnp.sqrt(jnp.maximum(d2, 0.0)), _INF)
    return sid, dist


def nearest_chained(chained, points, packet: int = 2048, d_max=None,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST,
                    sort: bool = True):
    """Nearest triangle over a ``ChainedScene`` (beyond one SMEM table).

    Parts run sequentially; each point's best distance so far becomes the
    next part's search radius, so the kernel's radius pruning cuts every
    later part down to the subtrees that could still win (the
    nearest-neighbor analog of ``trace_closest_hit_chained``'s carried
    best-t). Shape ids come back remapped to global triangle ids; the
    contract matches ``nearest_tight`` — the reference's ``nearest_to``
    (/root/reference/src/flat_bvh.rs:513-562) at any scene scale.

    Tolerance note: the carried radius is the winner's packed-key
    distance, truncated downward by log2(W) mantissa bits of d^2 — a
    later part's triangle inside that truncation window of the current
    best may be excluded, so ties resolve to the earliest part (same
    class as the single-table key truncation).
    """
    pts = jnp.asarray(points, jnp.float32)
    r = pts.shape[0]
    if r == 0:
        return (jnp.full((r,), -1, jnp.int32),
                jnp.full((r,), _INF, jnp.float32))
    if sort and r > 128:
        # sort ONCE here (not per part) and run parts on sorted points
        perm, inv = sort_points_device(pts)
        dm = d_max
        if dm is not None:
            dm = jnp.asarray(dm, jnp.float32)
            if dm.ndim and dm.shape[0] == r:
                dm = dm[perm]
        bid_s, bd_s = nearest_chained(chained, pts[perm], packet=packet,
                                      d_max=dm, interpret=interpret,
                                      precision=precision, sort=False)
        comb = jnp.stack(
            [bid_s, jax.lax.bitcast_convert_type(bd_s, jnp.int32)],
            axis=1)[inv]  # one fused un-permute (int domain)
        return comb[:, 0], jax.lax.bitcast_convert_type(comb[:, 1],
                                                        jnp.float32)
    if d_max is None:
        best_d = jnp.full((r,), _INF, jnp.float32)
    else:
        best_d = jnp.broadcast_to(
            jnp.asarray(d_max, jnp.float32).reshape(-1), (r,))
    # per-part global-id gathers deferred to ONE end-of-chain gather
    # (gather cost tracks op COUNT — see trace_closest_hit_chained)
    best_loc = jnp.zeros((r,), jnp.int32)  # slot 0 = the -1 sentinel
    off = 1
    for part, ids in zip(chained.parts, chained.orig_ids):
        sid, dist = nearest_tight(part, pts, packet=packet, d_max=best_d,
                                  interpret=interpret, precision=precision,
                                  sort=False)
        closer = (sid >= 0) & (dist < best_d)
        best_d = jnp.where(closer, dist, best_d)
        best_loc = jnp.where(closer, sid + off, best_loc)
        off += int(np.shape(ids)[0])
    ids_all = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32)]
        + [_dev(i).astype(jnp.int32) for i in chained.orig_ids])
    best_id = ids_all[best_loc]
    best_d = jnp.where(best_id >= 0, best_d, _INF)
    return best_id, best_d


def count_visits_nearest(scene, points, packet: int = 2048,
                         interpret: bool = False,
                         wide: bool | None = None):
    """Per-packet (serial visits/iterations, narrowphase fires) for
    ``nearest_tight`` (debug/roofline mode — NOT a timed configuration).
    Counts whichever walk the scene defaults to (wide when gnodes
    present), like the trace counters."""
    pts = jnp.asarray(points, jnp.float32)
    if pts.shape[0] == 0:
        z = np.zeros(0, np.int64)
        return z, z
    p, rp, pslab, pmat = _pack_points(pts, packet, None)
    gn = getattr(scene, "gnodes", None)
    if wide is None:
        wide = gn is not None
    if wide:
        out = _nearest_wide(
            _dev(gn), _dev(scene.groups), pslab, pmat,
            interpret=interpret, packet=packet,
            width=int(getattr(scene, "width", 16)), count_visits=True,
        )
    else:
        out = _nearest_tight(
            _dev(scene.smem_nodes), _dev(scene.groups),
            pslab, pmat, num_nodes=scene.num_nodes, interpret=interpret,
            packet=packet, width=int(getattr(scene, "width", 16)),
            count_visits=True,
        )
    visits = np.asarray(out[:, 0, 0]).astype(np.int64)
    fires = np.asarray(out[:, 1, 0]).astype(np.int64)
    return visits, fires
