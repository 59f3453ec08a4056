"""Long-running differential fuzz on the real TPU (env-gated).

The CPU fuzzer (``test_fuzz.py``) runs every suite; this loop exercises the
*compiled* kernels on actual hardware — randomized leaf widths, packet
sizes, scene scales, trace modes — against the pure-JAX oracle. Run with:

    BVH_TPU_FUZZ=1 python -m pytest tests/test_fuzz_tpu.py -s -q
    BVH_TPU_FUZZ_ROUNDS=50  # optional, default 10

(The suite's conftest forces the CPU platform; this module undoes that when
gated on, so it must run in its own pytest invocation.)
"""

import os

import numpy as np
import pytest

RUN = os.environ.get("BVH_TPU_FUZZ", "0") == "1"

pytestmark = pytest.mark.skipif(not RUN, reason="set BVH_TPU_FUZZ=1 (real-TPU fuzz)")


def test_fuzz_kernels_on_tpu():
    import jax

    jax.config.update("jax_platforms", "")  # restore the default (axon/TPU)
    import jax.numpy as jnp

    from bvh_tpu import Ray
    from bvh_tpu import testbase as tb
    from bvh_tpu.bvh.traverse import brute_force_closest_hit
    from bvh_tpu.ops import (build_tight_scene, build_tight_scene_device,
                             make_refitter, trace_any_hit_tight,
                             trace_closest_hit_tight)

    rounds = int(os.environ.get("BVH_TPU_FUZZ_ROUNDS", "10"))
    rng = np.random.default_rng(int(os.environ.get("BVH_TPU_FUZZ_SEED", "0")))
    for rd in range(rounds):
        n_cubes = int(rng.integers(2, 400))
        leaf = int(rng.choice([None, 16, 32, 64], p=[0.4, 0.3, 0.2, 0.1]) or 0) or None
        packet = int(rng.choice([128, 512, 1024, 2048, 4096]))
        builder = rng.choice(["host", "device"])
        a, b, c = tb.create_n_cubes(n_cubes, seed=rd)
        if builder == "host":
            scene = build_tight_scene(a, b, c, leaf_size=leaf)
        else:
            scene = build_tight_scene_device(
                jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
        centers = a.reshape(-1, 12, 3).mean(axis=1)
        n = int(rng.integers(64, 2048))
        idx = rng.integers(0, len(centers), n)
        offs = rng.normal(size=(n, 3)).astype(np.float32)
        offs /= np.linalg.norm(offs, axis=1, keepdims=True)
        dist = float(rng.uniform(10, 200))
        o = (centers[idx] + offs * dist).astype(np.float32)
        d = (centers[idx] + rng.uniform(0.05, 0.4) - o).astype(np.float32)
        flip = rng.random(n) < 0.3
        d[flip] = offs[flip]  # point away: misses
        rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
        aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

        sweep = bool(rng.random() < 0.5)
        got = trace_closest_hit_tight(scene, rays, packet=packet, sweep=sweep)
        want = brute_force_closest_hit(rays, aj, bj, cj)
        tg, tw = np.asarray(got.t), np.asarray(want.t)
        agree = (np.isfinite(tg) == np.isfinite(tw)).mean()
        assert agree > 0.99, (rd, n_cubes, leaf, packet, builder, agree)
        both = np.isfinite(tg) & np.isfinite(tw)
        if both.any():
            np.testing.assert_allclose(tg[both], tw[both], rtol=3e-3,
                                       err_msg=str((rd, n_cubes, leaf, packet)))
        occ = np.asarray(trace_any_hit_tight(scene, rays, packet=packet,
                                             sweep=sweep))
        assert (occ == np.isfinite(tg)).all(), (rd, "any-hit mismatch")

        # bounded occlusion: occluded iff closest hit strictly inside t_max
        tm = np.where(np.isfinite(tg), tg, dist).astype(np.float32)
        tm *= rng.choice([0.5, 1.5], size=n).astype(np.float32)
        occ_b = np.asarray(trace_any_hit_tight(
            scene, rays, t_max=jnp.asarray(tm), packet=packet))
        want_b = np.isfinite(tg) & (tg < tm)
        assert (occ_b == want_b).all(), (rd, "t_max any-hit mismatch")

        if builder == "host" and rng.random() < 0.5:
            # refit a jittered copy and re-check against brute force
            jit_amt = rng.normal(scale=0.05, size=(a.shape[0], 1, 3)).astype(np.float32)
            pts = np.stack([a, b, c], axis=1) + jit_amt
            a2, b2, c2 = pts[:, 0], pts[:, 1], pts[:, 2]
            re = make_refitter(scene)(jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2))
            got2 = trace_closest_hit_tight(re, rays, packet=packet)
            want2 = brute_force_closest_hit(rays, jnp.asarray(a2), jnp.asarray(b2), jnp.asarray(c2))
            t2g, t2w = np.asarray(got2.t), np.asarray(want2.t)
            assert (np.isfinite(t2g) == np.isfinite(t2w)).mean() > 0.98, (rd, "refit")
        if builder == "host" and rng.random() < 0.3:
            # chained scenes: force >=2 parts, compare hit t within the
            # documented boundary-grazing class
            from bvh_tpu.ops.cluster import build_chained_scene
            from bvh_tpu.ops.trace import trace_closest_hit_chained

            chs = build_chained_scene(a, b, c, max_part=max(n_cubes * 4, 48))
            gotc = trace_closest_hit_chained(chs, rays, packet=packet)
            tc = np.asarray(gotc.t)
            assert (np.isfinite(tc) == np.isfinite(tw)).mean() > 0.99, (rd, "chained")
            bc = np.isfinite(tc) & np.isfinite(tw)
            if bc.any():
                np.testing.assert_allclose(tc[bc], tw[bc], rtol=1e-2,
                                           err_msg=str((rd, "chained")))
        if scene.gnodes is not None and rng.random() < 0.5:
            # subtree entry: planned walk must be bit-identical to plain
            # (device-built scenes carry wide tables now — covered too)
            from bvh_tpu.ops.trace import make_planner

            plan = make_planner(scene, packet=packet)
            hints_p, start_p = plan(rays)
            if hints_p is not None:
                gotp = trace_closest_hit_tight(scene, rays, packet=packet,
                                               hints=hints_p, start_g=start_p)
                assert (np.asarray(gotp.t) == tg).all(), (rd, "planned t")
                assert (np.asarray(gotp.shape_id)
                        == np.asarray(got.shape_id)).all(), (rd, "planned id")
        if builder == "host" and rng.random() < 0.4:
            # mask+delta incremental update vs brute force on moved geometry
            from bvh_tpu.ops import make_updater

            n_tris = a.shape[0]
            amt = max(1, int(n_tris * rng.uniform(0.01, 0.3)))
            a2u, b2u, c2u, moved_u = tb.randomly_transform_scene(
                a, b, c, amount=amt, seed=rd + 1)
            cap = -(-amt // 16) * 16
            upd = make_updater(scene, max_moved=cap)
            pad_u = np.full(cap, -1, np.int32)
            pad_u[:amt] = moved_u[:amt]
            from bvh_tpu.ops.trace import trace_closest_hit_chained as _tcc

            chu = upd(jnp.asarray(a2u), jnp.asarray(b2u), jnp.asarray(c2u),
                      jnp.asarray(pad_u))
            gotu = _tcc(chu, rays, packet=packet)
            wantu = brute_force_closest_hit(rays, jnp.asarray(a2u),
                                            jnp.asarray(b2u), jnp.asarray(c2u))
            tu_g, tu_w = np.asarray(gotu.t), np.asarray(wantu.t)
            assert (np.isfinite(tu_g) == np.isfinite(tu_w)).mean() > 0.99, \
                (rd, "update")
            bu = np.isfinite(tu_g) & np.isfinite(tu_w)
            if bu.any():
                np.testing.assert_allclose(tu_g[bu], tu_w[bu], rtol=1e-2,
                                           err_msg=str((rd, "update")))
        if rng.random() < 0.4:
            # nearest-neighbor kernel vs the brute oracle
            from bvh_tpu.ops.nearest import nearest_tight
            from bvh_tpu.tri import point_triangle_distance_squared

            npts = int(rng.integers(64, 1024))
            pts = (centers[rng.integers(0, len(centers), npts)]
                   + rng.normal(scale=rng.uniform(0.5, 50),
                                size=(npts, 3))).astype(np.float32)
            sidn, distn = nearest_tight(scene, pts, packet=packet)
            d2b = point_triangle_distance_squared(
                jnp.asarray(pts)[:, None, :], aj[None], bj[None], cj[None])
            bd = np.sqrt(np.asarray(d2b).min(axis=1))
            np.testing.assert_allclose(np.asarray(distn), bd, rtol=1e-4,
                                       atol=0.01,
                                       err_msg=str((rd, "nearest")))
            # chained nearest: carried-radius multi-part combine on hardware
            from bvh_tpu.ops.cluster import build_chained_scene as _bcs
            from bvh_tpu.ops.nearest import nearest_chained

            chn = _bcs(a, b, c, max_part=max(n_cubes * 4, 48))
            sidc, distc = nearest_chained(chn, pts, packet=packet)
            np.testing.assert_allclose(np.asarray(distc), bd, rtol=1e-4,
                                       atol=0.01,
                                       err_msg=str((rd, "nearest chained")))

        if rng.random() < 0.5:
            # perm-folded pack: bit-identical to tracing pre-sorted rays
            from bvh_tpu.ops.trace import sort_rays_device

            permf, invf = sort_rays_device(jnp.asarray(o), jnp.asarray(d),
                                           bits=2)
            rays_srt = Ray.create(jnp.asarray(o)[permf], jnp.asarray(d)[permf])
            gs = trace_closest_hit_tight(scene, rays_srt, packet=packet,
                                         sweep=sweep)
            gp = trace_closest_hit_tight(scene, rays, packet=packet,
                                         sweep=sweep, perm=permf)
            assert (np.asarray(gs.t) == np.asarray(gp.t)).all(), (rd, "perm t")
            assert (np.asarray(gs.shape_id)
                    == np.asarray(gp.shape_id)).all(), (rd, "perm id")
        if rng.random() < 0.3:
            # k-closest depth peeling vs brute-force ordered hit list
            from bvh_tpu.ops.ordered import trace_k_closest
            from bvh_tpu.ray import ray_intersects_triangle

            kk = int(rng.integers(2, 5))
            tk, sidk, cntk = trace_k_closest(scene, rays, k=kk, packet=packet,
                                             tris=(aj, bj, cj))
            rr_all = Ray(rays.origin[:, None, :], rays.direction[:, None, :],
                         rays.inv_direction[:, None, :])
            inter_all = ray_intersects_triangle(rr_all, aj, bj, cj)
            t_all = np.asarray(inter_all.distance)  # [n, n_tris]
            t_sorted = np.sort(np.where(np.isfinite(t_all), t_all, np.inf),
                               axis=1)[:, :kk]
            tkn = np.asarray(tk)
            # first hit must match exactly-ish; later peels within the
            # documented eps_rel offset class
            m0 = np.isfinite(t_sorted[:, 0])
            assert (np.isfinite(tkn[:, 0]) == m0).mean() > 0.99, (rd, "k0 mask")
            b0 = np.isfinite(tkn[:, 0]) & m0
            if b0.any():
                np.testing.assert_allclose(tkn[b0, 0], t_sorted[b0, 0],
                                           rtol=3e-3, err_msg=str((rd, "k0")))
            for ki in range(1, kk):
                bk = np.isfinite(tkn[:, ki]) & np.isfinite(t_sorted[:, ki])
                if bk.any():
                    # peeling can skip a surface within the eps band of the
                    # previous hit; compare only where both enumerate
                    close = np.abs(tkn[bk, ki] - t_sorted[bk, ki]) \
                        <= np.maximum(3e-3 * t_sorted[bk, ki], 1e-2)
                    assert close.mean() > 0.95, (rd, f"k{ki}", close.mean())

        print(f"round {rd}: cubes={n_cubes} leaf={leaf} packet={packet} "
              f"builder={builder} sweep={sweep} agree={agree:.4f} OK")
