"""Mosaic compile matrix on the real TPU (env-gated).

Interpret-mode tests cannot catch Mosaic *lowering* failures — the packet
256/512 relayout bug (commit 32e6a02) and the SMEM-budget launch failures
only appear when the kernel actually compiles for hardware. This matrix
compiles-and-runs every supported (width x packet) cell of the tight-trace
kernel once, rotating the mode/bounded/hints/bmat flags across cells so each
flag value compiles at several widths and packets. Run with:

    BVH_TPU_COMPILE_MATRIX=1 python -m pytest tests/test_compile_matrix.py -s -q

Expect ~10-40 minutes: the remote TPU compile service takes 10s-3min per new
kernel shape (cached afterwards). Results are checked against the
brute-force oracle, so a miscompile (not just a compile crash) also fails.
"""

import os

import numpy as np
import pytest

RUN = os.environ.get("BVH_TPU_COMPILE_MATRIX", "0") == "1"

pytestmark = pytest.mark.skipif(
    not RUN, reason="set BVH_TPU_COMPILE_MATRIX=1 (real-TPU compile sweep)")

WIDTHS = (16, 32, 64, 128)
PACKETS = (128, 256, 512, 1024, 2048, 4096)


def test_compile_matrix_tight_kernel():
    import jax

    jax.config.update("jax_platforms", "")  # restore the default (axon/TPU)
    import jax.numpy as jnp

    from bvh_tpu import Ray
    from bvh_tpu import testbase as tb
    from bvh_tpu.bvh.traverse import brute_force_closest_hit
    from bvh_tpu.ops import (build_tight_scene, trace_any_hit_tight,
                             trace_closest_hit_tight)
    from bvh_tpu.ops.trace import compute_seed_hints

    # one scene per width (leaf_size == width); 90 cubes => 1080 tris covers
    # every width without tripping the SMEM budget
    a, b, c = tb.create_n_cubes(90)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    n = 4096
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(centers), n)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 60.0).astype(np.float32)
    d = (centers[idx] + 0.2 - o).astype(np.float32)
    flip = rng.random(n) < 0.3
    d[flip] = offs[flip]  # point away: misses
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tw = np.asarray(want.t)

    scenes = {}
    for wi, w in enumerate(WIDTHS):
        for bm in (False, True):
            scenes[(w, bm)] = build_tight_scene(a, b, c, leaf_size=w, bmat=bm)

    cell = 0
    for wi, w in enumerate(WIDTHS):
        for pi, p in enumerate(PACKETS):
            # rotate flags so every value appears at several (w, p) cells
            mode = ("closest", "any")[cell % 2]
            bounded = (cell // 2) % 2 == 1
            bm = (cell // 4) % 2 == 1
            hints = (cell % 3 == 1) and mode == "closest"
            scene = scenes[(w, bm)]
            tag = f"w={w} p={p} mode={mode} bounded={bounded} bmat={bm} hints={hints}"
            tm = jnp.full((n,), 100.0) if bounded else None
            if mode == "closest":
                h = compute_seed_hints(scene, rays, packet=p) if hints else None
                got = trace_closest_hit_tight(scene, rays, packet=p,
                                              hints=h, t_max=tm)
                tg = np.asarray(got.t)
                want_hit = (np.isfinite(tw) & (tw < 100.0)) if bounded \
                    else np.isfinite(tw)
                agree = (np.isfinite(tg) == want_hit).mean()
                assert agree > 0.99, (tag, agree)
                both = np.isfinite(tg) & np.isfinite(tw)
                np.testing.assert_allclose(tg[both], tw[both], rtol=3e-3,
                                           err_msg=tag)
            else:
                occ = np.asarray(trace_any_hit_tight(scene, rays,
                                                     t_max=tm, packet=p))
                want_occ = (np.isfinite(tw) & (tw < 100.0)) if bounded \
                    else np.isfinite(tw)
                assert (occ == want_occ).mean() > 0.995, tag
            print(f"[matrix] {tag} OK")
            cell += 1


def test_compile_matrix_nearest_kernel():
    """Nearest kernels (wide + entry/exit + refine-off) across widths and
    packets — compiled on hardware."""
    import jax

    jax.config.update("jax_platforms", "")
    import jax.numpy as jnp

    from bvh_tpu import testbase as tb
    from bvh_tpu.ops import build_tight_scene
    from bvh_tpu.ops.nearest import nearest_tight
    from bvh_tpu.tri import point_triangle_distance_squared

    a, b, c = tb.create_n_cubes(90)
    rng = np.random.default_rng(1)
    cen = (a + b + c) / 3.0
    n = 2048
    idx = rng.integers(0, len(cen), n)
    pts = (cen[idx] + rng.normal(scale=25.0, size=(n, 3))).astype(np.float32)
    d2 = np.asarray(point_triangle_distance_squared(
        jnp.asarray(pts)[:, None, :], jnp.asarray(a)[None],
        jnp.asarray(b)[None], jnp.asarray(c)[None]))
    bd = np.sqrt(d2.min(axis=1))

    cell = 0
    for w in WIDTHS:
        scene = build_tight_scene(a, b, c, leaf_size=w)
        for p in (128, 1024, 2048):
            wide = None if scene.gnodes is not None and cell % 3 != 2 \
                else False
            masked = cell % 4 == 3  # refine-off variant
            sc = scene._replace(masked=True) if masked else scene
            tag = f"nearest w={w} p={p} wide={wide} refine={not masked}"
            sid, dist = nearest_tight(sc, pts, packet=p, wide=wide)
            assert np.allclose(np.asarray(dist), bd, rtol=1e-4, atol=0.01), \
                tag
            print(f"[matrix] {tag} OK")
            cell += 1
