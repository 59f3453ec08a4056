"""ChainedScene: Morton-partitioned parts with carried best-t (interpret)."""

import numpy as np

import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh.traverse import brute_force_closest_hit
from bvh_tpu.ops.cluster import build_chained_scene
from bvh_tpu.ops.trace import (trace_any_hit_chained, trace_closest_hit_chained,
                               trace_closest_hit_tight)


def _rays(a, n, rng, miss_frac=0.3):
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    idx = np.resize(np.arange(len(centers)), n)
    offs = rng.normal(size=(n, 3)).astype(np.float32)
    offs /= np.linalg.norm(offs, axis=1, keepdims=True)
    o = (centers[idx] + offs * 40.0).astype(np.float32)
    d = (centers[idx] + 0.17 - o).astype(np.float32)
    flip = rng.random(n) < miss_frac
    d[flip] = offs[flip]
    return Ray.create(jnp.asarray(o), jnp.asarray(d))


def test_chained_matches_brute_force():
    a, b, c = tb.create_n_cubes(60)  # 720 tris
    ch = build_chained_scene(a, b, c, max_part=200, use_native=False)
    assert len(ch.parts) == 4
    # every triangle appears in exactly one part
    allids = np.concatenate(ch.orig_ids)
    assert sorted(allids.tolist()) == list(range(a.shape[0]))

    rng = np.random.default_rng(2)
    rays = _rays(a, 512, rng)
    got = trace_closest_hit_chained(ch, rays, packet=128, interpret=True)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    # grazing-edge class doubles at part boundaries (documented): <=1%
    np.testing.assert_allclose(tg[both], tw[both], rtol=1e-2)
    # and the vast majority of rays are exact-class
    frac_tight = (np.abs(tg[both] / tw[both] - 1) < 3e-3).mean()
    assert frac_tight > 0.95, frac_tight

    # exact u/v/t recompute: where the winner id agrees with brute force,
    # t must match to float rounding
    got2 = trace_closest_hit_chained(ch, rays, tris=(aj, bj, cj),
                                     packet=128, interpret=True)
    sid_eq = np.asarray(got2.shape_id) == np.asarray(want.shape_id)
    both2 = np.isfinite(np.asarray(got2.t)) & sid_eq
    # ties on shared cube-face diagonals make different-but-equal winners
    # legal; where ids DO agree the recomputed t is float-exact
    assert both2.mean() > 0.5
    np.testing.assert_allclose(np.asarray(got2.t)[both2], tw[both2], rtol=1e-5)
    t2 = np.asarray(got2.t)
    fin2 = np.isfinite(t2)
    np.testing.assert_allclose(t2[fin2], tw[fin2], rtol=1e-2)

    # occlusion, bounded: same contract as the single-scene tracer
    tm = np.where(both, tg * 1.05, 30.0).astype(np.float32)
    occ = trace_any_hit_chained(ch, rays, t_max=jnp.asarray(tm),
                                packet=128, interpret=True)
    want_occ = np.isfinite(tw) & (tw < tm)
    assert (np.asarray(occ) == want_occ).all()


def test_chained_single_part_passthrough():
    a, b, c = tb.create_n_cubes(20)
    ch = build_chained_scene(a, b, c, use_native=False)  # default max_part
    assert len(ch.parts) == 1
    rng = np.random.default_rng(5)
    rays = _rays(a, 256, rng)
    got = trace_closest_hit_chained(ch, rays, packet=128, interpret=True)
    want = trace_closest_hit_tight(ch.parts[0], rays, packet=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))


def test_chained_parts_share_table_shapes():
    """All parts are re-padded to one (node, group) bucket — a diverging
    part would silently cost a 10s-3min remote kernel recompile."""
    a, b, c = tb.create_n_cubes(120)
    ch = build_chained_scene(a, b, c, max_part=500, use_native=False)
    assert len(ch.parts) >= 2
    shapes = {(p.smem_nodes.shape, p.groups.shape, p.tri_map.shape)
              for p in ch.parts}
    assert len(shapes) == 1, shapes
    # and the re-padded parts still trace correctly end to end
    rng = np.random.default_rng(5)
    rays = _rays(a, 256, rng)
    got = trace_closest_hit_chained(ch, rays, packet=128, interpret=True)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    want = brute_force_closest_hit(rays, aj, bj, cj)
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert (np.isfinite(tg) == np.isfinite(tw)).all()
    both = np.isfinite(tg)
    np.testing.assert_allclose(tg[both], tw[both], rtol=1e-2)
