"""Group-walk (wide-tree) kernel: K-ary fired-mask traversal (interpret mode).

The wide kernel (``ops/trace.py::_wide_body``) must produce BIT-IDENTICAL
results to the entry/exit tight kernel on every workload: it walks the same
SAH tree (re-cut into exactly-K frontiers, ``cluster.build_wide_table``) in
the same DFS order with the same narrowphase. Reference analog of both: the
stackless flat walk, /root/reference/src/flat_bvh.rs:396-431.
"""

import numpy as np
import pytest

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops.cluster import (WIDE_K, build_chained_scene,
                                 build_tight_scene, build_wide_table)
from bvh_tpu.ops.trace import (compute_seed_hints, trace_any_hit_tight,
                               trace_closest_hit_chained,
                               trace_closest_hit_tight)


@pytest.fixture(scope="module")
def scene_rays():
    rng = np.random.default_rng(11)
    a, b, c = tb.create_n_cubes(120)  # 1440 tris
    scene = build_tight_scene(a, b, c)
    assert scene.gnodes is not None
    n = 1024
    centers = np.asarray((a + b + c) / 3.0)
    o = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    d = (centers[rng.integers(0, len(a), n)] - o).astype(np.float32)
    d[n // 2:] = rng.normal(size=(n // 2, 3)).astype(np.float32)  # miss-heavy
    return (np.asarray(a), np.asarray(b), np.asarray(c), scene,
            Ray.create(o, d))


def test_wide_table_invariants():
    """Every cluster appears exactly once as a leaf slot; child ids valid."""
    a, b, c = tb.create_n_cubes(80)
    scene = build_tight_scene(a, b, c)
    gn, gs, depth = scene.gnodes, scene.gslot, scene.gdepth
    K = gn.shape[0] // 7
    assert K == WIDE_K
    pay = gn[6::7, :]  # [K, Gn]
    leaf_mask = np.isfinite(pay) & (pay < 0)
    clusters = (-pay[leaf_mask] - 1).astype(np.int64)
    real = clusters[clusters != 0]  # cluster 0 doubles as the empty marker
    assert len(set(real.tolist())) == len(real)
    assert set(range(1, scene.num_clusters)) <= set(clusters.tolist())
    # gslot round-trips: slot -> (g, k) -> payload == -(cluster+1)
    for cidx in range(scene.num_clusters):
        slot = int(gs[cidx])
        g, k = divmod(slot, K)
        assert gn[7 * k + 6, g] == -(cidx + 1)
    # interior payloads point at valid later groups
    inner = np.isfinite(pay) & (pay >= 0)
    assert pay[inner].max(initial=0) < gn.shape[1]
    assert 1 <= depth <= 14


def test_wide_matches_tight_closest(scene_rays):
    a, b, c, scene, rays = scene_rays
    hw = trace_closest_hit_tight(scene, rays, interpret=True, wide=True)
    ht = trace_closest_hit_tight(scene, rays, interpret=True, wide=False)
    assert (np.asarray(hw.t) == np.asarray(ht.t)).all()
    assert (np.asarray(hw.shape_id) == np.asarray(ht.shape_id)).all()
    assert np.isfinite(np.asarray(hw.t)).any()


def test_wide_matches_tight_any_hit(scene_rays):
    a, b, c, scene, rays = scene_rays
    ht = trace_closest_hit_tight(scene, rays, interpret=True, wide=False)
    t = np.asarray(ht.t)
    tmx = np.where(np.isfinite(t), t * 1.25, 2.0).astype(np.float32)
    aw = np.asarray(trace_any_hit_tight(scene, rays, t_max=tmx,
                                        interpret=True, wide=True))
    at = np.asarray(trace_any_hit_tight(scene, rays, t_max=tmx,
                                        interpret=True, wide=False))
    assert (aw == at).all()
    assert aw.any()


def test_wide_seeded_sweep_gated(scene_rays):
    """Seeding hints (slot-encoded) + sweep gate compose with the wide walk."""
    a, b, c, scene, rays = scene_rays
    ht = trace_closest_hit_tight(scene, rays, interpret=True, wide=False)
    hints = compute_seed_hints(scene, rays, interpret=True, packet=1024,
                               sample_stride=32, k_hints=8)
    hw = trace_closest_hit_tight(scene, rays, interpret=True, wide=True,
                                 hints=hints, sweep=True, packet=1024)
    assert (np.asarray(hw.t) == np.asarray(ht.t)).all()
    assert (np.asarray(hw.shape_id) == np.asarray(ht.shape_id)).all()


def test_wide_bounded_t_max(scene_rays):
    a, b, c, scene, rays = scene_rays
    ht = trace_closest_hit_tight(scene, rays, interpret=True, wide=False)
    t = np.asarray(ht.t)
    tmx = np.where(np.isfinite(t), t * 0.5, 3.0).astype(np.float32)
    hw = trace_closest_hit_tight(scene, rays, interpret=True, wide=True,
                                 t_max=tmx)
    hb = trace_closest_hit_tight(scene, rays, interpret=True, wide=False,
                                 t_max=tmx)
    assert (np.asarray(hw.t) == np.asarray(hb.t)).all()
    assert not np.isfinite(np.asarray(hw.t)).any()  # bound below first hit


def test_wide_chained_parts():
    """Chained scenes use the wide walk per part (tables equalized)."""
    rng = np.random.default_rng(5)
    a, b, c = tb.create_n_cubes(200)  # 2400 tris
    chained = build_chained_scene(a, b, c, max_part=900)
    assert len(chained.parts) >= 2
    gshapes = {p.gnodes.shape for p in chained.parts}
    assert len(gshapes) == 1  # one kernel compile serves every part
    n = 512
    centers = np.asarray((a + b + c) / 3.0)
    o = rng.uniform(-60, 60, (n, 3)).astype(np.float32)
    d = (centers[rng.integers(0, len(a), n)] - o).astype(np.float32)
    rays = Ray.create(o, d)
    hc = trace_closest_hit_chained(chained, rays, interpret=True)
    full = build_tight_scene(a, b, c)
    hf = trace_closest_hit_tight(full, rays, interpret=True)
    tw, tf = np.asarray(hc.t), np.asarray(hf.t)
    assert (np.isfinite(tw) == np.isfinite(tf)).all()
    m = np.isfinite(tw)
    assert np.allclose(tw[m], tf[m], rtol=1e-2)  # part-boundary ulp class
    assert m.any()


def test_wide_single_cluster_scene():
    """<=16 tris => one cluster, one group whose only child is a leaf."""
    a, b, c = tb.create_n_cubes(1)  # 12 tris
    scene = build_tight_scene(a, b, c)
    assert scene.gnodes is not None
    centers = np.asarray((a + b + c) / 3.0)
    o = np.full((64, 3), -30.0, np.float32)
    d = (centers[np.arange(64) % 12] - o).astype(np.float32)
    rays = Ray.create(o, d)
    hw = trace_closest_hit_tight(scene, rays, interpret=True, wide=True)
    ht = trace_closest_hit_tight(scene, rays, interpret=True, wide=False)
    assert (np.asarray(hw.t) == np.asarray(ht.t)).all()
    assert np.isfinite(np.asarray(hw.t)).all()


def test_wide_serialization_roundtrip(tmp_path):
    from bvh_tpu.io import load_tight_scene, save_tight_scene

    a, b, c = tb.create_n_cubes(30)
    scene = build_tight_scene(a, b, c)
    path = str(tmp_path / "wide.npz")
    save_tight_scene(path, scene)
    back = load_tight_scene(path)
    assert (back.gnodes == scene.gnodes).all() or (
        np.isnan(back.gnodes) == np.isnan(scene.gnodes)).all()
    assert (back.gslot == scene.gslot).all()
    assert back.gdepth == scene.gdepth


def test_wide_resident_matches_blocked():
    """resident=True (one-shot DMA of the groups table into persistent VMEM
    scratch — the beyond-~12MB path for one-table million-triangle scenes)
    must be bit-identical to the per-step blocked fetch."""
    import jax.numpy as jnp
    from bvh_tpu.ops import trace as tr
    from bvh_tpu.ops.cluster import build_tight_scene

    a, b, c = tb.create_n_cubes(40)
    scene = build_tight_scene(a, b, c, use_native=False)
    rng = np.random.default_rng(0)
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    idx = np.resize(np.arange(len(centers)), 256)
    o = (centers[idx] + rng.normal(size=(256, 3)).astype(np.float32) * 40
         ).astype(np.float32)
    d = (centers[idx] + 0.1 - o).astype(np.float32)
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    p, rp, slab, lmat = tr._pack_rays_tight(rays, 256, None)
    zeros = jnp.zeros((p,), jnp.int32)
    kw = dict(interpret=True, packet=256, width=int(scene.width))
    outs = [tr._trace_wide(tr._dev(scene.gnodes), zeros, zeros,
                           tr._dev(scene.groups), slab, lmat,
                           resident=res, **kw)
            for res in (False, True)]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))
