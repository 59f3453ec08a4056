"""Fused wavefront path tracer (render.py), interpret mode on the CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.ops import build_tight_scene
from bvh_tpu.ops.trace import trace_any_hit_tight, trace_closest_hit_tight
from bvh_tpu.render import make_pathtracer


def _scene():
    fa, fb, fc = tb.create_dense_mesh(res=16, extent=10.0)
    ca, cb, cc = tb.create_n_cubes(
        1, (np.full(3, -0.5, np.float32), np.full(3, 0.5, np.float32)))
    off = np.float32([0.0, 9.5, 0.0])
    a = np.concatenate([fa, ca * 2 + off]).astype(np.float32)
    b = np.concatenate([fb, cb * 2 + off]).astype(np.float32)
    c = np.concatenate([fc, cc * 2 + off]).astype(np.float32)
    return a, b, c


def test_wavefront_matches_manual_single_bounce():
    """bounces=0: the fused renderer must equal the same shading math done
    manually around individual kernel calls (no RNG involved)."""
    a, b, c = _scene()
    scene = build_tight_scene(a, b, c, use_native=False)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)

    n = 256
    rng = np.random.default_rng(1)
    o = np.tile(np.float32([0.0, 18.0, 14.0]), (n, 1))
    tgt = rng.uniform(-8, 8, size=(n, 3)).astype(np.float32) * [1, 0, 1]
    d = (tgt - o).astype(np.float32)

    tracer = make_pathtracer(scene, (aj, bj, cj), bounces=0, packet=128,
                             interpret=True)
    color = np.asarray(tracer(jnp.asarray(o), jnp.asarray(d), jax.random.key(0)))

    # manual: closest hit + NEE shadow with identical constants
    rays = Ray.create(jnp.asarray(o), jnp.asarray(d))
    hit = trace_closest_hit_tight(scene, rays, tris=(aj, bj, cj),
                                  packet=128, interpret=True)
    t = np.asarray(hit.t)
    sid = np.maximum(np.asarray(hit.shape_id), 0)
    found = np.isfinite(t)
    dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
    p = o + dn * np.where(found, t, 0.0)[:, None]
    nrm = np.cross(b[sid] - a[sid], c[sid] - a[sid])
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    nrm = np.where((np.sum(nrm * d, -1) > 0)[:, None], -nrm, nrm)
    lp = np.float32([12.0, 22.0, 8.0])
    to_l = lp[None] - p
    dist_l = np.linalg.norm(to_l, axis=-1)
    wl = to_l / np.maximum(dist_l[:, None], 1e-20)
    sh_o = np.where(found[:, None], p + nrm * 1e-3, 2.0e30).astype(np.float32)
    occ = np.asarray(trace_any_hit_tight(
        scene, Ray.create(jnp.asarray(sh_o), jnp.asarray(wl)),
        t_max=jnp.asarray((dist_l * 0.999).astype(np.float32)),
        packet=128, interpret=True))
    sky = np.float32([0.45, 0.6, 0.85])
    albedo = np.float32([0.75, 0.72, 0.68])
    lc = np.float32([1.4, 1.344, 1.26])
    want = np.zeros((n, 3), np.float32)
    want[~found] = sky
    ndl = np.maximum(np.sum(nrm * wl, -1), 0.0)
    fall = 500.0 / np.maximum(dist_l, 1.0) ** 2
    lit = found & ~occ
    want[lit] += (albedo[None] * lc[None] * (ndl * fall)[:, None])[lit]

    np.testing.assert_allclose(color, want, rtol=1e-4, atol=1e-5)
    assert found.any() and lit.any() and (~found).any()


def test_wavefront_multibounce_runs_and_accumulates():
    a, b, c = _scene()
    scene = build_tight_scene(a, b, c, use_native=False)
    aj, bj, cj = jnp.asarray(a), jnp.asarray(b), jnp.asarray(c)
    n = 128
    o = np.tile(np.float32([0.0, 18.0, 14.0]), (n, 1))
    rng = np.random.default_rng(2)
    tgt = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32) * [1, 0, 1]
    d = (tgt - o).astype(np.float32)
    t0 = make_pathtracer(scene, (aj, bj, cj), bounces=0, packet=128,
                         interpret=True)(jnp.asarray(o), jnp.asarray(d),
                                         jax.random.key(0))
    t2 = make_pathtracer(scene, (aj, bj, cj), bounces=2, packet=128,
                         interpret=True)(jnp.asarray(o), jnp.asarray(d),
                                         jax.random.key(0))
    c0, c2 = np.asarray(t0), np.asarray(t2)
    assert np.isfinite(c2).all()
    # bounce light only adds energy (same direct term + indirect)
    assert c2.sum() >= c0.sum() - 1e-4
