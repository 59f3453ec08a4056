"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Requirement (survey §4): sharded traversal must match single-device traversal
bitwise; the sharded training step must agree with the unsharded gradient.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bvh_tpu import Ray
from bvh_tpu import testbase as tb
from bvh_tpu.bvh import build_sah, closest_hit_triangles
from bvh_tpu.diff import render_depth
from bvh_tpu.parallel import make_mesh, shard_scene, sharded_render_depth, sharded_train_step


@pytest.fixture(scope="module")
def setup():
    a, b, c = tb.create_n_cubes(32)  # 384 triangles
    centers = a.reshape(-1, 12, 3).mean(axis=1)
    origins = (centers + np.array([800.0, 500.0, -600.0], np.float32)).astype(np.float32)
    # aim slightly off-center: rays through the exact center hit the face
    # diagonal shared by two triangles, a tie that shards may break differently
    aim = centers + np.array([0.11, 0.07, -0.13], np.float32)
    dirs = (aim - origins).astype(np.float32)
    # 384 rays aimed at scene; pad to 384 (divisible by 4 ray shards)
    rays = Ray.create(jnp.asarray(origins), jnp.asarray(dirs))
    return a, b, c, rays


def test_sharded_render_matches_single(setup):
    a, b, c, rays = setup
    mesh = make_mesh(8, scene_shards=2)
    stacked, sa, sb, sc = shard_scene(a, b, c, 2)
    depth, gid = sharded_render_depth(
        mesh, stacked.to_device(), jnp.asarray(sa), jnp.asarray(sb), jnp.asarray(sc), rays
    )
    # single-device reference
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    ref, _hit = render_depth(flat.to_device(), rays, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(ref))
    # hit ids agree with single-device closest hit
    single = closest_hit_triangles(flat.to_device(), rays, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    same = np.asarray(gid) == np.asarray(single.shape_id)
    # ties (equal distance, different triangle) are legal; distances must agree
    if not same.all():
        np.testing.assert_allclose(
            np.asarray(depth)[~same], np.asarray(single.t)[~same], rtol=0
        )


def test_scene_shards_4(setup):
    a, b, c, rays = setup
    mesh = make_mesh(8, scene_shards=4)
    stacked, sa, sb, sc = shard_scene(a, b, c, 4)
    depth, _ = sharded_render_depth(
        mesh, stacked.to_device(), jnp.asarray(sa), jnp.asarray(sb), jnp.asarray(sc), rays
    )
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    ref, _ = render_depth(flat.to_device(), rays, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(ref))


def test_sharded_train_step_decreases_loss(setup):
    a, b, c, rays = setup
    mesh = make_mesh(8, scene_shards=2)
    stacked, sa, sb, sc = shard_scene(a, b, c, 2)
    dev = stacked.to_device()
    sa_, sb_, sc_ = jnp.asarray(sa), jnp.asarray(sb), jnp.asarray(sc)
    # target: depth rendered from the TRUE vertices; perturb and fit back
    # Target asks every hit to be 0.25 farther: a smooth, well-conditioned
    # objective whose optimum translates the surface along the rays, with the
    # hit topology stable over small steps.
    base, _ = sharded_render_depth(mesh, dev, sa_, sb_, sc_, rays)
    target = base + 0.25
    verts = (sa_, sb_, sc_)
    losses = []
    # lr=1.0: vertex coordinates are O(100k), so f32 swallows updates much
    # smaller than ~0.01 — a real lesson for optimizing scenes at this scale.
    for _ in range(4):
        loss, verts = sharded_train_step(mesh, verts, dev, rays, target, lr=1.0)
        losses.append(float(loss))
    assert losses[0] == pytest.approx(0.0625, rel=1e-3)  # 0.25^2
    assert losses[1] < losses[0]
    assert losses[3] < losses[1]


def test_gradients_match_unsharded(setup):
    a, b, c, rays = setup
    mesh = make_mesh(8, scene_shards=2)
    stacked, sa, sb, sc = shard_scene(a, b, c, 2)
    dev = stacked.to_device()
    sa_, sb_, sc_ = jnp.asarray(sa), jnp.asarray(sb), jnp.asarray(sc)
    target, _ = sharded_render_depth(mesh, dev, sa_, sb_, sc_, rays)
    # pull to host so the same array feeds both the sharded and the
    # single-device computation (the sharded output carries mesh sharding)
    target = jnp.asarray(np.asarray(target)) + 0.5  # nonzero residual

    from bvh_tpu.parallel import sharded_loss_and_grads

    loss_sh, grad_sh = sharded_loss_and_grads(mesh, (sa_, sb_, sc_), dev, rays, target)
    grad_sh = jax.tree.map(np.asarray, grad_sh)

    # unsharded reference gradient
    mn, mx = tb.tri_aabbs(a, b, c)
    flat, _ = build_sah(mn, mx)
    flat = flat.to_device()

    def loss_fn(verts):
        aa, bb, cc = verts
        depth, _ = render_depth(flat, rays, aa, bb, cc)
        err = depth - target
        return jnp.mean(err * err)

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(
        (jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-6)
    for g_sh, g_ref, nm in zip(grad_sh, grads_ref, "abc"):
        g_sh_flat = g_sh.reshape(g_ref.shape)
        # f32 reassociation noise between the sharded reduction order and the
        # single-device sum is ~3e-6 absolute on grads of ~1e-2 scale
        np.testing.assert_allclose(g_sh_flat, np.asarray(g_ref), rtol=1e-3, atol=5e-6,
                                   err_msg=f"grad {nm}")


def test_sharded_tight_trace_matches_single(setup):
    """Pallas kernel under shard_map: sharded == single-device, exactly."""
    from bvh_tpu.ops.cluster import build_tight_scene
    from bvh_tpu.ops.trace import trace_closest_hit_tight
    from bvh_tpu.parallel import sharded_trace_any_hit, sharded_trace_closest_hit

    a, b, c, rays = setup
    scene = build_tight_scene(a, b, c, use_native=False)
    mesh = make_mesh(8)
    got = sharded_trace_closest_hit(mesh, scene, rays, packet=128, interpret=True)
    want = trace_closest_hit_tight(scene, rays, packet=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t),
                               rtol=1e-6, equal_nan=True)
    assert (np.asarray(got.shape_id) == np.asarray(want.shape_id)).all()

    tm = jnp.full((rays.origin.shape[0],), 1500.0)
    occ = sharded_trace_any_hit(mesh, scene, rays, t_max=tm, packet=128, interpret=True)
    wt = np.asarray(want.t)
    assert (np.asarray(occ) == (np.isfinite(wt) & (wt < 1500.0))).all()


def test_sharded_tight_trace_with_tris(setup):
    """tris (exact u/v/t recompute) must ride as replicated operands: 384
    triangles divide the 8-way rays axis, the exact auto-shard hazard."""
    from bvh_tpu.ops.cluster import build_tight_scene
    from bvh_tpu.ops.trace import trace_closest_hit_tight
    from bvh_tpu.parallel import sharded_trace_closest_hit

    a, b, c, rays = setup
    assert a.shape[0] % 8 == 0  # the hazard precondition this test pins
    scene = build_tight_scene(a, b, c, use_native=False)
    mesh = make_mesh(8)
    tris = (jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    got = sharded_trace_closest_hit(mesh, scene, rays, tris=tris,
                                    packet=128, interpret=True)
    want = trace_closest_hit_tight(scene, rays, tris=tris,
                                   packet=128, interpret=True)
    # t and shape_id are exact; the u/v Moller-Trumbore recompute picks up
    # ~1e-5 of XLA fusion noise between the sharded and unsharded compiles
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))
    assert (np.asarray(got.shape_id) == np.asarray(want.shape_id)).all()
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(want.u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(want.v), atol=1e-4)


def test_ray_scaling_report(setup):
    """Scaling harness runs at 1/2/4/8 shards on the virtual mesh and the
    sharded results stay consistent (the numbers themselves are CPU noise;
    what this pins is that every shard count compiles and traces)."""
    from bvh_tpu.ops.cluster import build_tight_scene
    from bvh_tpu.parallel import ray_scaling_report

    a, b, c, rays = setup
    scene = build_tight_scene(a, b, c, use_native=False)
    report = ray_scaling_report(scene, rays, shard_counts=(1, 2, 4, 8),
                                packet=128, iters=1, interpret=True)
    assert set(report) == {1, 2, 4, 8}
    for n, row in report.items():
        assert row["rays_per_s"] > 0
        assert row["efficiency"] > 0
    assert report[1]["efficiency"] == 1.0
