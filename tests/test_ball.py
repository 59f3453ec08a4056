"""Ball tests mirroring reference src/ball.rs:108-126."""

import numpy as np

import jax.numpy as jnp

from bvh_tpu import Ball


def test_ball_contains():
    ball = Ball.create([3.0, 4.0, 5.0], 1.5)
    assert bool(ball.contains(jnp.asarray(ball.center)))
    just_inside = jnp.array([3.04605, 3.23758, 3.81607])
    just_outside = jnp.array([3.06066, 3.15813, 3.70917])
    assert bool(ball.contains(just_inside))
    assert not bool(ball.contains(just_outside))


def test_ball_intersects_aabb():
    ball = Ball.create([1.0, 1.0, 1.0], 1.0)
    assert bool(
        ball.intersects_aabb(jnp.array([1.25, 1.25, 1.25]), jnp.array([3.0, 3.0, 3.0]))
    )
    assert not bool(
        ball.intersects_aabb(jnp.array([2.5, 2.5, 2.5]), jnp.array([3.0, 3.0, 3.0]))
    )


def test_ball_batched():
    centers = jnp.zeros((4, 3))
    radii = jnp.array([0.5, 1.0, 2.0, 4.0])
    ball = Ball(centers, radii)
    mn = jnp.broadcast_to(jnp.array([1.0, 1.0, 1.0]), (4, 3))
    mx = jnp.broadcast_to(jnp.array([2.0, 2.0, 2.0]), (4, 3))
    out = np.asarray(ball.intersects_aabb(mn, mx))
    # distance from origin to (1,1,1) is sqrt(3) ≈ 1.732
    assert np.array_equal(out, [False, False, True, True])
