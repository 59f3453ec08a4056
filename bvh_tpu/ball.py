"""Balls (circles in 2D, spheres in 3D) as batched query volumes.

Mirrors reference semantics: containment by squared distance
(``src/ball.rs:61-68``) and AABB intersection by closest-point-on-box
(``src/ball.rs:85-99``). A ``Ball`` batch is a pytree ``(center [..., D],
radius [...])``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Ball(NamedTuple):
    center: jnp.ndarray  # [..., D]
    radius: jnp.ndarray  # [...]

    @staticmethod
    def create(center, radius) -> "Ball":
        return Ball(jnp.asarray(center), jnp.asarray(radius))

    def contains(self, point: jnp.ndarray) -> jnp.ndarray:
        d = point - self.center
        return jnp.sum(d * d, axis=-1) <= self.radius * self.radius

    def intersects_aabb(self, aabb_min: jnp.ndarray, aabb_max: jnp.ndarray) -> jnp.ndarray:
        closest = jnp.clip(self.center, aabb_min, aabb_max)
        d = closest - self.center
        return jnp.sum(d * d, axis=-1) <= self.radius * self.radius


Sphere = Ball
Circle = Ball
