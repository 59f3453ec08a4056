"""Pinhole camera ray generation (batched, differentiable)."""

from __future__ import annotations

import jax.numpy as jnp

from ..ray import Ray


def camera_rays(
    eye: jnp.ndarray,
    look_at: jnp.ndarray,
    up: jnp.ndarray,
    fov_deg: float,
    width: int,
    height: int,
) -> Ray:
    """Rays through pixel centers of a ``height x width`` image, flattened
    row-major to a batch of ``width*height`` rays."""
    eye = jnp.asarray(eye, jnp.float32)
    fwd = jnp.asarray(look_at, jnp.float32) - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, jnp.asarray(up, jnp.float32))
    right = right / jnp.linalg.norm(right)
    cam_up = jnp.cross(right, fwd)

    aspect = width / height
    tan_half = jnp.tan(jnp.deg2rad(fov_deg) * 0.5)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0
    px, py = jnp.meshgrid(xs * tan_half * aspect, ys * tan_half, indexing="xy")
    dirs = (
        fwd[None, None, :]
        + px[..., None] * right[None, None, :]
        + py[..., None] * cam_up[None, None, :]
    ).reshape(-1, 3)
    origins = jnp.broadcast_to(eye, dirs.shape)
    return Ray.create(origins, dirs)
