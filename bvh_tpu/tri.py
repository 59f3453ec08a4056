"""Triangle utilities: exact point-triangle distance (batched, jittable).

The analog of the reference testbase's ``Triangle::distance_squared``
(``src/testbase.rs:314-443``, adapted there from Embree). Implemented as the
standard closest-point-on-triangle region classification (Ericson, Real-Time
Collision Detection §5.1.5), fully vectorized with selects.
"""

from __future__ import annotations

import jax.numpy as jnp


def closest_point_on_triangle(
    p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> jnp.ndarray:
    """Closest point to ``p`` on triangle ``abc``; all inputs [..., 3]."""
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)
    in_a = (d1 <= 0.0) & (d2 <= 0.0)

    bp = p - b
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)
    in_b = (d3 >= 0.0) & (d4 <= d3)

    cp = p - c
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)
    in_c = (d6 >= 0.0) & (d5 <= d6)

    vc = d1 * d4 - d3 * d2
    in_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    v_ab = d1 / jnp.where(d1 - d3 == 0.0, 1.0, d1 - d3)

    vb = d5 * d2 - d1 * d6
    in_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    w_ac = d2 / jnp.where(d2 - d6 == 0.0, 1.0, d2 - d6)

    va = d3 * d6 - d5 * d4
    in_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)
    denom_bc = (d4 - d3) + (d5 - d6)
    w_bc = (d4 - d3) / jnp.where(denom_bc == 0.0, 1.0, denom_bc)

    denom = va + vb + vc
    denom = jnp.where(denom == 0.0, 1.0, denom)
    v_in = vb / denom
    w_in = vc / denom

    # Priority order matches the sequential early returns.
    pt_face = a + ab * v_in[..., None] + ac * w_in[..., None]
    out = pt_face
    out = jnp.where(in_bc[..., None], b + (c - b) * w_bc[..., None], out)
    out = jnp.where(in_ac[..., None], a + ac * w_ac[..., None], out)
    out = jnp.where(in_ab[..., None], a + ab * v_ab[..., None], out)
    out = jnp.where(in_c[..., None], c, out)
    out = jnp.where(in_b[..., None], b, out)
    out = jnp.where(in_a[..., None], a, out)
    return out


def point_triangle_distance_squared(
    p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> jnp.ndarray:
    q = closest_point_on_triangle(p, a, b, c)
    d = p - q
    return jnp.sum(d * d, axis=-1)
