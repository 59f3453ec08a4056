"""Kernel-speed distance-ordered traversal: K closest hits by depth peeling.

The reference's ordered traversals (`/root/reference/src/bvh/
distance_traverse.rs:100-133`, `child_distance_traverse.rs`) lazily yield
CANDIDATE shapes nearest-first through a per-ray binary heap; callers
almost always consume them to find the first few actual intersections
(transparency, any-hit-with-alpha, photon walks). The pure-JAX port of
that contract lives in ``bvh.ordered`` (collect + sort, exact ordering).

A heap per ray cannot feed a 2048-lane packet kernel, so the TPU fast
path inverts the contract: ``trace_k_closest`` returns the first K actual
TRIANGLE hits per ray in ascending distance order by *depth peeling* —
trace closest (full Pallas kernel speed, sweep/planner compatible),
advance each ray's origin just past its hit, re-trace. Every pass runs
the tight/wide kernel at full throughput; packets whose lanes are all
dead are pre-gated off, so the cost of pass i is proportional to the
rays that still need a deeper hit.

Caveats (documented contract, tested):
  - two surfaces within the peel epsilon of each other (default
    ``eps_rel`` = 1e-4 relative) can merge into one reported hit — the
    float class of coplanar/coincident geometry;
  - winding matters: like every closest-hit query here, backfaces are
    culled (reference Moller-Trumbore semantics), so K-closest enumerates
    front-facing intersections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ray import Ray
from .trace import trace_closest_hit_tight

_INF = np.float32(np.inf)  # plain scalar: a jnp array here would initialize
# the XLA backend at import, breaking jax.distributed.initialize-first


def _peel(rays: Ray, k: int, eps_rel: float, eps_abs: float, trace_pass):
    """Shared depth-peel loop: ``trace_pass(ray_i, alive, i) -> HitRecord``
    runs one closest-hit pass (gating its dead packets however the scene
    type allows); this accumulates the K ascending hits."""
    o, d, inv = rays.origin, rays.direction, rays.inv_direction
    r = o.shape[0]
    t_off = jnp.zeros((r,), jnp.float32)
    alive = jnp.ones((r,), bool)
    ts, ids = [], []
    for i in range(k):
        ray_i = Ray(o + t_off[:, None] * d, d, inv)
        hit = trace_pass(ray_i, alive, i)
        fin = jnp.isfinite(hit.t) & alive
        ts.append(jnp.where(fin, t_off + hit.t, _INF))
        ids.append(jnp.where(fin, hit.shape_id, -1))
        if i + 1 < k:
            step = hit.t * (1.0 + eps_rel) + eps_abs
            t_off = t_off + jnp.where(fin, step, 0.0)
            alive = fin
    t = jnp.stack(ts, axis=1)
    sid = jnp.stack(ids, axis=1)
    count = jnp.sum(jnp.isfinite(t), axis=1).astype(jnp.int32)
    return t, sid, count


def _empty(k):
    return (jnp.zeros((0, k), jnp.float32), jnp.zeros((0, k), jnp.int32),
            jnp.zeros((0,), jnp.int32))


def trace_k_closest(scene, rays: Ray, k: int = 4, packet: int = 2048,
                    sweep: bool = False, interpret: bool = False,
                    tris=None, eps_rel: float = 1e-4, eps_abs: float = 1e-6,
                    precision=jax.lax.Precision.HIGHEST):
    """First ``k`` triangle hits per ray, nearest first (depth peeling).

    Returns ``(t [R, k], shape_id [R, k], count [R])``; unused slots hold
    +inf / -1. Pass ``tris=(a, b, c)`` to recompute each winner's exact t
    (tightens the accumulated peel offset and the returned distances).

    Each peel pass re-traces only packets with a live lane (the kernel's
    per-packet pre-gate), so coherent batches pay ~one extra pass per
    extra surface actually crossed.
    """
    r = rays.origin.shape[0]
    if r == 0:
        return _empty(k)
    pad = (-r) % packet
    p = (r + pad) // packet

    def trace_pass(ray_i, alive, i):
        if i == 0:
            gate = None
        else:
            al = (jnp.concatenate([alive, jnp.zeros((pad,), bool)])
                  if pad else alive)
            gate = jnp.any(al.reshape(p, packet), axis=1).astype(jnp.int32)
        return trace_closest_hit_tight(scene, ray_i, packet=packet,
                                       sweep=sweep, interpret=interpret,
                                       tris=tris, precision=precision,
                                       pre_gate=gate)

    return _peel(rays, k, eps_rel, eps_abs, trace_pass)


def trace_k_closest_chained(chained, rays: Ray, k: int = 4,
                            packet: int = 2048, sweep: bool = True,
                            interpret: bool = False, tris=None,
                            eps_rel: float = 1e-4, eps_abs: float = 1e-6):
    """``trace_k_closest`` over a ``ChainedScene`` (beyond one SMEM table)."""
    from .trace import trace_closest_hit_chained

    if rays.origin.shape[0] == 0:
        return _empty(k)

    def trace_pass(ray_i, alive, i):
        # dead lanes carry t_max=0 from pass 2 on: the chained tracer's
        # per-part root gate then skips whole part dispatches for packets
        # with no live lane (the chained analog of trace_k_closest's
        # pre-gate), and live packets prune dead lanes from the root
        tm_i = None if i == 0 else jnp.where(alive, _INF, 0.0)
        return trace_closest_hit_chained(chained, ray_i, packet=packet,
                                         sweep=sweep, interpret=interpret,
                                         tris=tris, t_max=tm_i)

    return _peel(rays, k, eps_rel, eps_abs, trace_pass)
