"""Sharded differentiable rendering and the reference training step.

Strategy (survey §2 item 22's TPU plan):

* rays are sharded over the ``rays`` mesh axis (pure data parallelism);
* the scene is range-sharded over the ``scene`` axis: each shard holds a
  contiguous triangle range and a BVH built over just that range. Every shard
  traces all of its rays against its sub-scene; the global closest hit is a
  min-reduction across the ``scene`` axis (all_gather of distances — S values
  per ray — then a select), so the heavy traversal never crosses chips;
* gradients w.r.t. vertices stay shard-local (each shard owns its triangles'
  vertices); gradients w.r.t. ray parameters / replicated state are psum'd by
  shard_map's transpose automatically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ray import Ray, ray_intersects_triangle
from ..bvh.flat import FlatBvh
from ..bvh.sah_build import build_sah
from ..bvh.traverse import closest_hit_triangles


def shard_scene(tri_a, tri_b, tri_c, n_shards: int):
    """Host-side: split triangles into ``n_shards`` contiguous ranges and
    build one BVH per range. Returns stacked arrays with a leading shard axis
    (equal node counts, so they stack) plus the stacked triangle ranges.

    Requires the triangle count to be divisible by ``n_shards``.
    """
    n = tri_a.shape[0]
    if n % n_shards:
        raise ValueError(f"{n} triangles not divisible by {n_shards} shards")
    k = n // n_shards
    flats = []
    for s in range(n_shards):
        sl = slice(s * k, (s + 1) * k)
        mn = np.minimum(np.minimum(tri_a[sl], tri_b[sl]), tri_c[sl])
        mx = np.maximum(np.maximum(tri_a[sl], tri_b[sl]), tri_c[sl])
        flat, _ = build_sah(mn, mx)
        flats.append(flat)
    stacked = FlatBvh(*(np.stack([np.asarray(getattr(f, n_)) for f in flats])
                        for n_ in FlatBvh._fields))
    a = np.stack([tri_a[s * k:(s + 1) * k] for s in range(n_shards)])
    b = np.stack([tri_b[s * k:(s + 1) * k] for s in range(n_shards)])
    c = np.stack([tri_c[s * k:(s + 1) * k] for s in range(n_shards)])
    return stacked, a, b, c


def _local_render_depth(flat, a, b, c, rays, background):
    """Per-shard body: local closest hit + scene-axis min-reduction.

    Differentiable w.r.t. (a, b, c) and rays: the winning shard recomputes its
    hit analytically, losers contribute zero.
    """
    # Leading shard axis of size 1 inside shard_map: drop it.
    flat = jax.tree.map(lambda x: x[0], flat)
    a, b, c = a[0], b[0], c[0]

    sg = jax.lax.stop_gradient
    hard = closest_hit_triangles(sg(flat), sg(rays), sg(a), sg(b), sg(c))
    sid = hard.shape_id
    safe = jnp.maximum(sid, 0)
    g9 = jnp.concatenate([a, b, c], axis=1)[safe]  # one gather, not 3
    inter = ray_intersects_triangle(rays, g9[:, 0:3], g9[:, 3:6], g9[:, 6:9])
    t_loc = jnp.where(sid >= 0, inter.distance, jnp.inf)

    ts = jax.lax.all_gather(sg(t_loc), "scene")  # [S, r] hit distances
    tmin = ts.min(axis=0)
    winner = jnp.argmin(ts, axis=0)
    my_rank = jax.lax.axis_index("scene")
    won = (winner == my_rank) & (sid >= 0)

    t = jax.lax.psum(jnp.where(won, t_loc, 0.0), "scene")
    any_hit = jnp.isfinite(tmin)
    depth = jnp.where(any_hit, t, background)
    shard_size = a.shape[0]
    gid = jax.lax.psum(jnp.where(won, sid + my_rank * shard_size, 0), "scene")
    gid = jnp.where(any_hit, gid, -1)
    return depth, gid


@partial(jax.jit, static_argnames=("mesh", "background"))
def sharded_render_depth(mesh, flat, a, b, c, rays, background: float = 0.0):
    """Depth image over a ('rays','scene') mesh. ``flat``/``a,b,c`` carry a
    leading scene-shard axis (from ``shard_scene``); rays are [R, 3] arrays."""
    fn = jax.shard_map(
        lambda fl, aa, bb, cc, rr: _local_render_depth(fl, aa, bb, cc, rr, background),
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("scene"), flat),
            P("scene"), P("scene"), P("scene"),
            jax.tree.map(lambda _: P("rays"), rays),
        ),
        out_specs=(P("rays"), P("rays")),
        check_vma=False,  # while-loop carries start unvarying; checked vs unsharded in tests
    )
    return fn(flat, a, b, c, rays)


def _local_loss(verts, flat, rays, target, background):
    """Per-device squared-error sum with NO collectives in the differentiated
    path. Each residual is owned by exactly one device along the scene axis
    (the winning shard; miss lanes go to scene rank 0), so summing local
    losses over both mesh axes gives the global sum exactly — and the
    gradient reduction is a single explicit psum outside this function.

    (Differentiating *through* psum/all_gather is wrong under
    ``check_vma=False``: their transpose is psum, inflating cotangents by the
    axis size.)
    """
    a, b, c = verts
    flat = jax.tree.map(lambda x: x[0], flat)
    a, b, c = a[0], b[0], c[0]

    sg = jax.lax.stop_gradient
    hard = closest_hit_triangles(sg(flat), sg(rays), sg(a), sg(b), sg(c))
    sid = hard.shape_id
    safe = jnp.maximum(sid, 0)
    g9 = jnp.concatenate([a, b, c], axis=1)[safe]  # one gather, not 3
    inter = ray_intersects_triangle(rays, g9[:, 0:3], g9[:, 3:6], g9[:, 6:9])
    t_loc = jnp.where(sid >= 0, inter.distance, jnp.inf)

    ts = jax.lax.all_gather(sg(t_loc), "scene")
    tmin = ts.min(axis=0)
    winner = jnp.argmin(ts, axis=0)
    my_rank = jax.lax.axis_index("scene")
    won = (winner == my_rank) & (sid >= 0)
    any_hit = jnp.isfinite(tmin)

    res_won = jnp.where(won, t_loc - target, 0.0)
    res_miss = jnp.where(~any_hit & (my_rank == 0), background - target, 0.0)
    return jnp.sum(res_won * res_won) + jnp.sum(res_miss * res_miss)


@partial(jax.jit, static_argnames=("mesh", "background"))
def sharded_loss_and_grads(mesh, verts, flat, rays, target, background: float = 0.0):
    """Global mean-squared depth loss and its vertex gradients (psum'd over
    the rays axis, sharded over the scene axis like ``verts``)."""

    def body(verts, flat, rays, target):
        lval, grads = jax.value_and_grad(_local_loss)(
            verts, flat, rays, target, background
        )
        cnt = jax.lax.psum(jnp.asarray(target.size, jnp.float32), "rays")
        loss = jax.lax.psum(lval, ("rays", "scene")) / cnt
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "rays") / cnt, grads)
        return loss, grads

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            (P("scene"), P("scene"), P("scene")),
            jax.tree.map(lambda _: P("scene"), flat),
            jax.tree.map(lambda _: P("rays"), rays),
            P("rays"),
        ),
        out_specs=(P(), (P("scene"), P("scene"), P("scene"))),
        check_vma=False,
    )
    return fn(verts, flat, rays, target)


@partial(jax.jit, static_argnames=("mesh", "lr", "background"))
def sharded_train_step(mesh, verts, flat, rays, target, lr: float = 1e-2,
                       background: float = 0.0):
    """One SGD step fitting triangle vertices to a target depth image.

    This is the flagship "training step": forward sharded traversal, backward
    gradient flow through the analytic hit recompute, vertex grads reduced
    with an explicit psum over the data-parallel (rays) axis while staying
    scene-shard-local — the classic DP gradient all-reduce over ICI.
    """

    def body(verts, flat, rays, target):
        lval, grads = jax.value_and_grad(_local_loss)(
            verts, flat, rays, target, background
        )
        cnt = jax.lax.psum(jnp.asarray(target.size, jnp.float32), "rays")
        loss = jax.lax.psum(lval, ("rays", "scene")) / cnt
        grads = jax.tree.map(lambda g: jax.lax.psum(g, "rays") / cnt, grads)
        new_verts = jax.tree.map(lambda v, g: v - lr * g, verts, grads)
        return loss, new_verts

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            (P("scene"), P("scene"), P("scene")),
            jax.tree.map(lambda _: P("scene"), flat),
            jax.tree.map(lambda _: P("rays"), rays),
            P("rays"),
        ),
        out_specs=(P(), (P("scene"), P("scene"), P("scene"))),
        check_vma=False,
    )
    return fn(verts, flat, rays, target)
