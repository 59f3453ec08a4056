"""Multi-chip ray tracing with the Pallas tight-cluster kernel.

The scaling shape for production serving: the scene (SMEM node table +
packed triangle groups, a few MB) is replicated on every chip; rays are
sharded along the mesh's ``rays`` axis, each chip runs the packet-trace
kernel on its local shard, and results concatenate back — pure data
parallelism with zero inter-chip traffic in the hot loop (the one
collective is the implicit result layout). Rays/s scales linearly with
chip count.

Re-designs the reference's only parallelism (rayon work-stealing across CPU
cores, src/bvh/bvh_impl.rs:525-543) as mesh data-parallelism over ICI.
Complements ``parallel.shard`` (scene-sharded pure-JAX traversal for scenes
too big to replicate).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..bvh.traverse import HitRecord
from ..ray import Ray
from ..ops.trace import _dev


def sharded_trace_closest_hit(mesh, scene, rays: Ray, tris=None,
                              packet: int = 2048, interpret: bool = False,
                              t_max=None) -> HitRecord:
    """Closest hit of a ray batch sharded over ``mesh``'s ``rays`` axis.

    ``scene`` is a TightScene (host- or device-built), replicated per chip.
    Same contract as ``trace_closest_hit_tight``. The ray count is padded
    to devices x packet internally.
    """
    from ..ops.trace import trace_closest_hit_tight

    n_dev = mesh.shape["rays"]
    r = rays.origin.shape[0]
    if r == 0:
        z = jnp.zeros((0,), jnp.float32)
        return HitRecord(z, z, z, jnp.zeros((0,), jnp.int32))
    chunk = -(-r // n_dev)
    chunk = -(-chunk // packet) * packet  # per-device packet multiple
    rp = chunk * n_dev
    pad = rp - r

    def padded(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        ) if pad else x

    o = padded(rays.origin, 2.0e30)
    d = padded(rays.direction, 1.0)
    inv = padded(rays.inv_direction, 1.0)
    tm = None
    if t_max is not None:
        tm = padded(jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1), (r,)), jnp.inf)

    # scene tables AND triangle arrays ride as explicit replicated operands
    # (a closure capture can get auto-sharded along the mesh when its length
    # divides the axis — the triangle count often does)
    sn = _dev(scene.smem_nodes)
    gr = _dev(scene.groups)
    tmap = _dev(scene.tri_map)
    bg = getattr(scene, "bgroups", None)
    bg_args = (jnp.asarray(bg),) if bg is not None else ()
    pn = getattr(scene, "packed_nodes", None)
    pn_args = (jnp.asarray(pn),) if pn is not None else ()
    gn = getattr(scene, "gnodes", None)
    gn_args = (jnp.asarray(gn),) if gn is not None else ()
    tri_args = tuple(jnp.asarray(x) for x in tris) if tris is not None else ()
    k = 3 + len(bg_args) + len(pn_args) + len(gn_args) + len(tri_args)

    def body(*a):
        sn_l, gr_l, tmap_l = a[:3]
        off = 3
        bg_l = a[off] if bg_args else None
        off += len(bg_args)
        pn_l = a[off] if pn_args else None
        off += len(pn_args)
        gn_l = a[off] if gn_args else None
        off += len(gn_args)
        tris_l = a[off:k] if tri_args else None
        o_l, d_l, inv_l = a[k:k + 3]
        tm_l = a[k + 3:]
        # gnodes rides as a replicated operand like the other tables (its
        # bucketed column count commonly divides the rays axis — a closure
        # capture could get auto-sharded); gslot is only read by the
        # seeder, never by the un-hinted trace — null it for safety
        local_scene = scene._replace(smem_nodes=sn_l, groups=gr_l,
                                     tri_map=tmap_l, bgroups=bg_l,
                                     packed_nodes=pn_l, sweep_nodes=None,
                                     gnodes=gn_l, gslot=None)
        local = Ray(o_l, d_l, inv_l)
        hit = trace_closest_hit_tight(
            local_scene, local, tris=tris_l, packet=packet, interpret=interpret,
            t_max=tm_l[0] if tm_l else None)
        return hit.t, hit.u, hit.v, hit.shape_id

    args = (sn, gr, tmap) + bg_args + pn_args + gn_args + tri_args \
        + (o, d, inv) + ((tm,) if tm is not None else ())
    inner = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * k + tuple(P("rays") for _ in args[k:]),
        out_specs=(P("rays"), P("rays"), P("rays"), P("rays")),
        check_vma=False,
    )

    @jax.jit
    def fn(*a):
        t, u, v, sid = inner(*a)
        # trim the packet padding inside jit (an eager slice of a sharded
        # output lowers to an ambiguous gather)
        return t[:r], u[:r], v[:r], sid[:r]

    return HitRecord(*fn(*args))


def sharded_trace_any_hit(mesh, scene, rays: Ray, t_max=None,
                          packet: int = 2048,
                          interpret: bool = False) -> jnp.ndarray:
    """Occlusion query sharded over ``mesh``'s ``rays`` axis (shadow rays)."""
    from ..ops.trace import trace_any_hit_tight

    n_dev = mesh.shape["rays"]
    r = rays.origin.shape[0]
    if r == 0:
        return jnp.zeros((0,), bool)
    chunk = -(-r // n_dev)
    chunk = -(-chunk // packet) * packet
    rp = chunk * n_dev
    pad = rp - r

    def padded(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        ) if pad else x

    o = padded(rays.origin, 2.0e30)
    d = padded(rays.direction, 1.0)
    inv = padded(rays.inv_direction, 1.0)
    tm = None
    if t_max is not None:
        tm = padded(jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32).reshape(-1), (r,)), jnp.inf)

    sn = _dev(scene.smem_nodes)
    gr = _dev(scene.groups)
    tmap = _dev(scene.tri_map)
    bg = getattr(scene, "bgroups", None)
    bg_args = (jnp.asarray(bg),) if bg is not None else ()
    pn = getattr(scene, "packed_nodes", None)
    pn_args = (jnp.asarray(pn),) if pn is not None else ()
    gn = getattr(scene, "gnodes", None)
    gn_args = (jnp.asarray(gn),) if gn is not None else ()
    k = 3 + len(bg_args) + len(pn_args) + len(gn_args)

    def body(*a):
        sn_l, gr_l, tmap_l = a[:3]
        off = 3
        bg_l = a[off] if bg_args else None
        off += len(bg_args)
        pn_l = a[off] if pn_args else None
        off += len(pn_args)
        gn_l = a[off] if gn_args else None
        o_l, d_l, inv_l = a[k:k + 3]
        tm_l = a[k + 3:]
        local_scene = scene._replace(smem_nodes=sn_l, groups=gr_l,
                                     tri_map=tmap_l, bgroups=bg_l,
                                     packed_nodes=pn_l, sweep_nodes=None,
                                     gnodes=gn_l, gslot=None)
        occ = trace_any_hit_tight(
            local_scene, Ray(o_l, d_l, inv_l), packet=packet, interpret=interpret,
            t_max=tm_l[0] if tm_l else None)
        return (occ,)

    args = (sn, gr, tmap) + bg_args + pn_args + gn_args + (o, d, inv) \
        + ((tm,) if tm is not None else ())
    inner = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * k + tuple(P("rays") for _ in args[k:]),
        out_specs=(P("rays"),),
        check_vma=False,
    )

    @jax.jit
    def fn(*a):
        (occ,) = inner(*a)
        return occ[:r]

    return fn(*args)


def multihost_trace_closest_hit(mesh, scene, local_rays: Ray,
                                packet: int = 2048,
                                interpret: bool = False) -> HitRecord:
    """Closest hit on a MULTI-PROCESS mesh: each host passes only its own
    shard of the global ray batch; each gets back the hits for that shard.

    The multi-controller calling convention for ``sharded_trace_closest_hit``
    (whose global-array padding runs eagerly and is therefore
    single-controller only): every process calls this with the same
    ``mesh`` (``make_multihost_mesh``) and ``scene`` (replicated), plus its
    process-local rays — ``local_ray_count`` must be identical on every
    process and a multiple of ``packet`` x (local devices on the rays
    axis). Globally the batch is the concatenation of the processes' shards
    in process order along the mesh's ``rays`` axis.

    Single-process meshes work too (then it is just
    ``sharded_trace_closest_hit`` with pre-validated shapes).
    """
    from jax.sharding import NamedSharding
    from ..ops.trace import trace_closest_hit_tight

    procs = jax.process_count()
    n_rays_axis = mesh.shape["rays"]
    local_dev = max(n_rays_axis // procs, 1)
    r_local = local_rays.origin.shape[0]
    if r_local % (packet * local_dev):
        raise ValueError(
            f"local ray count {r_local} must be a multiple of packet x "
            f"local rays-axis devices = {packet} x {local_dev} (pad with "
            "parked rays: origin 2e30, direction 1)")

    spec = P("rays")
    sharding = NamedSharding(mesh, spec)

    def to_global(x):
        if procs == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    o = to_global(local_rays.origin)
    d = to_global(local_rays.direction)
    inv = to_global(local_rays.inv_direction)

    rep = NamedSharding(mesh, P())

    def to_rep(x):
        x = jnp.asarray(x)
        if procs == 1:
            return jax.device_put(x, rep)
        import numpy as _np
        return jax.make_array_from_process_local_data(rep, _np.asarray(x))

    sn = to_rep(scene.smem_nodes)
    gr = to_rep(scene.groups)
    tmap = to_rep(scene.tri_map)
    gn = getattr(scene, "gnodes", None)
    gn_args = (to_rep(gn),) if gn is not None else ()

    def body(sn_l, gr_l, tmap_l, *rest):
        gn_l = rest[0] if gn_args else None
        o_l, d_l, inv_l = rest[len(gn_args):]
        # wide table as a replicated operand, not a closure capture (its
        # bucketed width can divide the rays axis and get auto-sharded)
        local_scene = scene._replace(smem_nodes=sn_l, groups=gr_l,
                                     tri_map=tmap_l, bgroups=None,
                                     packed_nodes=None, sweep_nodes=None,
                                     gnodes=gn_l, gslot=None)
        hit = trace_closest_hit_tight(local_scene, Ray(o_l, d_l, inv_l),
                                      packet=packet, interpret=interpret)
        return hit.t, hit.u, hit.v, hit.shape_id

    inner = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),) * (3 + len(gn_args)) + (spec, spec, spec),
        out_specs=(spec, spec, spec, spec),
        check_vma=False,
    ))
    t, u, v, sid = inner(sn, gr, tmap, *gn_args, o, d, inv)

    def local(x):
        import numpy as _np
        shards = sorted(x.addressable_shards, key=lambda s: s.index[0].start)
        return _np.concatenate([_np.asarray(s.data) for s in shards], axis=0)

    return HitRecord(local(t), local(u), local(v), local(sid))
