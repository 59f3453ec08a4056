"""Microbench: where do the wide walk's ~3.4us/iteration go at P8192?

BENCH_r04 roofline: 110k group tests take 0.415s => ~3.76us per group test,
~0.76 vreg-ops/cycle effective. Round-3's A/B measured ~577ns/iter (at
P4096). This kernel isolates the group test from the walk: a fori_loop of
T group tests over a synthetic wide table, with variants:

  A  full group test + scalar-reduce consumed by the next iteration's
     group id (the walk's serialization, minus stack/narrowphase)
  B  full group test, vector-only accumulation (no scalar reduce) —
     pure VPU throughput on the op mix
  C  as A but with the box scalars hoisted to a constant (measures the
     SMEM-read + scalar-broadcast share)

Run on hardware:  python scratch/gt_bench.py [PACKET] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACKET = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
T = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
G = 469  # level-1 group count of the 120k headline scene
K = 16
INTERP = os.environ.get("INTERP", "0") == "1"


def make_kernel(variant: str, packet: int):
    SUB = packet // 128

    def kernel(gnodes_ref, slab_ref, out_ref):
        oix, oiy, oiz = slab_ref[0, 0], slab_ref[0, 1], slab_ref[0, 2]
        ix, iy, iz = slab_ref[0, 3], slab_ref[0, 4], slab_ref[0, 5]
        vbv = slab_ref[0, 6]

        def group_test(g):
            macc = jnp.zeros((SUB, 128), jnp.int32)
            for k in range(K):
                if variant == "C":
                    ax, ay, az = -80000.0 + 0.5 * k, -80000.0, -80000.0
                    bx, by, bz = 80000.0, 80000.0 - 0.5 * k, 80000.0
                else:
                    base = 7 * k
                    ax, ay, az = (gnodes_ref[base, g], gnodes_ref[base + 1, g],
                                  gnodes_ref[base + 2, g])
                    bx, by, bz = (gnodes_ref[base + 3, g],
                                  gnodes_ref[base + 4, g],
                                  gnodes_ref[base + 5, g])
                t1 = ax * ix - oix
                t2 = bx * ix - oix
                u1 = ay * iy - oiy
                u2 = by * iy - oiy
                v1 = az * iz - oiz
                v2 = bz * iz - oiz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                    jnp.minimum(v1, v2))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                    jnp.maximum(v1, v2))
                fired = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < vbv)
                macc = macc | jnp.where(fired, jnp.int32(1 << k), jnp.int32(0))
            acc = macc
            s = SUB
            while s > 1:
                s //= 2
                acc = acc[:s, :] | acc[s:2 * s, :]
            for sh in (64, 32, 16, 8, 4, 2, 1):
                acc = acc | pltpu.roll(acc, sh, axis=1)
            return jnp.max(acc)

        if variant == "D":
            # A + the real walk's structure: group test inside a pl.when
            # region (condition opaque to the compiler), plus an inner
            # while_loop after it (normally 0 iterations) — measures the
            # region/loop-boundary cost around the same vector work
            def body(i, carry):
                g, acc = carry
                m2_acc = jnp.int32(0)

                @pl.when(g >= 0)
                def _():
                    pass  # region placeholder; real result below

                m = jnp.int32(0)
                do = g >= jnp.int32(0)

                def taken():
                    return group_test(g)

                def not_taken():
                    return jnp.int32(0)

                m = jax.lax.cond(do, taken, not_taken)

                def step(mm):
                    return jax.lax.bitwise_and(mm, mm - 1)

                m2 = jax.lax.while_loop(lambda mm: mm != 0, step,
                                        jax.lax.bitwise_and(m, 0))
                g2 = jax.lax.rem(g + 1 + m2 + jax.lax.bitwise_and(m, 0),
                                 jnp.int32(G))
                return g2, acc + m

            _, acc = jax.lax.fori_loop(0, T, body,
                                       (jnp.int32(0), jnp.int32(0)))
            out_ref[0, :] = jnp.full((128,), acc.astype(jnp.float32))
        elif variant == "B":
            # vector-only: accumulate fired masks, no scalar consumer in
            # the loop; one reduce at the end
            def body(i, vacc):
                g = jax.lax.rem(i, jnp.int32(G))
                macc = jnp.zeros((SUB, 128), jnp.int32)
                for k in range(K):
                    base = 7 * k
                    ax, ay, az = (gnodes_ref[base, g],
                                  gnodes_ref[base + 1, g],
                                  gnodes_ref[base + 2, g])
                    bx, by, bz = (gnodes_ref[base + 3, g],
                                  gnodes_ref[base + 4, g],
                                  gnodes_ref[base + 5, g])
                    t1 = ax * ix - oix
                    t2 = bx * ix - oix
                    u1 = ay * iy - oiy
                    u2 = by * iy - oiy
                    v1 = az * iz - oiz
                    v2 = bz * iz - oiz
                    tmin = jnp.maximum(
                        jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                        jnp.minimum(v1, v2))
                    tmax = jnp.minimum(
                        jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                        jnp.maximum(v1, v2))
                    fired = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < vbv)
                    macc = macc | jnp.where(fired, jnp.int32(1 << k),
                                            jnp.int32(0))
                return vacc | macc
            vacc = jax.lax.fori_loop(0, T, body, jnp.zeros((SUB, 128),
                                                           jnp.int32))
            out_ref[0, :] = jnp.full((128,), jnp.max(vacc).astype(jnp.float32))
        else:
            # serialized: the group id for step i+1 depends on step i's
            # scalar mask (always +1 in practice; the compiler cannot know)
            def body(i, carry):
                g, acc = carry
                m = group_test(g)
                g2 = jax.lax.rem(g + 1 + jax.lax.bitwise_and(m, 0),
                                 jnp.int32(G))
                return g2, acc + m

            _, acc = jax.lax.fori_loop(0, T, body,
                                       (jnp.int32(0), jnp.int32(0)))
            out_ref[0, :] = jnp.full((128,), acc.astype(jnp.float32))

    return kernel


def run(variant: str, packet: int):
    sub = packet // 128
    rng = np.random.default_rng(0)
    # plausible boxes/slab rows (values don't matter for timing)
    gn = rng.uniform(-1e5, 1e5, size=(7 * K + 1, G)).astype(np.float32)
    slab = rng.uniform(-10.0, 10.0, size=(1, 7, sub, 128)).astype(np.float32)
    slab[0, 6] = np.inf

    fn = pl.pallas_call(
        make_kernel(variant, packet),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(slab.shape, lambda i, *_: (0, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=INTERP,
    )
    gnj, slabj = jnp.asarray(gn), jnp.asarray(slab)

    def go():
        return float(jnp.sum(fn(gnj, slabj)))

    go()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    fence = 0.027
    ns = (best - fence) * 1e9 / T
    print(f"variant {variant} P{packet}: best {best:.4f}s "
          f"({ns:.0f} ns/group-test, fence-corrected)", flush=True)





def run_grid(packet: int, n_steps: int = 256, t_per_step: int = 473):
    """Variant G: the A loop inside a 256-step grid with the REAL kernel's
    block shapes (slab + lmat DMA'd per step, scratch re-init per step) —
    measures per-grid-step overhead."""
    sub = packet // 128
    rng = np.random.default_rng(0)
    gn = rng.uniform(-1e5, 1e5, size=(7 * K + 1, G)).astype(np.float32)
    slab = rng.uniform(-10.0, 10.0,
                       size=(n_steps, 7, sub, 128)).astype(np.float32)
    slab[:, 6] = np.inf
    lmat = rng.uniform(-1.0, 1.0,
                       size=(n_steps, 16, packet)).astype(np.float32)

    SUB = sub

    def kernel(gnodes_ref, slab_ref, lmat_ref, out_ref, bestk_ref,
               bestc_ref, vb_ref):
        bestk_ref[:, :] = jnp.full((SUB, 128), jnp.int32(2**30), jnp.int32)
        bestc_ref[:, :] = jnp.zeros((SUB, 128), jnp.int32)
        vb_ref[:, :] = slab_ref[0, 6]
        oix, oiy, oiz = slab_ref[0, 0], slab_ref[0, 1], slab_ref[0, 2]
        ix, iy, iz = slab_ref[0, 3], slab_ref[0, 4], slab_ref[0, 5]

        def group_test(g):
            vbv = vb_ref[:, :]
            macc = jnp.zeros((SUB, 128), jnp.int32)
            for k in range(K):
                base = 7 * k
                ax, ay, az = (gnodes_ref[base, g], gnodes_ref[base + 1, g],
                              gnodes_ref[base + 2, g])
                bx, by, bz = (gnodes_ref[base + 3, g],
                              gnodes_ref[base + 4, g],
                              gnodes_ref[base + 5, g])
                t1 = ax * ix - oix
                t2 = bx * ix - oix
                u1 = ay * iy - oiy
                u2 = by * iy - oiy
                v1 = az * iz - oiz
                v2 = bz * iz - oiz
                tmin = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(u1, u2)),
                    jnp.minimum(v1, v2))
                tmax = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(u1, u2)),
                    jnp.maximum(v1, v2))
                fired = (tmax >= jnp.maximum(tmin, 0.0)) & (tmin < vbv)
                macc = macc | jnp.where(fired, jnp.int32(1 << k),
                                        jnp.int32(0))
            acc = macc
            s = SUB
            while s > 1:
                s //= 2
                acc = acc[:s, :] | acc[s:2 * s, :]
            for sh in (64, 32, 16, 8, 4, 2, 1):
                acc = acc | pltpu.roll(acc, sh, axis=1)
            return jnp.max(acc)

        def body(i, carry):
            g, acc = carry
            m = group_test(g)
            if os.environ.get("INNER_WHILE", "0") == "1":
                # never-taken inner while_loop, mimicking narrow_mask
                def step(mm):
                    # loop-carried RAW hazard: vb is READ by every group
                    # test; this conditional write forces ordering
                    vb_ref[:, :] = jnp.minimum(vb_ref[:, :],
                                               mm.astype(jnp.float32))
                    return jax.lax.bitwise_and(mm, mm - 1)

                m2w = jax.lax.while_loop(lambda mm: mm != 0, step,
                                         jax.lax.bitwise_and(m, 0))
                m = m + m2w
            g2 = jax.lax.rem(g + 1 + jax.lax.bitwise_and(m, 0), jnp.int32(G))
            return g2, acc + m

        _, acc = jax.lax.fori_loop(0, t_per_step, body,
                                   (jnp.int32(0), jnp.int32(0)))
        out_ref[0, :] = (jnp.full((SUB, 128), acc.astype(jnp.float32))
                         + lmat_ref[0, :1, :1])

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, sub, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_steps,),
            scratch_shapes=[pltpu.VMEM((sub, 128), jnp.int32),
                            pltpu.VMEM((sub, 128), jnp.int32),
                            pltpu.VMEM((sub, 128), jnp.float32)],
            in_specs=[
                pl.BlockSpec((1, 7, sub, 128), lambda i, *_: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16, packet), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, sub, 128), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=INTERP,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )
    gnj, slabj, lmatj = jnp.asarray(gn), jnp.asarray(slab), jnp.asarray(lmat)

    def go():
        return float(jnp.sum(fn(gnj, slabj, lmatj)[:, 0, 0]))

    go()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        go()
        best = min(best, time.perf_counter() - t0)
    fence = 0.027
    per_step = (best - fence) / n_steps
    ns = per_step * 1e9 / t_per_step
    print(f"variant G P{packet} grid={n_steps} T/step={t_per_step}: "
          f"best {best:.4f}s ({per_step*1e6:.0f} us/step, "
          f"{ns:.0f} ns/group-test)", flush=True)


if __name__ == "__main__":
    if os.environ.get("GRID", "0") == "1":
        run_grid(PACKET)
    else:
        for v in ("A", "B", "D"):
            run(v, PACKET)
