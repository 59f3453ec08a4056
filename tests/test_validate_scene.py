"""TightScene table validators (ops/validate_scene.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bvh_tpu import testbase as tb
from bvh_tpu.ops import (assert_tight_scene, build_chained_scene,
                         build_tight_scene, build_tight_scene_device,
                         check_tight_scene)


@pytest.fixture(scope="module")
def abc():
    return tb.create_n_cubes(80)


def test_valid_scenes_pass(abc):
    a, b, c = abc
    for scene in (build_tight_scene(a, b, c, use_native=False),
                  build_tight_scene(a, b, c),
                  build_tight_scene_device(jnp.asarray(a), jnp.asarray(b),
                                           jnp.asarray(c))):
        assert_tight_scene(scene, a, b, c)


def test_chained_parts_pass(abc):
    a, b, c = abc
    ch = build_chained_scene(a, b, c, max_part=400, use_native=False)
    for part, ids in zip(ch.parts, ch.orig_ids):
        ids = np.asarray(ids)
        sel = np.maximum(ids, 0)
        assert_tight_scene(part, a[sel], b[sel], c[sel])


def test_corruption_caught(abc):
    a, b, c = abc
    scene = build_tight_scene(a, b, c, use_native=False)
    # inverted box
    sn = np.array(scene.smem_nodes).copy()
    sn[3, 2] = sn[0, 2] - 1.0
    assert check_tight_scene(scene._replace(smem_nodes=sn), a, b, c)
    # out-of-range exit
    sn2 = np.array(scene.smem_nodes).copy()
    sn2[7, 0] = 1e9
    errs = check_tight_scene(scene._replace(smem_nodes=sn2))
    assert any("exit" in e for e in errs)
    # broken first-child invariant
    sn3 = np.array(scene.smem_nodes).copy()
    entry = sn3[6, :scene.num_nodes]
    internal = np.nonzero(entry >= 0)[0]
    sn3[6, internal[0]] = internal[0] + 2.0
    errs3 = check_tight_scene(scene._replace(smem_nodes=sn3))
    assert any("entry" in e for e in errs3)
    # doubled triangle in tri_map
    tm = np.array(scene.tri_map).copy()
    lanes = np.nonzero(tm >= 0)[0]
    tm[lanes[1]] = tm[lanes[0]]
    errs4 = check_tight_scene(scene._replace(tri_map=tm))
    assert any("twice" in e for e in errs4)


def test_refit_scene_passes(abc):
    from bvh_tpu.ops import make_refitter

    a, b, c = abc
    scene = build_tight_scene(a, b, c, use_native=False)
    a2 = np.asarray(a) + np.float32(0.25)
    b2 = np.asarray(b) + np.float32(0.25)
    c2 = np.asarray(c) + np.float32(0.25)
    re = make_refitter(scene)(jnp.asarray(a2), jnp.asarray(b2),
                              jnp.asarray(c2))
    assert_tight_scene(re, a2, b2, c2)
