"""OBJ asset end-to-end: generate -> parse -> build -> trace vs oracle."""

import os
import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

from bvh_tpu.bvh.traverse import brute_force_closest_hit
from bvh_tpu.diff.camera import camera_rays
from bvh_tpu.io.obj import load_obj_triangles
from bvh_tpu.ops import build_tight_scene
from bvh_tpu.ops.trace import trace_closest_hit_tight


def test_obj_colonnade_end_to_end(tmp_path):
    from obj_render import generate_colonnade_obj

    path = str(tmp_path / "colonnade.obj")
    generate_colonnade_obj(path, n_cols=4)
    a, b, c = load_obj_triangles(path)
    assert a.shape[0] > 250  # boxes + octagonal columns + n-gon caps

    scene = build_tight_scene(a, b, c, use_native=False)
    cam = camera_rays(np.float32([0.0, 9.0, 16.0]), np.float32([0.0, 2.5, 0.0]),
                      np.float32([0.0, 1.0, 0.0]), 55.0, 32, 32)
    got = trace_closest_hit_tight(scene, cam, packet=128, interpret=True)
    want = brute_force_closest_hit(cam, jnp.asarray(a), jnp.asarray(b), jnp.asarray(c))
    tg, tw = np.asarray(got.t), np.asarray(want.t)
    assert np.isfinite(tg).mean() > 0.5  # camera sees the scene
    assert (np.isfinite(tg) == np.isfinite(tw)).mean() > 0.99
    both = np.isfinite(tg) & np.isfinite(tw)
    np.testing.assert_allclose(tg[both], tw[both], rtol=5e-3)
