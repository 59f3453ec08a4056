"""Validate the vectorized splitmix64 scene generator against a scalar oracle."""

import numpy as np

from bvh_tpu import testbase as tb


def splitmix64_scalar(state):
    """Direct transliteration of the splitmix64 reference algorithm."""
    state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = state
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return state, z ^ (z >> 31)


def test_splitmix64_known_vector():
    # Well-known first output for seed 0.
    _, out = splitmix64_scalar(0)
    assert out == 0xE220A8397B1DCDAF
    assert int(tb.splitmix64_stream(0, 1)[0]) == 0xE220A8397B1DCDAF


def test_splitmix64_stream_matches_scalar():
    state = 0
    outs = []
    for _ in range(100):
        state, o = splitmix64_scalar(state)
        outs.append(o)
    vec = tb.splitmix64_stream(0, 100)
    assert np.array_equal(vec, np.array(outs, dtype=np.uint64))
    # non-zero seed
    state = 0xDEADBEEF
    outs = [0] * 10
    for i in range(10):
        state, outs[i] = splitmix64_scalar(state)
    assert np.array_equal(tb.splitmix64_stream(0xDEADBEEF, 10), np.array(outs, np.uint64))


def next_point3_raw_scalar(state):
    state, u = splitmix64_scalar(state)
    a = ((u >> 32) & 0xFFFFFFFF) - 0x80000000
    b = (u & 0xFFFFFFFF) - 0x80000000
    bu = b & 0xFFFFFFFFFFFFFFFF  # two's complement bit pattern as u64
    rot = ((bu << 6) | (bu >> 58)) & 0xFFFFFFFFFFFFFFFF
    c = (a & 0xFFFFFFFFFFFFFFFF) ^ rot
    # cast to i32 (truncate low 32 bits, reinterpret signed)
    def to_i32(x):
        x = x & 0xFFFFFFFF
        return x - 0x100000000 if x >= 0x80000000 else x

    return state, (to_i32(a), to_i32(b), to_i32(c))


def test_next_point3_raw_matches_scalar():
    state = 0
    triples = []
    for _ in range(50):
        state, t = next_point3_raw_scalar(state)
        triples.append(t)
    vec = tb.next_point3_raw_stream(0, 50)
    assert np.array_equal(vec, np.array(triples, dtype=np.int32))


def test_next_point3_in_bounds():
    bmin, bmax = tb.default_bounds()
    pts = tb.next_point3_stream(0, 1000, bmin, bmax)
    assert pts.dtype == np.float32
    assert np.all(pts >= bmin) and np.all(pts <= bmax)


def test_create_n_cubes_shape_and_determinism():
    a, b, c = tb.create_n_cubes(100)
    assert a.shape == (1200, 3) and a.dtype == np.float32
    a2, b2, c2 = tb.create_n_cubes(100)
    assert np.array_equal(a, a2) and np.array_equal(b, b2) and np.array_equal(c, c2)
    # each cube: 12 unit triangles, AABB of cube i is center ± 0.5
    mn, mx = tb.tri_aabbs(a, b, c)
    cube_mn = mn.reshape(100, 12, 3).min(axis=1)
    cube_mx = mx.reshape(100, 12, 3).max(axis=1)
    assert np.allclose(cube_mx - cube_mn, 1.0)


def test_create_rays():
    o, d = tb.create_rays(10)
    assert o.shape == (10, 3) and d.shape == (10, 3)
    bmin, bmax = tb.default_bounds()
    assert np.all(o >= bmin) and np.all(o <= bmax)


def test_randomly_transform_scene():
    a, b, c = tb.create_n_cubes(50)
    a2, b2, c2, idx = tb.randomly_transform_scene(a, b, c, amount=100)
    assert len(idx) == 100
    changed = np.any(a != a2, axis=1)
    assert set(np.nonzero(changed)[0]).issubset(set(idx.tolist()))
    bmin, bmax = tb.default_bounds()
    mn, mx = tb.tri_aabbs(a2, b2, c2)
    assert np.all(mn >= bmin - 1e-3) and np.all(mx <= bmax + 1e-3)
