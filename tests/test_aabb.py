"""AABB algebra tests, mirroring reference src/aabb/aabb_impl.rs:717-942."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import jax.numpy as jnp

from bvh_tpu import Aabb

coord = st.floats(-1e4, 1e4, width=32)
vec3 = st.tuples(coord, coord, coord)


def mk(mn, mx):
    return Aabb.with_bounds(jnp.asarray(mn, jnp.float32), jnp.asarray(mx, jnp.float32))


def test_contains_basic():
    aabb = mk([-1, -1, -1], [1, 1, 1])
    assert bool(aabb.contains(jnp.array([0.125, -0.25, 0.5])))
    assert not bool(aabb.contains(jnp.array([1.0, -2.0, 4.0])))


def test_empty_and_infinite():
    e = Aabb.empty(3)
    assert bool(e.is_empty())
    # Growing an empty box by a point gives the point-box.
    g = e.grow(jnp.array([1.0, 2.0, 3.0]))
    assert np.allclose(g.min, [1, 2, 3]) and np.allclose(g.max, [1, 2, 3])
    inf = Aabb.infinite(3)
    assert not bool(inf.is_empty())
    assert bool(inf.contains(jnp.array([1e30, -1e30, 0.0])))


def test_center_overflow_safe():
    # reference src/aabb/aabb_impl.rs:729-746 — center of huge box must not overflow
    big = np.float32(3.0e38)
    aabb = mk([-big, -big, -big], [big, big, big])
    assert np.all(np.isfinite(np.asarray(aabb.center())))
    assert np.allclose(aabb.center(), 0.0)


def test_surface_area_volume():
    aabb = mk([41, 41, 41], [43, 43, 43])
    # reference proxy: 2 * size.dot(size) = 2 * (4+4+4) = 24
    assert float(aabb.surface_area()) == 24.0
    assert float(aabb.volume()) == 8.0


def test_largest_axis():
    aabb = mk([-100, 0, 0], [100, 0, 0])
    assert int(aabb.largest_axis()) == 0


def test_min_distance_squared():
    aabb = mk([0, 0, 0], [10, 10, 10])
    d2 = float(aabb.min_distance_squared(jnp.array([20.0, 0.0, 0.0])))
    assert np.sqrt(d2) == pytest.approx(10.0)
    # inside => 0
    assert float(aabb.min_distance_squared(jnp.array([5.0, 5.0, 5.0]))) == 0.0


def test_index_like_access():
    aabb = mk([3, 4, 5], [123, 123, 123])
    assert np.allclose(aabb[0], [3, 4, 5])
    assert np.allclose(aabb[1], [123, 123, 123])


def test_intersects_aabb_touching_counts():
    a = mk([-1, -1, -1], [1, 1, 1])
    b = mk([1.0, -0.1, -0.1], [1.5, 0.1, 0.1])
    assert bool(a.intersects_aabb(b))
    c = mk([1.1, -0.1, -0.1], [1.5, 0.1, 0.1])
    assert not bool(a.intersects_aabb(c))


def test_approx_contains():
    aabb = mk([-1, -1, -1], [1, 1, 1])
    barely_outside = jnp.array([1.0000001, -1.0000001, 1.000000001])
    assert bool(aabb.approx_contains_eps(barely_outside, 0.00001))
    assert not bool(aabb.approx_contains_eps(jnp.array([1.0, -2.0, 4.0]), 0.00001))


@settings(max_examples=60, deadline=None)
@given(vec3, vec3, vec3)
def test_prop_join_contains_both(p1, p2, p3):
    """The union of two boxes contains points of both (reference proptests)."""
    lo = np.minimum(p1, p2).astype(np.float32)
    hi = np.maximum(p1, p2).astype(np.float32)
    a = mk(lo, hi)
    b = mk(np.asarray(p3, np.float32), np.asarray(p3, np.float32) + 1.0)
    j = a.join(b)
    assert bool(j.contains(jnp.asarray(lo)))
    assert bool(j.contains(jnp.asarray(hi)))
    assert bool(j.contains(jnp.asarray(p3, jnp.float32)))


@settings(max_examples=60, deadline=None)
@given(vec3, vec3, vec3)
def test_prop_grow_then_contains(p1, p2, q):
    lo = np.minimum(p1, p2).astype(np.float32)
    hi = np.maximum(p1, p2).astype(np.float32)
    a = mk(lo, hi).grow(jnp.asarray(q, jnp.float32))
    assert bool(a.contains(jnp.asarray(q, jnp.float32)))


@settings(max_examples=40, deadline=None)
@given(vec3, vec3)
def test_prop_surface_volume_grow_monotone(p1, p2):
    lo = np.minimum(p1, p2).astype(np.float32)
    hi = np.maximum(p1, p2).astype(np.float32)
    a = mk(lo, hi)
    bigger = a.grow(jnp.asarray(hi + 10.0))
    assert float(bigger.surface_area()) >= float(a.surface_area())
    assert float(bigger.volume()) >= float(a.volume())


def test_batched_ops():
    mn = jnp.array([[0, 0, 0], [1, 1, 1]], jnp.float32)
    mx = jnp.array([[1, 1, 1], [3, 3, 3]], jnp.float32)
    aabb = Aabb(mn, mx)
    sa = aabb.surface_area()
    assert sa.shape == (2,)
    assert np.allclose(sa, [6.0, 24.0])
    pts = jnp.array([[0.5, 0.5, 0.5], [0.0, 0.0, 0.0]], jnp.float32)
    assert np.array_equal(np.asarray(aabb.contains(pts)), [True, False])
