"""Frustum tests — ported behaviors from crates/renderer/src/frustum/tests.rs:18-66
(AABB in / out / intersecting a frustum), plus vectorized-path checks."""

import numpy as np

from awsm_renderer_tpu.core.bounds import Aabb
from awsm_renderer_tpu.core.frustum import Frustum
from awsm_renderer_tpu.utils import math3d as m3


def make_frustum(eye=(0, 0, 5), center=(0, 0, 0)):
    view = m3.look_at(eye, center, (0, 1, 0))
    proj = m3.perspective(np.pi / 3, 16 / 9, 0.1, 100.0)
    return Frustum(proj @ view)


def test_aabb_inside():
    f = make_frustum()
    box = Aabb(np.array([-0.5, -0.5, -0.5], np.float32), np.array([0.5, 0.5, 0.5], np.float32))
    assert f.intersects_aabb(box)


def test_aabb_behind_camera():
    f = make_frustum()
    box = Aabb(np.array([-0.5, -0.5, 9.5], np.float32), np.array([0.5, 0.5, 10.5], np.float32))
    assert not f.intersects_aabb(box)


def test_aabb_far_off_to_side():
    f = make_frustum()
    box = Aabb(np.array([99.5, -0.5, -0.5], np.float32), np.array([100.5, 0.5, 0.5], np.float32))
    assert not f.intersects_aabb(box)


def test_aabb_straddles_plane():
    f = make_frustum()
    # huge box around the whole frustum: intersects even though corners are outside
    box = Aabb(np.array([-1000, -1000, -1000], np.float32), np.array([1000, 1000, 1000], np.float32))
    assert f.intersects_aabb(box)


def test_aabb_beyond_far_plane():
    f = make_frustum()
    box = Aabb(np.array([-1, -1, -300], np.float32), np.array([1, 1, -200], np.float32))
    assert not f.intersects_aabb(box)


def test_vectorized_matches_scalar():
    f = make_frustum()
    rng = np.random.default_rng(0)
    centers = rng.uniform(-50, 50, size=(200, 3)).astype(np.float32)
    half = rng.uniform(0.1, 5, size=(200, 3)).astype(np.float32)
    mins, maxs = centers - half, centers + half
    vec = f.intersects_aabbs(mins, maxs)
    scalar = np.array([f.intersects_aabb(Aabb(mins[i], maxs[i])) for i in range(200)])
    assert np.array_equal(vec, scalar)


def test_aabb_transform():
    box = Aabb(np.array([-1, -1, -1], np.float32), np.array([1, 1, 1], np.float32))
    m = m3.trs_to_mat4([10, 0, 0], m3.quat_from_axis_angle([0, 0, 1], np.pi / 4), [1, 1, 1])
    t = box.transform(m)
    s2 = np.sqrt(2.0)
    np.testing.assert_allclose(t.min, [10 - s2, -s2, -1], atol=1e-5)
    np.testing.assert_allclose(t.max, [10 + s2, s2, 1], atol=1e-5)
