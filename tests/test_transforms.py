"""Transform hierarchy tests (reference: transforms.rs update_world semantics)."""

import numpy as np

from awsm_renderer_tpu.core.transforms import Transform, Transforms
from awsm_renderer_tpu.utils import math3d as m3


def test_world_propagation():
    t = Transforms()
    root = t.insert(Transform(translation=np.array([1, 0, 0], np.float32)))
    child = t.insert(Transform(translation=np.array([0, 2, 0], np.float32)), parent=root)
    changed = t.update_world()
    assert changed == {root, child}
    np.testing.assert_allclose(t.world_of(child)[:3, 3], [1, 2, 0])


def test_dirty_subtree_only(monkeypatch):
    t = Transforms()
    a = t.insert()
    b = t.insert(parent=a)
    c = t.insert()  # unrelated root
    t.update_world()
    t.set_translation(a, [5, 0, 0])
    changed = t.update_world()
    assert changed == {a, b}
    assert c not in changed


def test_no_dirty_no_work():
    t = Transforms()
    t.insert()
    t.update_world()
    assert t.update_world() == set()


def test_reparent():
    t = Transforms()
    a = t.insert(Transform(translation=np.array([10, 0, 0], np.float32)))
    b = t.insert(Transform(translation=np.array([1, 0, 0], np.float32)))
    t.update_world()
    np.testing.assert_allclose(t.world_of(b)[:3, 3], [1, 0, 0])
    t.set_parent(b, a)
    t.update_world()
    np.testing.assert_allclose(t.world_of(b)[:3, 3], [11, 0, 0])


def test_rotation_scale_compose():
    t = Transforms()
    q = m3.quat_from_axis_angle([0, 1, 0], np.pi / 2)
    a = t.insert(Transform(rotation=q, scale=np.array([2, 2, 2], np.float32)))
    b = t.insert(Transform(translation=np.array([1, 0, 0], np.float32)), parent=a)
    t.update_world()
    # child at +x, parent rotates +90° about y (x -> -z), scaled by 2
    np.testing.assert_allclose(t.world_of(b)[:3, 3], [0, 0, -2], atol=1e-5)


def test_normal_matrix_nonuniform_scale():
    t = Transforms()
    a = t.insert(Transform(scale=np.array([2, 1, 1], np.float32)))
    t.update_world()
    n = t.normal[t.row_of(a)]
    # normal matrix = inverse-transpose: x axis scaled by 1/2
    np.testing.assert_allclose(n[0, 0], 0.5, atol=1e-6)


def test_capacity_growth_preserves_data():
    t = Transforms(initial_capacity=2)
    keys = [t.insert(Transform(translation=np.array([i, 0, 0], np.float32))) for i in range(5)]
    t.update_world()
    for i, k in enumerate(keys):
        np.testing.assert_allclose(t.world_of(k)[:3, 3], [i, 0, 0])


def test_remove_subtree():
    t = Transforms()
    a = t.insert()
    b = t.insert(parent=a)
    t.update_world()
    t.remove(a)
    assert not t._alloc.contains(a)
    assert not t._alloc.contains(b)


def test_decompose_roundtrip():
    q = m3.quat_from_axis_angle([1, 2, 3], 0.7)
    m = m3.trs_to_mat4([1, 2, 3], q, [2, 3, 4])
    tr, rot, sc = m3.mat4_decompose(m)
    m2 = m3.trs_to_mat4(tr, rot, sc)
    np.testing.assert_allclose(m, m2, atol=1e-5)
