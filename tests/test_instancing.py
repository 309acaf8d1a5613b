"""Shared-geometry instancing tests (reference: instances.rs:22-203 —
one instance-transform buffer, one copy of the geometry, one draw).

TPU-first shape under test: corners uploaded once per group; the frame
tiles them across instances at trace time (passes/frame.py
_combined_geometry); per-instance mesh records keep culling, hiding,
picking and removal working at instance granularity."""

import numpy as np

from awsm_renderer_tpu import (
    AwsmRendererTpu, PbrMaterial, RendererConfig, Transform,
)
from awsm_renderer_tpu.geometry import box, uv_sphere
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32
W, H = 128, 64


def _cam(r):
    view = m3.look_at([0, 1.5, 6.0], [0, 0, 0], [0, 1, 0])
    r.camera.update(view, m3.perspective(np.pi / 3, W / H, 0.1, 100.0))


def _instanced_scene(n=5, geo=None):
    r = AwsmRendererTpu(RendererConfig(width=W, height=H))
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.3, 0.5, 0.9, 1], F)))
    res = r.meshes.insert_resource(geo if geo is not None else box(0.5))
    tks = []
    for i in range(n):
        tks.append(r.transforms.insert(Transform(
            translation=np.array([(i - (n - 1) / 2) * 1.2, 0, 0], F))))
    r.transforms.update_world()
    keys = r.meshes.insert_instanced(
        res, [(r.transforms.row_of(t), t) for t in tks],
        r.materials.row_of(mat), mat)
    r.meshes.update_world(r.transforms)
    _cam(r)
    return r, keys, tks


def _duplicated_scene(n=5, geo=None):
    r = AwsmRendererTpu(RendererConfig(width=W, height=H))
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.3, 0.5, 0.9, 1], F)))
    res = r.meshes.insert_resource(geo if geo is not None else box(0.5))
    keys = []
    for i in range(n):
        tk = r.transforms.insert(Transform(
            translation=np.array([(i - (n - 1) / 2) * 1.2, 0, 0], F)))
        r.transforms.update_world()
        keys.append(r.meshes.insert(
            res, r.transforms.row_of(tk), r.materials.row_of(mat), tk, mat))
    r.meshes.update_world(r.transforms)
    _cam(r)
    return r, keys


def test_instanced_matches_duplicated():
    """The instanced stream must render bit-identically to stamping the
    same geometry per instance (same vertex math, different storage)."""
    r_i, _, _ = _instanced_scene()
    r_d, _ = _duplicated_scene()
    np.testing.assert_array_equal(r_i.render(), r_d.render())


def test_geometry_uploaded_once():
    """Device corner storage for a group is one copy — independent of the
    instance count (the VERDICT round-1 gap: N instances used to stamp N
    full corner pools)."""
    r5, _, _ = _instanced_scene(5)
    r20, _, _ = _instanced_scene(20)
    r5.render()
    r20.render()
    k5 = [k for k in r5._device if k.startswith("inst0_c_pos")]
    assert k5, "instanced group corners missing from device dict"
    assert (r5._device["inst0_c_pos"].shape
            == r20._device["inst0_c_pos"].shape)
    assert r20._device["inst0_rows"].shape == (20,)
    # the pooled corner pool holds no instanced geometry
    assert np.asarray(r5._device["tri_mesh"] >= 0).sum() == 0


def test_pick_each_instance():
    r, keys, _ = _instanced_scene(5)
    r.render()
    got = set()
    for x in range(4, W - 4, 2):
        k = r.pick(x, H // 2)
        if k is not None:
            got.add(k)
    assert got == set(keys)


def test_hide_one_instance():
    r, keys, _ = _instanced_scene(5)
    img0 = r.render()
    r.meshes.set_hidden(keys[2], True)
    img1 = r.render()
    # center instance gone, others still there
    assert np.abs(img1 - img0).max() > 0.01
    picked = {r.pick(x, H // 2) for x in range(4, W - 4, 2)}
    picked.discard(None)
    assert keys[2] not in picked
    assert picked == set(keys) - {keys[2]}


def test_remove_one_instance_matches_fresh():
    r, keys, _ = _instanced_scene(5)
    r.render()
    r.meshes.remove(keys[0])
    img = r.render()
    # fresh scene with only instances 1..4
    r2 = AwsmRendererTpu(RendererConfig(width=W, height=H))
    mat = r2.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.3, 0.5, 0.9, 1], F)))
    res = r2.meshes.insert_resource(box(0.5))
    tks = []
    for i in range(1, 5):
        tks.append(r2.transforms.insert(Transform(
            translation=np.array([(i - 2) * 1.2, 0, 0], F))))
    r2.transforms.update_world()
    r2.meshes.insert_instanced(
        res, [(r2.transforms.row_of(t), t) for t in tks],
        r2.materials.row_of(mat), mat)
    r2.meshes.update_world(r2.transforms)
    _cam(r2)
    np.testing.assert_array_equal(img, r2.render())


def test_remove_all_instances_drops_group():
    r, keys, _ = _instanced_scene(3)
    r.render()
    for k in keys:
        r.meshes.remove(k)
    img = r.render()
    assert not any(k.startswith("inst") for k in r._device)
    # nothing rendered but sky
    assert (np.abs(np.diff(img[..., :3], axis=0)) > 0.01).mean() < 0.01


def test_instances_animate_via_transforms():
    """Instance transforms ride the normal transform table — moving one
    moves only that instance."""
    r, keys, tks = _instanced_scene(3)
    img0 = r.render()
    t = r.transforms.get_local(tks[1])
    t.translation = np.array([0.0, 1.5, 0.0], F)
    r.transforms.set_local(tks[1], t)
    r.transforms.update_world()
    r.meshes.update_world(r.transforms)
    img1 = r.render()
    assert np.abs(img1 - img0).max() > 0.01


def test_mixed_pooled_and_instanced():
    """Pooled meshes and instanced groups share one frame."""
    r, keys, _ = _instanced_scene(3)
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.9, 0.2, 0.2, 1], F)))
    tk = r.transforms.insert(Transform(
        translation=np.array([0, 1.4, 0], F)))
    r.transforms.update_world()
    pk = r.meshes.insert_geometry(
        uv_sphere(0.4), r.transforms.row_of(tk), r.materials.row_of(mat),
        tk, mat)
    r.meshes.update_world(r.transforms)
    img = r.render()
    assert np.isfinite(img).all()
    # red sphere visible above the blue row
    reds = (img[..., 0] > img[..., 2] + 0.1) & (img[..., 0] > 0.25)
    assert reds.sum() > 4
    # pick still resolves both kinds
    ys, xs = np.nonzero(reds)
    assert r.pick(int(xs[len(xs) // 2]), int(ys[len(ys) // 2])) == pk
