"""Dirty-range device flush tests (reference: buffer/helpers.rs dirty
ranges, transforms.rs:255-327 coalesced uploads).

After the first full upload, mesh add/remove must flush as range
updates (append-gather / tri_mesh tombstone) — not a full-pool
re-transpose — while rendering identically to a from-scratch build of
the same scene."""

import numpy as np
import pytest

from awsm_renderer_tpu import (
    AwsmRendererTpu, PbrMaterial, RendererConfig, Transform,
)
from awsm_renderer_tpu.geometry import box, uv_sphere
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 64


def _renderer():
    r = AwsmRendererTpu(RendererConfig(width=W, height=H))
    view = m3.look_at([3.0, 2.0, 4.0], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def _add_box(r, x, mat=None, geo=None):
    if mat is None:
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.8, 0.3, 0.2, 1], np.float32)))
    tk = r.transforms.insert(Transform(
        translation=np.array([x, 0, 0], np.float32)))
    r.transforms.update_world()
    key = r.meshes.insert_geometry(
        geo if geo is not None else box(0.7),
        r.transforms.row_of(tk), r.materials.row_of(mat), tk, mat)
    r.meshes.update_world(r.transforms)
    return key, mat


class TestDeviceUpdatesPlan:
    def test_first_flush_is_full(self):
        r = _renderer()
        _add_box(r, 0.0)
        plan = r.meshes.device_updates()
        assert plan[0] == "full"

    def test_add_after_flush_is_range_append(self):
        r = _renderer()
        _add_box(r, 0.0)
        r.meshes.device_updates()
        key2, _ = _add_box(r, 1.5)
        plan = r.meshes.device_updates()
        assert plan[0] == "ranges"
        (s, rows, dead), = plan[1]
        assert rows is not None
        assert s % r.meshes.DEV_GROUP == 0
        assert rows.size % r.meshes.DEV_GROUP == 0
        mesh = r.meshes.get(key2)
        assert rows[0] == mesh.t_base
        assert (~dead).sum() == mesh.t_count

    def test_remove_after_flush_is_tombstone(self):
        r = _renderer()
        k1, mat = _add_box(r, 0.0)
        _add_box(r, 1.5, mat)
        r.meshes.device_updates()
        span = r.meshes._dev_spans[k1]
        r.meshes.remove(k1)
        plan = r.meshes.device_updates()
        assert plan[0] == "ranges"
        (s, rows, count), = plan[1]
        assert rows is None
        assert (s, s + count) == span

    def test_add_remove_between_flushes_collapses(self):
        r = _renderer()
        _add_box(r, 0.0)
        r.meshes.device_updates()
        key, mat = _add_box(r, 1.5)
        r.meshes.remove(key)
        plan = r.meshes.device_updates()
        assert plan == ("ranges", [])

    def test_many_removes_trigger_recompaction(self):
        r = _renderer()
        mat = None
        keys = []
        geo = uv_sphere(0.4, rings=24, sectors=48)   # ~2.2k tris each
        for i in range(8):
            k, mat = _add_box(r, float(i), mat, geo=geo)
            keys.append(k)
        r.meshes.device_updates()
        for k in keys[:6]:
            r.meshes.remove(k)
        plan = r.meshes.device_updates()
        assert plan[0] == "full"

    def test_capacity_growth_forces_full(self):
        r = _renderer()
        _add_box(r, 0.0)
        r.meshes.device_updates()
        # a large mesh forces corner-pool growth -> capacity_changed
        _add_box(r, 2.0, geo=uv_sphere(0.5, rings=48, sectors=96))
        if r.meshes.capacity_changed:
            plan = r.meshes.device_updates()
            assert plan[0] == "full"


class TestRenderEquivalence:
    def _fresh_image(self, xs, mat_color):
        r = _renderer()
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.asarray(mat_color, np.float32)))
        for x in xs:
            _add_box(r, x, mat)
        return r.render()

    def test_incremental_add_matches_fresh(self):
        color = [0.8, 0.3, 0.2, 1]
        r = _renderer()
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.asarray(color, np.float32)))
        _add_box(r, 0.0, mat)
        img0 = r.render()               # full upload happened here
        _add_box(r, 1.5, mat)           # append range
        img1 = r.render()
        ref = self._fresh_image([0.0, 1.5], color)
        np.testing.assert_allclose(img1, ref, atol=2e-5, rtol=1e-5)
        assert np.abs(img1 - img0).max() > 0.01   # the add is visible

    def test_incremental_remove_matches_fresh(self):
        color = [0.8, 0.3, 0.2, 1]
        r = _renderer()
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.asarray(color, np.float32)))
        k1, _ = _add_box(r, 0.0, mat)
        _add_box(r, 1.5, mat)
        r.render()                      # full upload
        r.meshes.remove(k1)             # tombstone range
        img = r.render()
        ref = self._fresh_image([1.5], color)
        np.testing.assert_allclose(img, ref, atol=2e-5, rtol=1e-5)

    def test_add_remove_add_sequence(self):
        color = [0.2, 0.5, 0.9, 1]
        r = _renderer()
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.asarray(color, np.float32)))
        k1, _ = _add_box(r, -1.0, mat)
        r.render()
        _add_box(r, 0.5, mat)
        r.render()
        r.meshes.remove(k1)
        _add_box(r, 1.5, mat)
        img = r.render()
        ref = self._fresh_image([0.5, 1.5], color)
        np.testing.assert_allclose(img, ref, atol=2e-5, rtol=1e-5)

    def test_pick_after_incremental_add(self):
        """Picking must resolve appended meshes (device-order tri ids
        route through the updated _tri_mesh_device_order)."""
        r = _renderer()
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.8, 0.3, 0.2, 1], np.float32)))
        _add_box(r, -10.0, mat)          # off to the side
        r.render()
        key2, _ = _add_box(r, 0.0, mat)  # center of view, appended
        r.render()
        picked = r.pick(W // 2, H // 2)
        assert picked == key2
