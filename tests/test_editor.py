"""Editor tests: transform gizmo pick/drag + grid (reference: crates/editor)."""

import numpy as np

from awsm_renderer_tpu import (
    AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping, Transform,
    UnlitMaterial,
)
from awsm_renderer_tpu.editor import (
    GizmoMode, GizmoSpace, Grid, TransformController, screen_ray,
)
from awsm_renderer_tpu.geometry import box
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 64
F = np.float32


def make_renderer():
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    view = m3.look_at([0, 1.5, 4], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def test_screen_ray_through_center():
    r = make_renderer()
    ro, rd = screen_ray(r, W // 2, H // 2)
    # origin lies on the near plane close to the eye, direction toward origin
    np.testing.assert_allclose(ro, [0, 1.5, 4], atol=0.15)
    eye = np.array([0, 1.5, 4.0])
    to_origin = -eye / np.linalg.norm(eye)
    assert float(rd @ to_origin) > 0.99


def test_gizmo_hidden_until_attach():
    r = make_renderer()
    tc = TransformController(r)
    masks = r._mesh_masks()
    assert not masks["hud"].any()
    mat = r.materials.insert(UnlitMaterial())
    key = r.add_mesh(box(0.5), mat)
    tc.attach(r.meshes.get(key).transform_key)
    masks = r._mesh_masks()
    assert masks["hud"].any()
    tc.detach()
    assert not r._mesh_masks()["hud"].any()


def test_translate_drag_moves_target():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial())
    key = r.add_mesh(box(0.5), mat)
    tk = r.meshes.get(key).transform_key
    tc = TransformController(r)
    tc.attach(tk)
    # drive the drag math directly (pointer math, no pick needed)
    part_key = next(k for k, (m, a) in tc._parts.items()
                    if m == GizmoMode.TRANSLATE and a == 0)
    # simulate: force drag state via on_pointer_down internals
    ro, rd = screen_ray(r, W // 2, H // 2)
    tc._drag = {
        "mode": GizmoMode.TRANSLATE, "axis": 0, "a": np.array([1, 0, 0], F),
        "center": np.zeros(3, F),
        "t0": Transform(), "s0": 0.0,
    }
    tc.on_pointer_move(W // 2 + 20, H // 2)
    moved = r.transforms.get_local(tk).translation
    assert moved[0] > 0.05, f"target did not move along +x: {moved}"
    assert abs(moved[1]) < 0.05 and abs(moved[2]) < 0.3


def test_rotate_drag_spins_target():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial())
    key = r.add_mesh(box(0.5), mat)
    tk = r.meshes.get(key).transform_key
    tc = TransformController(r, mode=GizmoMode.ROTATE)
    tc.attach(tk)
    a = np.array([0, 1, 0], F)
    tc._drag = {
        "mode": GizmoMode.ROTATE, "axis": 1, "a": a,
        "center": np.zeros(3, F), "t0": Transform(), "angle0": 0.0,
    }
    tc.on_pointer_move(W // 2 + 15, H // 2)
    q = r.transforms.get_local(tk).rotation
    assert abs(q[1]) > 1e-3  # rotated about y
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)


def test_scale_drag():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial())
    key = r.add_mesh(box(0.5), mat)
    tk = r.meshes.get(key).transform_key
    tc = TransformController(r, mode=GizmoMode.SCALE)
    tc.attach(tk)
    tc._drag = {
        "mode": GizmoMode.SCALE, "axis": 0, "a": np.array([1, 0, 0], F),
        "center": np.zeros(3, F), "t0": Transform(), "s0": 0.0,
    }
    tc.on_pointer_move(W // 2 + 20, H // 2)
    s = r.transforms.get_local(tk).scale
    assert s[0] != 1.0 and s[1] == 1.0


def test_gizmo_pick_and_full_drag_cycle():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 1, 0, 1], F)))
    key = r.add_mesh(box(0.5), mat)
    tk = r.meshes.get(key).transform_key
    tc = TransformController(r)
    tc.attach(tk)
    r.render()
    # find a pixel showing a gizmo part
    found = None
    for y in range(0, H, 2):
        for x in range(0, W, 2):
            if r.pick(x, y) in tc._parts:
                found = (x, y)
                break
        if found:
            break
    assert found, "no gizmo part visible on screen"
    assert tc.on_pointer_down(*found)
    assert tc.dragging
    tc.on_pointer_move(found[0] + 4, found[1])
    tc.on_pointer_up()
    assert not tc.dragging


def test_grid_renders_lines():
    r = make_renderer()
    Grid(r, size=50.0, spacing=1.0)
    img = r.render()
    # lower half of the screen shows the ground plane: lines vs gaps
    strip = img[H - 8, :, 0]
    assert strip.std() > 0.01, "grid should produce varying intensity"
