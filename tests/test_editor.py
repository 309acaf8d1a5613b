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


# ---- interactive session driver (reference: frontend scene.rs runtime) ----

from awsm_renderer_tpu.session import InteractiveSession, OrbitCamera


def _session_scene():
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H,
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    mat = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 0.2, 0.2, 1], F)))
    key = r.add_mesh(box(0.6), mat)
    s = InteractiveSession(
        r, editor=True,
        camera=OrbitCamera(center=(0, 0, 0), radius=4.0, yaw=0.0,
                           pitch=0.35))
    return r, s, key


def test_session_drag_end_to_end():
    """Scripted-pointer session: click selects the mesh and attaches the
    gizmo, a drag on a translate handle moves the TRANSFORM through the
    real pick → ray → set_translation pipeline, and the frame re-renders
    (the reference's pointerdown/move/up flow, scene.rs:108-170)."""
    r, s, key = _session_scene()
    img0 = np.asarray(s.step(0.0))

    # click the object: selection + gizmo attach (ObjectHit)
    s.step(0.0, [("pointer_down", W // 2, H // 2), ("pointer_up",)])
    tk = r.meshes.get(key).transform_key
    assert s.selected == key
    assert s.controller.target == tk
    assert r._mesh_masks()["hud"].any()      # gizmo handles visible

    # find a translate-handle pixel in the rendered frame
    s.step(0.0)
    handle_px = None
    for y in range(0, H, 2):
        for x in range(0, W, 2):
            k = r.pick(x, y)
            if k in s.controller._parts \
                    and s.controller._parts[k][0] == GizmoMode.TRANSLATE:
                handle_px = (x, y, s.controller._parts[k][1])
                break
        if handle_px:
            break
    assert handle_px is not None, "no translate handle visible"
    hx, hy, axis = handle_px

    t0 = r.transforms.get_local(tk).translation.copy()
    img1 = np.asarray(s.step(0.0, [("pointer_down", hx, hy)]))
    assert s.controller.dragging
    img2 = np.asarray(s.step(0.0, [("pointer_move", hx + 14, hy + 6)]))
    s.step(0.0, [("pointer_up",)])
    assert not s.controller.dragging
    t1 = r.transforms.get_local(tk).translation
    assert np.abs(t1 - t0).max() > 1e-3, (t0, t1)   # it moved
    assert np.abs(img2 - img1).max() > 0.05         # and re-rendered


def test_session_orbit_and_wheel():
    """A drag on empty space orbits the camera; wheel zooms — and both
    re-render (CameraMoving action, scene.rs:142-170)."""
    r, s, _key = _session_scene()
    img0 = np.asarray(s.step(0.0))
    eye0 = s.camera.eye().copy()
    img1 = np.asarray(s.step(0.0, [
        ("pointer_down", 4, 4),          # empty corner: no pick hit
        ("pointer_move", 34, 10),
        ("pointer_up",),
    ]))
    assert np.abs(s.camera.eye() - eye0).max() > 1e-2
    assert np.abs(img1 - img0).max() > 0.05
    r0 = s.camera.radius
    s.step(0.0, [("wheel", 3.0)])
    assert s.camera.radius > r0


def test_session_runtime_toggles_and_resize():
    """Sidebar-style runtime toggles route through the public
    reconfiguration API; resize reconfigures the swapchain size."""
    r, s, _key = _session_scene()
    s.step(0.0, [("set", "bloom", True), ("set", "smaa", True)])
    assert r.config.post_processing.bloom
    assert r.config.anti_aliasing.smaa
    s.step(0.0, [("set", "bloom", False)])
    assert not r.config.post_processing.bloom
    img = np.asarray(s.step(0.0, [("resize", 256, 32)]))
    assert img.shape == (32, 256, 4)
