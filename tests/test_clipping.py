"""Near-plane clipping: geometry crossing the camera plane renders the
in-front part (the GPU fixed-function behavior our vertex stage emulates
with 2-slot static clipping)."""

import numpy as np

from awsm_renderer_tpu import (
    AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping, Transform,
    UnlitMaterial,
)
from awsm_renderer_tpu.geometry import box, plane
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 32
F = np.float32


def make_renderer(eye=(0, 1.0, 3)):
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    view = m3.look_at(eye, [0, 0, 0], [0, 1, 0])
    r.camera.update(view, m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    return r


def test_ground_plane_through_camera_renders():
    # a huge ground plane extends behind the camera: pre-clipping this was
    # fully rejected; now the visible part must cover the lower screen
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([0, 1, 0, 1], F)))
    r.add_mesh(plane(200.0), mat, transform=Transform(translation=np.array([0, -0.5, 0], F)))
    img = r.render()
    bottom = img[H - 3, :, 1]
    assert (bottom > 0.9).mean() > 0.9, "ground plane missing below the horizon"
    top = img[2, :, 1]
    assert (top < 0.5).mean() > 0.9, "sky should remain above the horizon"


def test_clipped_box_straddling_camera():
    # box surrounds the camera's near plane; front-facing interior walls
    # behind the near plane are clipped away without killing the whole mesh
    r = make_renderer(eye=(0, 0, 0.4))
    mat = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 0, 1, 1], F), double_sided=True))
    r.add_mesh(box(2.0), mat)
    img = r.render()
    assert (img[:, :, 0] > 0.9).mean() > 0.9  # interior fills the view


def test_partially_clipped_triangle_barycentrics():
    # triangle with one vertex far behind the camera: visible part must
    # still interpolate vertex colors (original-triangle barycentrics)
    from awsm_renderer_tpu.core.meshes import MeshGeometry

    r = make_renderer(eye=(0, 0, 2))
    geo = MeshGeometry(
        positions=np.array([[-2, -0.8, 0], [2, -0.8, 0], [0, 0.5, 8.0]], F),
        indices=np.array([[0, 1, 2]], np.int32),
        normals=np.array([[0, 0, 1]] * 3, F),
        color0=np.array([[1, 0, 0, 1], [0, 1, 0, 1], [0, 0, 1, 1]], F),
    )
    mat = r.materials.insert(UnlitMaterial(double_sided=True))
    r.add_mesh(geo, mat)
    img = r.render()
    hit = img[..., 3] > 0
    assert hit.sum() > 40, "clipped triangle should still cover pixels"
    # left side redder, right side greener (original corner colors):
    # probe covered pixels of one row near the bottom
    row = H - 4
    xs = np.nonzero(hit[row])[0]
    assert len(xs) > 6, f"row {row} not covered: {hit.sum()} hits total"
    left = img[row, xs.min() + 2]
    right = img[row, xs.max() - 2]
    assert left[0] > left[1], f"left should lean red: {left}"
    assert right[1] > right[0], f"right should lean green: {right}"


def test_no_clip_fast_path_matches():
    # scene fully in front of the near plane: needs_clip=False must produce
    # the same image as the clipping path
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r.add_mesh(box(), mat)
    masks = r._mesh_masks()
    assert not masks["needs_clip"]
    img_fast = r.render()

    # force the clipping variant through the frame entry point
    import jax.numpy as jnp
    from awsm_renderer_tpu.config import ToneMapping
    from awsm_renderer_tpu.passes.frame import render_frame

    ds = r._flush()
    ldr, _, _ = render_frame(
        ds, jnp.asarray(masks["opaque"]),
        width=W, height=H, supersample=False, tonemap=ToneMapping.NONE,
        use_mips=True, has_morphs=False, skin_sets=0,
        slot_mask=r._slot_mask(), solid_env=True, needs_clip=True)
    np.testing.assert_allclose(np.asarray(ldr), img_fast, atol=1e-5)


def test_needs_clip_detected_for_ground_plane():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial())
    r.add_mesh(plane(200.0), mat, transform=Transform(
        translation=np.array([0, -0.5, 0], F)))
    assert r._mesh_masks()["needs_clip"]
