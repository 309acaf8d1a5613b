"""Alpha MASK mode: routed through the transparent pass with cutoff discard
(reference: gltf/buffers/mesh.rs:43 Mask -> Transparency kind)."""

import numpy as np

from awsm_renderer_tpu import (
    AlphaMode, AwsmRendererTpu, PostProcessing, RendererConfig, ToneMapping,
    Transform, UnlitMaterial,
)
from awsm_renderer_tpu.core.materials import TS_BASE_COLOR, TextureRef
from awsm_renderer_tpu.geometry import box, plane
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 32
F = np.float32


def test_mask_cutout():
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    r.camera.update(view, m3.perspective(np.pi / 3, W / H, 0.1, 100.0))

    # texture: left half transparent (a=0), right half opaque green
    img = np.zeros((8, 8, 4), np.uint8)
    img[:, 4:] = [0, 255, 0, 255]
    tex = r.textures.add_image(img, srgb=True, generate_mips=False)
    mat = r.materials.insert(UnlitMaterial(
        alpha_mode=AlphaMode.MASK, alpha_cutoff=0.5,
        textures={TS_BASE_COLOR: TextureRef(r.textures.row_of(tex))}))
    assert r.materials.is_transparency_pass(mat)

    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r.add_mesh(box(4.0), red, transform=Transform(translation=np.array([0, 0, -3], F)))
    # masked quad facing the camera
    r.add_mesh(plane(1.8), mat, transform=Transform(
        rotation=m3.quat_from_axis_angle([1, 0, 0], np.pi / 2)))

    out = r.render()
    # right half of quad: green (alpha=1); left half: red box shows through
    # (quad is ~16 px wide at this camera: cols ~56..72)
    right = out[H // 2, W // 2 + 4]
    left = out[H // 2, W // 2 - 4]
    assert right[1] > 0.8 and right[0] < 0.2, f"right={right}"
    assert left[0] > 0.8 and left[1] < 0.2, f"left={left}"


def test_mask_passing_texels_fully_opaque():
    # MASK with alpha above cutoff renders with alpha exactly 1 (no blend)
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    r.camera.update(view, m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    mat = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0, 0, 1, 0.7], F),  # a=0.7 >= 0.5 cutoff
        alpha_mode=AlphaMode.MASK, alpha_cutoff=0.5))
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r.add_mesh(box(3.0), red, transform=Transform(translation=np.array([0, 0, -2], F)))
    r.add_mesh(box(0.8), mat)
    out = r.render()
    c = out[H // 2, W // 2]
    np.testing.assert_allclose(c[:3], [0, 0, 1], atol=1e-4)  # NOT blended with red
