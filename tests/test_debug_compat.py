"""Debug shading variants + compatibility check."""

import numpy as np

from awsm_renderer_tpu import (
    AwsmRendererTpu, Light, PbrMaterial, PostProcessing, RendererConfig, ToneMapping,
)
from awsm_renderer_tpu.geometry import uv_sphere
from awsm_renderer_tpu.utils import math3d as m3
from awsm_renderer_tpu.utils.compatibility import check_compatibility

W, H = 128, 32
F = np.float32


def _scene():
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([1, 1, 1, 1], F), roughness_factor=0.6))
    r.add_mesh(uv_sphere(0.7), mat)
    r.lights.insert(Light.directional([0, 0, -1], intensity=3.0))
    r.camera.update(m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    return r


def test_debug_normals_view():
    r = _scene()
    img = r.render(debug_mode="normals")
    c = img[H // 2, W // 2, :3]
    # sphere front face normal ~ +z -> encoded ~(0.5, 0.5, 1.0) pre-sRGB
    assert c[2] > c[0] and c[2] > 0.8


def test_debug_lighting_isolation():
    r = _scene()
    full = r.render()
    ibl = r.render(debug_mode="ibl")
    punc = r.render(debug_mode="punctual")
    m = (H // 2, W // 2)
    # isolations differ from the full render and from each other
    assert not np.allclose(ibl[m], punc[m], atol=0.01)
    assert full[m][0] >= max(ibl[m][0], punc[m][0]) - 0.3


def test_debug_material_bitmask():
    """Per-material debug bits (reference PbrMaterialDebug,
    pbr.rs:53-77): a BASE_COLOR-masked material renders its flat base
    color regardless of lighting; an unmasked material in the same scene
    shades normally; lowest set bit wins."""
    from awsm_renderer_tpu import PbrDebug, Transform
    from awsm_renderer_tpu.geometry import box

    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H,
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    dbg_mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.2, 0.5, 0.8, 1], F),
        roughness_factor=0.6, debug_mask=int(PbrDebug.BASE_COLOR)))
    lit_mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.2, 0.5, 0.8, 1], F),
        roughness_factor=0.6))
    r.add_mesh(box(0.8), dbg_mat, Transform(translation=np.array([-0.8, 0, 0], F)))
    r.add_mesh(box(0.8), lit_mat, Transform(translation=np.array([0.8, 0, 0], F)))
    r.lights.insert(Light.directional([0.4, -0.3, -1], intensity=3.0))
    r.camera.update(m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    img = r.render()
    # display applies linear->sRGB even with tonemapping NONE
    lin = np.array([0.2, 0.5, 0.8])
    srgb = np.where(lin <= 0.0031308, lin * 12.92,
                    1.055 * lin ** (1 / 2.4) - 0.055)
    # aspect 4:1 view half-width at z=3 is ~6.9 world units: the boxes at
    # x = ±0.8 project ~7 px either side of center
    dbg_px = img[H // 2, W // 2 - 7, :3]
    lit_px = img[H // 2, W // 2 + 7, :3]
    np.testing.assert_allclose(dbg_px, srgb, atol=0.02)
    assert not np.allclose(lit_px, srgb, atol=0.02)  # actually shaded

    # normals bit: same geometry shows the +z face encoding ~(.5,.5,1)
    r.materials.update(dbg_mat, PbrMaterial(
        base_color_factor=np.array([0.2, 0.5, 0.8, 1], F),
        roughness_factor=0.6, debug_mask=int(PbrDebug.NORMALS)))
    img2 = r.render()
    c = img2[H // 2, W // 2 - 7, :3]
    assert c[2] > 0.9 and abs(c[0] - c[1]) < 0.05


def test_compatibility_report():
    r = _scene()
    rep = check_compatibility(r)
    assert rep.ok
    assert rep.scene_bytes > 0 and rep.framebuffer_bytes > 0


def test_runtime_setters_and_remove_all():
    from awsm_renderer_tpu import AntiAliasing

    r = _scene()
    r.render()
    r.set_anti_aliasing(AntiAliasing(smaa=True))
    assert r.config.anti_aliasing.smaa
    img = r.render()
    assert np.isfinite(img).all()
    r.remove_all()
    assert r.meshes.count == 0
    img2 = r.render()  # empty scene renders uniform skybox
    assert img2[..., 0].std() < 1e-4 and img2[..., 0].mean() > 0.1


def test_warmup_compiles_variants_and_retrace_note():
    """warmup() pre-compiles config variants (reference: shaders.rs
    async template compilation at init); a static-arg flip afterwards
    emits a 'retrace: ...' note via RenderTimings (VERDICT r2 item 8)."""
    import numpy as np

    from awsm_renderer_tpu import (
        AwsmRendererTpu, PbrMaterial, PostProcessing, RendererConfig,
    )
    from awsm_renderer_tpu.errors import ConfigError
    from awsm_renderer_tpu.geometry import box
    from awsm_renderer_tpu.utils import math3d as m3

    r = AwsmRendererTpu(RendererConfig(width=128, height=32))
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.8, 0.2, 0.2, 1], np.float32)))
    r.add_mesh(box(), mat)
    r.camera.update(m3.look_at([0, 0.5, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, 4.0, 0.1, 100.0))

    n = r.warmup([{"bloom": True}])
    assert n == 2
    assert r.config.post_processing.bloom is False  # config restored

    # flip a static arg -> next frame notes the retrace (compile itself
    # is already warmed, so only the note proves the detection)
    r.timings.enabled = True
    r.render_device()
    r.timings.frames.clear()
    r.set_post_processing(PostProcessing(bloom=True))
    r.render_device()
    keys = [k for f in r.timings.frames for k in f]
    assert any(k.startswith("retrace:") and "bloom" in k for k in keys), keys
    # steady state: no retrace note
    r.timings.frames.clear()
    r.render_device()
    keys = [k for f in r.timings.frames for k in f]
    assert not any(k.startswith("retrace:") for k in keys), keys

    import pytest
    with pytest.raises(ConfigError):
        r.warmup([{"not_a_field": 1}])


def test_debug_channel_isolation():
    """Global channel views ("channel:<name>") replace shading with the
    named material channel for every surface (reference sidebar material
    debug, materials/pbr.rs:54-79 bitmask — here scene-wide)."""
    from awsm_renderer_tpu.core.textures import linear_to_srgb

    r = _scene()
    base = r.render(debug_mode="channel:basecolor")
    c = base[H // 2, W // 2, :3]
    np.testing.assert_allclose(c, [1, 1, 1], atol=0.02)  # white base color
    mr = r.render(debug_mode="channel:metallicroughness")
    c = mr[H // 2, W // 2, :3]
    # display encodes sRGB: G = srgb(roughness 0.6), B = srgb(0) = 0
    assert abs(c[1] - linear_to_srgb(np.float32(0.6))) < 0.05
    assert c[2] < 0.02
    nrm = r.render(debug_mode="channel:normals")
    assert nrm[H // 2, W // 2, 2] > 0.8                  # front face ~ +z
    em = r.render(debug_mode="channel:emissive")
    assert em[H // 2, W // 2, :3].max() < 0.02           # no emissive set


def test_debug_edges_view():
    """MSAA edge view: white where a pixel's 4 coverage samples disagree
    on the winner triangle (silhouettes AND interior mesh edges — the
    per-sample resolve works exactly there), dim gray on agreeing
    coverage, black on miss; requires msaa. A box's large flat faces
    keep the interior sample-stable so the view separates cleanly."""
    from awsm_renderer_tpu import AntiAliasing
    from awsm_renderer_tpu.errors import ConfigError
    from awsm_renderer_tpu.geometry import box
    import pytest

    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H,
        anti_aliasing=AntiAliasing(msaa=True),
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    mat = r.materials.insert(PbrMaterial())
    r.add_mesh(box(0.8), mat)
    r.camera.update(m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    img = r.render(debug_mode="edges")
    lum = img[..., 0]
    assert (lum > 0.9).sum() > 5           # edge pixels lit
    assert (lum > 0.9).mean() < 0.2        # but only a sparse set
    # face interior is the dim coverage gray, not white
    assert 0.05 < lum[H // 2, W // 2] < 0.5
    # corners are miss = black
    assert lum[1, 1] < 0.02
    # without msaa the mode is a config error
    r2 = _scene()
    with pytest.raises(ConfigError):
        r2.render(debug_mode="edges")
