"""KTX2 parsing tests (reference: cubemap/ktx.rs)."""

import numpy as np
import pytest

from awsm_renderer_tpu.gltf.ktx2 import (
    VK_B10G11R11_UFLOAT, VK_R8G8B8A8_UNORM, VK_R32G32B32A32_SFLOAT,
    Ktx2Image, _decode_pixels, load_ktx2, write_ktx2,
)

F = np.float32


def test_roundtrip_2d():
    img = np.random.default_rng(0).random((8, 16, 4)).astype(F)
    blob = write_ktx2([[img]], VK_R32G32B32A32_SFLOAT)
    back = load_ktx2(blob)
    assert back.width == 16 and back.height == 8 and back.faces == 1
    np.testing.assert_allclose(back.levels[0][0], img, atol=1e-6)


def test_roundtrip_cubemap_with_mips():
    rng = np.random.default_rng(1)
    lv0 = [rng.random((8, 8, 4)).astype(F) for _ in range(6)]
    lv1 = [rng.random((4, 4, 4)).astype(F) for _ in range(6)]
    blob = write_ktx2([lv0, lv1], VK_R8G8B8A8_UNORM)
    back = load_ktx2(blob)
    assert back.is_cubemap and len(back.levels) == 2
    faces = back.cubemap_faces(0)
    assert faces.shape == (6, 8, 8, 4)
    np.testing.assert_allclose(faces, np.stack(lv0), atol=1 / 255)
    np.testing.assert_allclose(back.cubemap_faces(1), np.stack(lv1), atol=1 / 255)


def test_b10g11r11_decode():
    # encode 1.0 in 11-bit float: e=15, m=0 -> bits = 15<<6 = 960
    # and in 10-bit: e=15, m=0 -> 15<<5 = 480
    word = np.uint32(960 | (960 << 11) | (480 << 22))
    data = np.array([word], np.uint32).tobytes()
    out = _decode_pixels(data, VK_B10G11R11_UFLOAT, 1, 1)
    np.testing.assert_allclose(out[0, 0], [1, 1, 1, 1], atol=1e-6)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        load_ktx2(b"not a ktx2 file at all....")


def test_environment_from_ktx2_cubemap():
    from awsm_renderer_tpu.core.environment import Environment

    faces = [np.full((8, 8, 4), 0.25, F) for _ in range(6)]
    blob = write_ktx2([faces], VK_R32G32B32A32_SFLOAT)
    img = load_ktx2(blob)
    env = Environment()
    env.set_skybox_cubemap(img.cubemap_faces(0))
    assert not env.is_solid
    np.testing.assert_allclose(env.skybox[0, 0, 0, 0], 0.25)


def test_ibl_from_ktx2_prefiltered_chain_end_to_end():
    """Pre-baked KTX2 prefiltered chain + irradiance drive IBL in a
    rendered frame (reference path: lights/ibl.rs new_ktx)."""
    from awsm_renderer_tpu import AwsmRendererTpu, PbrMaterial, RendererConfig, Transform
    from awsm_renderer_tpu.core.environment import (
        IRRADIANCE_SIZE, N_SPEC_MIPS, SPEC_SIZE,
    )
    from awsm_renderer_tpu.geometry import uv_sphere
    from awsm_renderer_tpu.utils import math3d as m3

    rng = np.random.default_rng(7)
    # mip ladder: increasingly dim so roughness visibly picks levels
    levels = []
    s = 16
    for m in range(4):
        val = 1.0 / (m + 1)
        levels.append([np.full((s, s, 4), val, F) for _ in range(6)])
        s //= 2
    pre_blob = write_ktx2(levels, VK_R32G32B32A32_SFLOAT)
    irr_blob = write_ktx2(
        [[np.full((8, 8, 4), 0.5, F) for _ in range(6)]],
        VK_R32G32B32A32_SFLOAT)

    r = AwsmRendererTpu(RendererConfig(width=64, height=32))
    r.environment.set_ibl_from_ktx2(pre_blob, irr_blob)
    assert not r.environment.is_solid
    assert r.environment.prefiltered.shape == (
        N_SPEC_MIPS, 6, SPEC_SIZE, SPEC_SIZE, 4)
    assert r.environment.irradiance.shape == (
        6, IRRADIANCE_SIZE, IRRADIANCE_SIZE, 4)
    # level m resampled from the ladder: constant value survives resize
    np.testing.assert_allclose(r.environment.prefiltered[0, 0, 0, 0, 0], 1.0)
    np.testing.assert_allclose(r.environment.prefiltered[3, 0, 0, 0, 0], 0.25)
    np.testing.assert_allclose(r.environment.irradiance[0, 0, 0, 0], 0.5)

    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([1, 1, 1, 1], np.float32),
        metallic_factor=1.0, roughness_factor=0.1))
    r.add_mesh(uv_sphere(0.8), mat, transform=Transform())
    view = m3.look_at([0, 0, 2.5], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, 2.0, 0.1, 50.0)
    r.camera.update(view, proj)
    img = r.render()
    assert np.isfinite(img).all()
    # a metallic sphere lit purely by the bright prefiltered env reflects it
    assert img[16, 32, :3].mean() > 0.05


def test_skybox_from_ktx2():
    faces = [np.full((8, 8, 4), [0.1, 0.4, 0.9, 1.0], F) for _ in range(6)]
    blob = write_ktx2([faces], VK_R32G32B32A32_SFLOAT)
    from awsm_renderer_tpu.core.environment import Environment

    env = Environment()
    env.set_skybox_from_ktx2(blob)
    assert not env.is_solid
    np.testing.assert_allclose(env.skybox[0, 0, 0], [0.1, 0.4, 0.9, 1.0],
                               atol=1e-6)


def test_set_environment_from_ktx2_synthesizes_ibl_when_absent():
    faces = [np.full((8, 8, 4), 0.3, F) for _ in range(6)]
    blob = write_ktx2([faces], VK_R32G32B32A32_SFLOAT)
    from awsm_renderer_tpu.core.environment import Environment

    env = Environment()
    env.set_environment_from_ktx2(blob)
    assert not env.is_solid
    # IBL synthesized from the skybox: constant env stays ~constant
    np.testing.assert_allclose(env.prefiltered[0, 0, 4, 4, 0], 0.3, atol=0.02)


def test_non_cubemap_rejected_for_ibl():
    img = np.random.default_rng(0).random((8, 8, 4)).astype(F)
    blob = write_ktx2([[img]], VK_R32G32B32A32_SFLOAT)
    from awsm_renderer_tpu.core.environment import Environment

    env = Environment()
    with pytest.raises(ValueError, match="cubemap"):
        env.set_ibl_from_ktx2(blob)
