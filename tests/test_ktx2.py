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
