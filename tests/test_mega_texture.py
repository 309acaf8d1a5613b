"""MegaTexture atlas tests (reference: mega_texture.rs)."""

import numpy as np

from awsm_renderer_tpu.core.mega_texture import MegaTexture, TextureType
from awsm_renderer_tpu.core.textures import Textures


def test_pack_and_resolve():
    t = Textures()
    mt = MegaTexture(t, page_size=128, padding=2)
    imgs = [np.full((h, w, 4), (i + 1) * 30, np.uint8)
            for i, (w, h) in enumerate([(32, 32), (48, 16), (64, 64), (16, 16)])]
    entries = [mt.add_image(img) for img in imgs]
    mt.finalize()
    for e in entries:
        assert e.texture_ref is not None
        assert e.texture_ref.transform_id >= 0
    # one page suffices
    assert len(mt._pages[TextureType.ALBEDO]) == 1
    # transforms map into [0,1] sub-rects
    row = entries[0].texture_ref.transform_id
    tr = t.tex_transforms[row]
    assert 0 < tr[0] < 1 and 0 < tr[3] < 1   # scale
    assert tr[6] == 1.0                       # wrap-first flag


def test_page_growth():
    t = Textures()
    mt = MegaTexture(t, page_size=64, padding=2)
    for _ in range(5):
        mt.add_image(np.zeros((40, 40, 4), np.uint8))
    mt.finalize()
    assert len(mt._pages[TextureType.ALBEDO]) == 5  # 44x44 padded, 1/page
    rep = mt.report()
    assert len(rep["albedo"]) == 5
    assert 0 < rep["albedo"][0]["occupancy"] <= 1


def test_types_segregated():
    t = Textures()
    mt = MegaTexture(t, page_size=128)
    mt.add_image(np.zeros((16, 16, 4), np.uint8), TextureType.ALBEDO)
    mt.add_image(np.full((16, 16, 4), 128, np.uint8), TextureType.NORMAL)
    mt.finalize()
    assert TextureType.ALBEDO in mt._pages and TextureType.NORMAL in mt._pages


def test_entry_samples_correct_texels():
    import jax.numpy as jnp

    from awsm_renderer_tpu.ops.texsample import apply_texture_transform, sample_texture

    t = Textures()
    mt = MegaTexture(t, page_size=64, padding=2)
    red = np.zeros((8, 8, 4), np.float32)
    red[..., 0] = 1.0
    red[..., 3] = 1.0
    blue = np.zeros((8, 8, 4), np.float32)
    blue[..., 2] = 1.0
    blue[..., 3] = 1.0
    e1 = mt.add_image(red)
    e2 = mt.add_image(blue)
    mt.finalize()
    texels = jnp.asarray(t.texels_packed)
    descs = jnp.asarray(t.descriptors)
    transforms = jnp.asarray(t.tex_transforms)
    uv = jnp.array([[0.5, 0.5]], jnp.float32)
    for e, ch in ((e1, 0), (e2, 2)):
        uv2 = apply_texture_transform(
            transforms, jnp.array([e.texture_ref.transform_id]), uv)
        out = sample_texture(texels, descs, jnp.array([e.texture_ref.texture_id]), uv2)
        assert float(out[0, ch]) > 0.9, (ch, np.asarray(out))
    # wrap: uv outside [0,1] stays inside the entry
    uv3 = apply_texture_transform(
        transforms, jnp.array([e1.texture_ref.transform_id]),
        jnp.array([[1.5, -0.5]], jnp.float32))
    out = sample_texture(texels, descs, jnp.array([e1.texture_ref.texture_id]), uv3)
    assert float(out[0, 0]) > 0.9


class TestRendererIntegration:
    """MegaTexture end-to-end: atlas entries drive real material texture
    slots through the renderer's public API (no island code)."""

    def _scene(self):
        import numpy as np

        from awsm_renderer_tpu import (
            AwsmRendererTpu, RendererConfig, Transform, UnlitMaterial,
        )
        from awsm_renderer_tpu.core.materials import TS_BASE_COLOR
        from awsm_renderer_tpu.core.mega_texture import TextureType
        from awsm_renderer_tpu.geometry import plane
        from awsm_renderer_tpu.utils import math3d as m3

        F = np.float32
        r = AwsmRendererTpu(RendererConfig(width=128, height=64))
        red = np.zeros((16, 16, 4), F)
        red[..., 0] = 1.0
        red[..., 3] = 1.0
        green = np.zeros((24, 24, 4), F)
        green[..., 1] = 1.0
        green[..., 3] = 1.0
        ref_r = r.add_atlas_image(red, TextureType.ALBEDO)
        ref_g = r.add_atlas_image(green, TextureType.ALBEDO)
        # both entries share one atlas page texture
        assert ref_r.texture_id == ref_g.texture_id
        assert ref_r.transform_id != ref_g.transform_id
        for ref, x in ((ref_r, -1.1), (ref_g, 1.1)):
            mat = r.materials.insert(UnlitMaterial(
                base_color_factor=np.ones(4, F),
                textures={TS_BASE_COLOR: ref}))
            r.add_mesh(plane(2.0), mat, transform=Transform(
                translation=np.array([x, 0, 0], F),
                rotation=m3.quat_from_axis_angle([1, 0, 0], np.pi / 2)))
        view = m3.look_at([0, 0, 3.2], [0, 0, 0], [0, 1, 0])
        r.camera.update(view, m3.perspective(np.pi / 3, 2.0, 0.1, 100.0))
        return r

    def test_atlas_entries_render_distinct(self):
        import numpy as np

        r = self._scene()
        img = r.render()
        left = img[32, 32, :3]
        right = img[32, 96, :3]
        assert left[0] > 0.5 and left[1] < 0.3, left    # red quad
        assert right[1] > 0.5 and right[0] < 0.3, right  # green quad

    def test_report_occupancy(self):
        r = self._scene()
        rep = r.mega_texture.report()
        assert "albedo" in rep
        page = rep["albedo"][0]
        assert page["entries"] == 2
        assert 0.0 < page["occupancy"] < 0.1
