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


def test_maxrects_reuses_space_beside_tall_rect():
    """MaxRects (the reference's binpack2d BestAreaFit,
    mega_texture.rs:422): a tall rect does not waste the rest of the
    page — later small rects land in the remaining maximal free rects
    (best-AREA-fit picks the tightest leftover, here the thin strip
    above the tall rect first), all on ONE page, no overlaps."""
    t = Textures()
    mt = MegaTexture(t, page_size=128, padding=0)
    tall = mt.add_image(np.zeros((100, 20, 4), np.uint8))
    small = [mt.add_image(np.zeros((20, 20, 4), np.uint8)) for _ in range(3)]
    mt.finalize()
    assert (tall.x, tall.y) == (0, 0)
    assert len(mt._pages[TextureType.ALBEDO]) == 1
    rects = [(e.x, e.y, e.width, e.height) for e in mt.entries]
    for i, (x0, y0, w0, h0) in enumerate(rects):
        for x1, y1, w1, h1 in rects[i + 1:]:
            assert (x0 + w0 <= x1 or x1 + w1 <= x0
                    or y0 + h0 <= y1 or y1 + h1 <= y0), rects
    # best-area-fit fills the tight strip above the tall rect before
    # touching the big right region
    assert any(e.y >= 100 for e in small)


def test_maxrects_mixed_sizes_one_page():
    """Mixed-size set that overflows a shelf packer fits one page under
    MaxRects: sum of areas ~69% of the page."""
    t = Textures()
    mt = MegaTexture(t, page_size=256, padding=0)
    sizes = [(96, 96), (96, 32), (32, 96), (64, 64), (64, 16), (16, 64),
             (48, 48), (32, 32), (32, 32), (16, 16), (128, 32), (32, 128),
             (64, 32), (32, 64), (48, 32), (96, 16), (16, 96), (64, 48)]
    area = 0
    for w, h in sizes:
        mt.add_image(np.zeros((h, w, 4), np.uint8))
        area += w * h
    mt.finalize()
    assert area / (256 * 256) > 0.68, area / (256 * 256)
    assert len(mt._pages[TextureType.ALBEDO]) == 1
    # no two entries overlap
    rects = [(e.x, e.y, e.width, e.height) for e in mt.entries]
    for i, (x0, y0, w0, h0) in enumerate(rects):
        for x1, y1, w1, h1 in rects[i + 1:]:
            assert (x0 + w0 <= x1 or x1 + w1 <= x0
                    or y0 + h0 <= y1 or y1 + h1 <= y0), (i, rects)


def test_incremental_finalize_keeps_old_refs_valid():
    """Adding more images to a finalized page re-writes texels IN PLACE:
    earlier TextureRefs (already packed into materials) keep sampling the
    right texels."""
    import jax.numpy as jnp

    from awsm_renderer_tpu.ops.texsample import (
        apply_texture_transform, sample_texture,
    )

    t = Textures()
    mt = MegaTexture(t, page_size=64, padding=2)
    red = np.zeros((8, 8, 4), np.float32)
    red[..., 0] = red[..., 3] = 1.0
    e1 = mt.add_image(red)
    mt.finalize()
    ref1 = e1.texture_ref
    row_before = ref1.texture_id

    green = np.zeros((8, 8, 4), np.float32)
    green[..., 1] = green[..., 3] = 1.0
    e2 = mt.add_image(green)
    mt.finalize()
    assert e1.texture_ref.texture_id == row_before  # row is stable

    texels = jnp.asarray(t.texels_packed.astype(np.float32))
    descs = jnp.asarray(t.descriptors)
    transforms = jnp.asarray(t.tex_transforms)
    uv = jnp.array([[0.5, 0.5]], jnp.float32)
    for e, ch in ((e1, 0), (e2, 1)):
        uv2 = apply_texture_transform(
            transforms, jnp.array([e.texture_ref.transform_id]), uv)
        out = sample_texture(texels, descs,
                             jnp.array([e.texture_ref.texture_id]), uv2)
        assert float(out[0, ch]) > 0.9, (ch, np.asarray(out))
