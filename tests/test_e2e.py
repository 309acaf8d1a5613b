"""End-to-end pipeline tests: scene → vertex → raster → shade → display.

The analog of the reference's golden-model probes (SURVEY §4: glTF sample
catalog as progressive feature tests) on procedural stand-in assets.
Small resolutions keep interpret-mode Pallas tractable on CPU.
"""

import numpy as np

from awsm_renderer_tpu import (
    AntiAliasing, AwsmRendererTpu, Light, PbrMaterial, PostProcessing,
    RendererConfig, ToneMapping, Transform, UnlitMaterial,
)
from awsm_renderer_tpu.geometry import box, checker_texture, triangle
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 32


def make_renderer(**cfg_kw):
    cfg_kw.setdefault("width", W)
    cfg_kw.setdefault("height", H)
    cfg_kw.setdefault("post_processing", PostProcessing(tonemapping=ToneMapping.NONE))
    r = AwsmRendererTpu(RendererConfig(**cfg_kw))
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def test_empty_scene_is_skybox():
    r = make_renderer()
    img = r.render()
    assert img.shape == (H, W, 4)
    # skybox default color everywhere (sRGB-encoded 0.1..0.12 linear)
    assert np.all(img[..., :3] > 0.05) and np.all(img[..., :3] < 0.5)
    assert np.std(img[..., 0]) < 1e-5


def test_unlit_box_center_colored():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    r.add_mesh(box(), mat)
    img = r.render()
    c = img[H // 2, W // 2]
    np.testing.assert_allclose(c[:3], [1, 0, 0], atol=1e-5)  # unlit red, no tonemap
    # corners show skybox
    assert abs(img[0, 0, 0] - img[0, 0, 2]) < 0.05


def test_pick_center_returns_mesh():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial())
    key = r.add_mesh(box(), mat)
    r.render()
    assert r.pick(W // 2, H // 2) == key
    assert r.pick(2, 2) is None


def test_pick_is_never_stale():
    """Reference picking is an any-time dispatch against the CURRENT
    scene (picker.rs:56-115). Mutating the scene after a render must not
    let pick() answer from the stale cached tri_id plane — and picking
    before the first render must work rather than return None."""
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial())
    key = r.add_mesh(box(), mat)
    # pick BEFORE any render: must render on demand, not return None
    assert r.pick(W // 2, H // 2) == key
    # move the box far off-screen: the center pick must notice
    tk = r.meshes.get(key).transform_key
    r.transforms.set_translation(tk, np.array([100.0, 0.0, 0.0], np.float32))
    r.transforms.update_world()
    r.meshes.update_world(r.transforms, {tk})
    assert r.pick(W // 2, H // 2) is None
    # move it back: picked again, no explicit render() call in between
    r.transforms.set_translation(tk, np.array([0.0, 0.0, 0.0], np.float32))
    r.transforms.update_world()
    r.meshes.update_world(r.transforms, {tk})
    assert r.pick(W // 2, H // 2) == key


def test_pbr_box_lit_vs_unlit_side():
    r = make_renderer()
    r.environment.prefiltered *= 0.0
    r.environment.irradiance *= 0.0
    r.environment.gpu_dirty = True
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([1, 1, 1, 1], np.float32),
        metallic_factor=0.0, roughness_factor=1.0,
    ))
    r.add_mesh(box(), mat)
    r.lights.insert(Light.directional([0, 0, -1], intensity=3.0))
    img = r.render()
    center = img[H // 2, W // 2, :3]
    assert np.all(center > 0.15), f"lit face too dark: {center}"


def test_depth_occlusion_between_meshes():
    r = make_renderer()
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    blue = r.materials.insert(UnlitMaterial(base_color_factor=np.array([0, 0, 1, 1], np.float32)))
    r.add_mesh(box(), red)  # at origin
    r.add_mesh(box(0.5), blue, transform=Transform(translation=np.array([0, 0, 1.2], np.float32)))
    img = r.render()
    c = img[H // 2, W // 2]
    np.testing.assert_allclose(c[:3], [0, 0, 1], atol=1e-5)  # closer blue wins


def test_frustum_cull_hides_offscreen():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    r.add_mesh(box(), mat, transform=Transform(translation=np.array([100, 0, 0], np.float32)))
    masks = r._mesh_masks()
    assert not masks["opaque"].any()


def test_hidden_mesh_not_rendered():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    key = r.add_mesh(box(), mat)
    r.meshes.set_hidden(key, True)
    img = r.render()
    assert img[H // 2, W // 2, 0] < 0.5  # skybox, not red


def test_textured_box():
    r = make_renderer()
    tex = r.textures.add_image(checker_texture(32, 4), srgb=True)
    from awsm_renderer_tpu.core.materials import TS_BASE_COLOR, TextureRef
    mat = r.materials.insert(UnlitMaterial(textures={TS_BASE_COLOR: TextureRef(r.textures.row_of(tex))}))
    r.add_mesh(box(1.5), mat)
    img = r.render()
    # checkerboard: center row should contain both light and dark texels
    row = img[H // 2, W // 4 : 3 * W // 4, 0]
    assert row.max() > 0.8 and row.min() < 0.3


def test_transform_moves_mesh():
    r = make_renderer()
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    tk = r.transforms.insert()
    r.transforms.update_world()
    r.add_mesh(box(0.8), mat, transform_key=tk)
    img1 = r.render()
    assert img1[H // 2, W // 2, 0] > 0.9
    r.transforms.set_translation(tk, [0, 10, 0])
    r.update_all(0.0)
    img2 = r.render()
    assert img2[H // 2, W // 2, 0] < 0.5  # moved away


def test_tonemap_modes_run():
    for tm in (ToneMapping.ACES, ToneMapping.KHRONOS_PBR_NEUTRAL):
        r = make_renderer(post_processing=PostProcessing(tonemapping=tm))
        mat = r.materials.insert(UnlitMaterial())
        r.add_mesh(box(), mat)
        img = r.render()
        assert np.isfinite(img).all() and img.max() <= 1.0


def test_supersample_resolve():
    r = make_renderer(anti_aliasing=AntiAliasing(supersample=True))
    mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], np.float32)))
    r.add_mesh(triangle(), mat, transform=Transform(translation=np.array([-0.5, -0.5, 0], np.float32)))
    img = r.render()
    assert img.shape == (H, W, 4)
    # supersampling produces edge pixels with partial coverage
    reds = img[..., 0]
    partial = (reds > 0.2) & (reds < 0.9)
    assert partial.sum() > 0


def test_msaa_resolve():
    """MSAA mode: per-sample coverage blend at edges, exact per-pixel
    shading in the interior (anti_alias.rs msaa_sample_count=4 analog)."""
    def scene(aa):
        r = make_renderer(anti_aliasing=aa)
        mat = r.materials.insert(UnlitMaterial(
            base_color_factor=np.array([1, 0, 0, 1], np.float32)))
        r.add_mesh(triangle(), mat, transform=Transform(
            translation=np.array([-0.5, -0.5, 0], np.float32)))
        return r.render()

    img = scene(AntiAliasing(msaa=True))
    assert img.shape == (H, W, 4)
    reds = img[..., 0]
    partial = (reds > 0.2) & (reds < 0.9)
    assert partial.sum() > 0
    # deep-interior pixels (own pixel and every neighbor fully covered →
    # all 4 samples agree) shade identically to no-AA; pixels whose
    # centers are in but with a silhouette inside their footprint blend
    # — that difference IS the anti-aliasing
    full = base = scene(AntiAliasing())
    full = base[..., 0] > 0.99
    interior = full.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            interior &= np.roll(full, (dy, dx), axis=(0, 1))
    assert interior.sum() > 10
    np.testing.assert_allclose(img[interior], base[interior], atol=1e-5)


def test_animated_subset_vertex_split_is_exact():
    """The animated-subset vertex split (r4: only triangles of meshes
    with morphs/skins pay the morph/skin vertex gathers) must be an
    exact optimization: same image with and without the subset path."""
    from awsm_renderer_tpu.core.meshes import MeshGeometry

    def build():
        r = make_renderer()
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.7, 0.5, 0.3, 1], np.float32),
            roughness_factor=0.6))
        r.add_mesh(box(0.6), mat, transform=Transform(
            translation=np.array([-0.8, 0, 0], np.float32)))
        g = box(0.5)
        V = g.positions.shape[0]
        bulge = (g.positions * 0.5).reshape(1, V, 3).astype(np.float32)
        geo = MeshGeometry(positions=g.positions, indices=g.indices,
                           normals=g.normals, uv0=g.uv0,
                           morph_positions=bulge,
                           morph_normals=np.zeros((1, V, 3), np.float32))
        r.add_mesh(geo, mat, transform=Transform(
            translation=np.array([0.8, 0, 0], np.float32)),
            initial_morph_weights=np.array([0.7], np.float32))
        r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
        return r

    r1 = build()
    assert r1._anim_tri_idx() is None or True  # device layout not flushed yet
    img_split = r1.render()
    assert "anim_tri_idx" in r1._device, "split path did not engage"

    r2 = build()
    # force the global morph path: pretend an instanced group is animated
    r2._anim_tri_idx = lambda: None
    img_global = r2.render()
    assert "anim_tri_idx" not in r2._device
    np.testing.assert_allclose(img_split, img_global, atol=1e-6)
    # the morphing box must actually be displaced (weights applied)
    r3 = build()
    r3.meshes.update_morph_weights(
        list(r3.meshes._meshes)[1], np.array([0.0], np.float32))
    img_zero = r3.render()
    assert np.abs(img_split - img_zero).max() > 0.05


def test_animated_split_pads_do_not_clobber_last_pool_row():
    """Regression (r4 review): JAX wraps negative scatter indices BEFORE
    the drop-mode bounds check, so the animated-subset overwrite's -1
    pads would silently clobber the LAST pool setup row whenever the
    device pool has no dead tail. Build exactly that pool shape — every
    mesh 16 triangles (the raster group size) filling the pool bucket —
    and assert the last mesh still renders identically to the
    global-path frame."""
    from awsm_renderer_tpu.core.meshes import MeshGeometry

    def strip16(z=0.0):
        # 8-quad strip = 16 triangles, spanning x in [-1, 1]
        xs = np.linspace(-1.0, 1.0, 9, dtype=np.float32)
        pos = np.array([[x, y, z] for x in xs for y in (-0.12, 0.12)],
                       np.float32)
        idx = []
        for i in range(8):
            v = i * 2
            idx += [v, v + 2, v + 3, v, v + 3, v + 1]
        return pos, np.asarray(idx, np.int32)

    def build():
        import functools

        from awsm_renderer_tpu.core.meshes import Meshes

        r = make_renderer()
        # 16-row upload bucket: the device pool then holds EXACTLY the
        # live grouped rows with no dead tail (the default 32k bucket
        # pads small scenes with dead rows that masked the wrap)
        r.meshes.device_updates = functools.partial(
            Meshes.device_updates, r.meshes, bucket=16)
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.8, 0.3, 0.2, 1], np.float32)))
        # animated (morphing) strip FIRST, then static strips; the LAST
        # mesh occupies the final pool rows that a wrapped -1 would hit
        pos, idx = strip16()
        V = pos.shape[0]
        geo = MeshGeometry(
            positions=pos, indices=idx,
            morph_positions=np.tile(np.array([0, 0.1, 0], np.float32),
                                    (1, V, 1)),
            morph_normals=np.zeros((1, V, 3), np.float32))
        r.add_mesh(geo, mat, Transform(
            translation=np.array([0, 0.45, 0], np.float32)),
            initial_morph_weights=np.array([1.0], np.float32))
        for y in (0.15, -0.15, -0.45):
            p2, i2 = strip16()
            r.add_mesh(MeshGeometry(positions=p2, indices=i2), mat,
                       Transform(translation=np.array([0, y, 0],
                                                      np.float32)))
        r.lights.insert(Light.directional([-0.3, -1, -0.4], intensity=2.0))
        return r

    r1 = build()
    img_split = r1.render()
    assert "anim_tri_idx" in r1._device
    # the pool really has no dead tail: every row is live
    import numpy as _np
    assert (_np.asarray(r1._tri_mesh_device_order) >= 0).all(), \
        "scene must fill the pool bucket exactly to exercise the bug"
    r2 = build()
    r2._anim_tri_idx = lambda: None
    img_global = r2.render()
    np.testing.assert_allclose(img_split, img_global, atol=1e-6)
