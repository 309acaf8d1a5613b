"""Covered-tile-compacted transparent shade == band-wide transparent shade.

The compaction (ops/shade.py shade_transparent_layers_c tile_cap) must be
an exact optimization: same peel planes, same per-pixel shading math (NDC
coords and uv gradients ride as planes), same composite — only restricted
to the tiles transparent geometry can touch. Reference behavior: the
forward transparent pass simply has no fragments outside its draws
(render.rs transparent pass), so pixels there keep the opaque result.
"""

import numpy as np
import pytest

from awsm_renderer_tpu import (
    AlphaMode, AwsmRendererTpu, Light, PbrMaterial, PostProcessing,
    RendererConfig, ToneMapping, Transform, UnlitMaterial,
)
from awsm_renderer_tpu.config import ToneMapping as TM
from awsm_renderer_tpu.geometry import box, checker_texture, triangle
from awsm_renderer_tpu.passes.frame import render_frame
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32
W, H = 256, 64  # 16 raster tiles (8 rows x 2 cols of 8x128)


def _scene(pbr_glass: bool):
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H,
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    red = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([1, 0.2, 0.1, 1], F)))
    if pbr_glass:
        from awsm_renderer_tpu.core.materials import TS_BASE_COLOR, TextureRef

        tex = r.textures.add_image(
            checker_texture(32, 8, (40, 90, 220), (220, 220, 240)), srgb=True)
        glass1 = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.4, 0.6, 1.0, 0.5], F),
            alpha_mode=AlphaMode.BLEND, roughness_factor=0.2,
            metallic_factor=0.0,
            textures={TS_BASE_COLOR: TextureRef(r.textures.row_of(tex))}))
    else:
        glass1 = r.materials.insert(UnlitMaterial(
            base_color_factor=np.array([0, 0, 1, 0.5], F),
            alpha_mode=AlphaMode.BLEND))
    glass2 = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0, 1, 0, 0.4], F),
        alpha_mode=AlphaMode.BLEND))
    r.add_mesh(box(), red)
    tri = triangle()
    # two overlapping transparent layers in front (exercises the deep
    # cond path at K=4 via overlap at the shared region)
    r.add_mesh(tri, glass1, transform=Transform(
        translation=np.array([-0.5, -0.5, 0.8], F)))
    r.add_mesh(tri, glass2, transform=Transform(
        translation=np.array([-0.3, -0.4, 0.4], F)))
    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    view = m3.look_at([0, 0.2, 3], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def _frame(r, tile_cap):
    import jax.numpy as jnp

    ds = r._flush()
    masks = r._mesh_masks()
    ov_rows = r._bucket_mat_rows(masks["transparent"])
    return render_frame(
        ds,
        jnp.asarray(masks["opaque"]),
        jnp.asarray(masks["transparent"]),
        None,
        width=W, height=H, supersample=False,
        tonemap=TM.NONE, use_mips=True,
        has_morphs=False, skin_sets=0,
        has_transparent=True, n_transparent_layers=4,
        needs_clip=bool(masks["needs_clip"]),
        overlay_slot_mask=r._slot_mask(ov_rows),
        overlay_ext=r._ext_mask(ov_rows),
        overlay_tile_cap=tile_cap,
    )


@pytest.mark.slow
def test_compact_matches_band_unlit():
    r = _scene(pbr_glass=False)
    ldr_a, tid_a, _ = _frame(r, None)
    ldr_b, tid_b, _ = _frame(r, 15)  # < 16 tiles triggers compaction,
    #                                  >= covered tiles keeps it exact
    np.testing.assert_array_equal(np.asarray(tid_a), np.asarray(tid_b))
    np.testing.assert_allclose(np.asarray(ldr_a), np.asarray(ldr_b),
                               atol=1e-6)


@pytest.mark.slow
def test_compact_matches_band_pbr_textured():
    r = _scene(pbr_glass=True)
    ldr_a, _, _ = _frame(r, None)
    ldr_b, _, _ = _frame(r, 15)
    np.testing.assert_allclose(np.asarray(ldr_a), np.asarray(ldr_b),
                               atol=1e-6)


def test_overlay_tile_cap_bound_is_safe():
    """The host AABB bound must cover every 32x32 tile layer 0 actually
    touches (the cap drives the compacted PEEL grid, in 32x32 units)."""
    import jax.numpy as jnp

    from awsm_renderer_tpu.ops.raster import rasterize_layers_rows
    from awsm_renderer_tpu.passes.frame import _run_vertex, prep_setup_rows

    r = _scene(pbr_glass=False)
    masks = r._mesh_masks()
    cap = r._bucket_tile_cap(masks, "transparent", tile_h=32, tile_w=32)
    ds = r._flush()
    rows = prep_setup_rows(*_run_vertex(
        ds, jnp.asarray(masks["transparent"]), rw=W, rh_full=H,
        row_offset=0, shift_rows=False, has_morphs=False, skin_sets=0,
        needs_clip=bool(masks["needs_clip"])))
    layers = rasterize_layers_rows(
        rows, jnp.ones((H, W), np.float32), width=W, height=H,
        n_layers=2, interpret=True)
    tid0 = np.asarray(layers["tri_id"][0]).reshape(H // 32, 32, W // 32, 32)
    covered = int((tid0 >= 0).any(axis=(1, 3)).sum())
    assert covered > 0
    if cap is not None:
        assert cap >= covered


class TestStaticLayerClamp:
    """r4: provable static K clamp — verified-convex transparent meshes
    bound per-pixel depth complexity via a multiplicity-weighted
    rect-stab, and peels beyond the bound compile away (exact)."""

    def test_is_convex_classifier(self):
        from awsm_renderer_tpu.core.meshes import _is_convex
        from awsm_renderer_tpu.geometry import box, uv_sphere

        g = box(1.0)
        assert _is_convex(g.positions, g.indices)
        s = uv_sphere(0.5)
        assert _is_convex(s.positions, s.indices)
        # concave L-shape: two boxes sharing a face region
        b1 = box(1.0)
        b2 = box(1.0)
        p2 = b2.positions + np.array([0.9, 0.9, 0.0], np.float32)
        pos = np.concatenate([b1.positions, p2])
        idx = np.concatenate([b1.indices, b2.indices + b1.positions.shape[0]])
        assert not _is_convex(pos, idx)

    def _scene(self, offsets):
        import awsm_renderer_tpu.renderer as rmod
        from awsm_renderer_tpu import (
            AwsmRendererTpu, Light, PbrMaterial, PostProcessing,
            RendererConfig, Transform,
        )
        from awsm_renderer_tpu.config import ToneMapping
        from awsm_renderer_tpu.core.materials import AlphaMode
        from awsm_renderer_tpu.geometry import box
        from awsm_renderer_tpu.utils import math3d as m3

        r = AwsmRendererTpu(RendererConfig(
            width=128, height=64,
            post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
        opaque = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.6, 0.5, 0.4, 1], np.float32)))
        glass = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.3, 0.5, 0.9, 0.4], np.float32),
            alpha_mode=AlphaMode.BLEND, roughness_factor=0.2))
        r.add_mesh(box(0.5), opaque, Transform(
            translation=np.array([0, 0, -1.0], np.float32)))
        for off in offsets:
            r.add_mesh(box(0.4), glass, Transform(
                translation=np.asarray(off, np.float32)))
        r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
        view = m3.look_at([0, 0.4, 3.0], [0, 0, 0], [0, 1, 0])
        r.camera.update(view, m3.perspective(np.pi / 3, 2.0, 0.1, 50.0))
        return r

    def test_bound_separated_vs_stacked(self):
        r = self._scene([(-0.9, 0, 0), (0.9, 0, 0)])
        masks = r._mesh_masks()
        assert r._transparent_layer_bound(masks) == 1
        r2 = self._scene([(0, 0, 0.3), (0.05, 0.02, 0.9), (0.03, 0, 1.4)])
        masks2 = r2._mesh_masks()
        assert r2._transparent_layer_bound(masks2) == 3

    def test_clamped_equals_full_k(self):
        img_clamped = self._scene([(-0.9, 0, 0), (0.9, 0, 0)])
        rc = img_clamped
        img_c = rc.render()
        assert rc._prep_cache[1]["n_layers"] == 1   # clamp engaged
        rf = self._scene([(-0.9, 0, 0), (0.9, 0, 0)])
        rf._transparent_layer_bound = lambda masks: None   # force full K
        img_f = rf.render()
        assert rf._prep_cache[1]["n_layers"] == \
            rf.config.max_transparent_layers
        np.testing.assert_allclose(img_c, img_f, atol=1e-6)

    def test_nonconvex_or_morphed_disables_clamp(self):
        from awsm_renderer_tpu.core.meshes import MeshGeometry
        from awsm_renderer_tpu import PbrMaterial, Transform
        from awsm_renderer_tpu.core.materials import AlphaMode
        from awsm_renderer_tpu.geometry import box

        r = self._scene([(-0.9, 0, 0)])
        # a transparent mesh with a morph target: proof must decline
        g = box(0.3)
        V = g.positions.shape[0]
        glass2 = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.9, 0.4, 0.4, 0.5], np.float32),
            alpha_mode=AlphaMode.BLEND))
        geo = MeshGeometry(
            positions=g.positions, indices=g.indices, normals=g.normals,
            morph_positions=(g.positions * 0.2).reshape(1, V, 3),
            morph_normals=np.zeros((1, V, 3), np.float32))
        r.add_mesh(geo, glass2, Transform(
            translation=np.array([0.9, 0, 0], np.float32)))
        masks = r._mesh_masks()
        assert r._transparent_layer_bound(masks) is None
