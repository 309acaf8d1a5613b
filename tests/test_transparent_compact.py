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
