"""Covered-tile-compacted opaque MSAA shade == band-wide opaque shade.

The compaction (ops/shade.py shade_deferred_compact_c) must be an exact
optimization: the fused resolve evaluates the same plane equations at
explicit px/py coordinates, shading runs the same per-pixel math with
NDC coords riding as planes, and the shaded colors scatter into the same
solid-environment sky the band-wide path selects on miss. Reference
behavior: the deferred opaque pass writes only covered pixels; the
background is the skybox pass (render.rs opaque pass + skybox).
"""

import numpy as np

from awsm_renderer_tpu import (
    AntiAliasing, AwsmRendererTpu, Light, PbrMaterial, PostProcessing,
    RendererConfig, ToneMapping, Transform,
)
from awsm_renderer_tpu.config import ToneMapping as TM
from awsm_renderer_tpu.geometry import box, checker_texture, uv_sphere
from awsm_renderer_tpu.passes.frame import render_frame
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32
W, H = 256, 64  # 16 raster tiles (8 rows x 2 cols of 8x128)


def _scene():
    from awsm_renderer_tpu.core.materials import TS_BASE_COLOR, TextureRef

    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H,
        anti_aliasing=AntiAliasing(msaa=True),
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    tex = r.textures.add_image(
        checker_texture(32, 8, (40, 90, 220), (220, 220, 240)), srgb=True)
    pbr = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.8, 0.6, 0.4, 1.0], F),
        metallic_factor=0.3, roughness_factor=0.4,
        textures={TS_BASE_COLOR: TextureRef(r.textures.row_of(tex))}))
    plain = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.2, 0.7, 0.3, 1.0], F),
        metallic_factor=0.0, roughness_factor=0.8))
    # geometry in the lower-left: several tiles stay pure sky
    r.add_mesh(box(0.6), pbr, transform=Transform(
        translation=np.array([-0.8, -0.4, 0.0], F)))
    r.add_mesh(uv_sphere(0.4), plain, transform=Transform(
        translation=np.array([0.2, -0.5, 0.3], F)))
    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    r.lights.insert(Light.point([2, 2, 2], intensity=6.0, range=10.0))
    view = m3.look_at([0, 0.3, 3], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def _frame(r, tile_cap, debug_mode="none", tile_rows=8):
    import jax.numpy as jnp

    ds = r._flush()
    masks = r._mesh_masks()
    op_rows = r._bucket_mat_rows(masks["opaque"])
    return render_frame(
        ds,
        jnp.asarray(masks["opaque"]),
        None, None,
        width=W, height=H, supersample=False, msaa=True,
        tonemap=TM.NONE, use_mips=True,
        has_morphs=False, skin_sets=0,
        solid_env=True,
        slot_mask=r._slot_mask(op_rows),
        ext=r._ext_mask(op_rows),
        needs_clip=bool(masks["needs_clip"]),
        debug_mode=debug_mode,
        opaque_tile_cap=tile_cap,
        opaque_tile_rows=tile_rows,
    )


import pytest


@pytest.mark.parametrize("tile_rows,cap", [(8, 15), (1, 120)])
def test_opaque_compact_matches_band(tile_rows, cap):
    # cap < n_units triggers compaction; >= covered units keeps it exact.
    # tile_rows=1 is the production strip granularity (1x128 units),
    # tile_rows=8 the native-tile granularity of rounds 2-3.
    r = _scene()
    ldr_a, tid_a, dep_a = _frame(r, None)
    ldr_b, tid_b, dep_b = _frame(r, cap, tile_rows=tile_rows)
    np.testing.assert_array_equal(np.asarray(tid_a), np.asarray(tid_b))
    np.testing.assert_array_equal(np.asarray(dep_a), np.asarray(dep_b))
    np.testing.assert_allclose(np.asarray(ldr_a), np.asarray(ldr_b),
                               atol=1e-6)


def test_opaque_compact_matches_band_debug_normals():
    r = _scene()
    ldr_a, _, _ = _frame(r, None, debug_mode="normals")
    ldr_b, _, _ = _frame(r, 15, debug_mode="normals")
    np.testing.assert_allclose(np.asarray(ldr_a), np.asarray(ldr_b),
                               atol=1e-6)


@pytest.mark.parametrize("tile_rows", [8, 1])
def test_opaque_tile_cap_bound_is_safe(tile_rows):
    """The host AABB bound must cover every unit the raster touches."""
    r = _scene()
    masks = r._mesh_masks()
    cap = r._bucket_tile_cap(masks, "opaque", tile_h=tile_rows, tile_w=128)
    _, tid, _ = _frame(r, None)
    t = np.asarray(tid).reshape(H // tile_rows, tile_rows, W // 128, 128)
    covered = int((t >= 0).any(axis=(1, 3)).sum())
    assert covered > 0
    if cap is not None:
        assert cap >= covered


def test_renderer_end_to_end_with_opaque_cap():
    """Full renderer.render() drive-through: the host cap engages (or
    legitimately declines) without changing the image."""
    r = _scene()
    img_cap = r.render()
    cap = r._bucket_tile_cap(r._mesh_masks(), "opaque")
    # force the band-wide path for comparison
    import awsm_renderer_tpu.renderer as rmod

    orig = rmod.AwsmRendererTpu._bucket_tile_cap
    try:
        rmod.AwsmRendererTpu._bucket_tile_cap = (
            lambda self, masks, bucket, **kw:
            None if bucket == "opaque" else orig(self, masks, bucket, **kw))
        img_nocap = r.render()
    finally:
        rmod.AwsmRendererTpu._bucket_tile_cap = orig
    if cap is not None:
        np.testing.assert_allclose(img_cap, img_nocap, atol=1e-6)
