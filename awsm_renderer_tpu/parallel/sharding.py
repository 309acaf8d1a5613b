"""Multi-chip rendering: framebuffer bands sharded over an ICI mesh.

The reference is a single-GPU browser program with no distributed layer
(SURVEY §2.6/§5.8); its natural TPU-native scaling axis is screen space —
the same axis its 8x8-workgroup compute passes tile. Here the framebuffer
is sharded by rows over a 1-D `jax.sharding.Mesh`, the (small) scene
arrays are replicated, and every device rasterizes + shades only its band:

  - geometry "broadcast" = replicated device scene (the per-frame dirty
    uploads are tiny relative to ICI bandwidth)
  - raster/shade band-locality: triangle plane equations are translated
    into band coordinates per shard (passes/frame.py::_shift_rows_band);
    chunk-bbox culling then skips everything outside the band, so raster
    compute scales ~1/N per device
  - the band pipeline IS the production pipeline: shard_map wraps
    passes/frame.py::_frame_band (channel-plane deferred shade,
    depth-peeled transparency, HUD), not a separate code path
  - the image-space tail (supersample resolve, bloom/DoF stencils, SMAA,
    tonemap) runs as ordinary pjit'd XLA over the row-sharded image —
    GSPMD inserts the halo exchanges the stencils need, which is the
    XLA-native replacement for hand-written boundary passes

This is the TPU analog of sequence/context parallelism for a renderer:
the "big dimension" is pixels.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ToneMapping
from ..ops.raster import TILE_H, TILE_W
from ..ops.shade import ALL_EXT, ALL_SLOTS
from ..passes.frame import (
    _finish_frame, _frame_band, _msaa_edge_blend, _opaque_band,
    _opaque_band_msaa, _overlay_band, _pad_to, _resolve_supersample,
    _total_triangles,
)

EXT_VOLUME = 5


def render_frame_sharded(
    mesh: Mesh,
    ds,
    opaque_mask,
    transparent_mask=None,
    hud_mask=None,
    *,
    width: int,
    height: int,
    supersample: bool = False,
    msaa: bool = False,
    tonemap: ToneMapping = ToneMapping.KHRONOS_PBR_NEUTRAL,
    use_mips: bool = True,
    has_morphs: bool = False,
    skin_sets: int = 0,
    has_transparent: bool = False,
    has_hud: bool = False,
    n_transparent_layers: int = 4,
    slot_mask: Tuple[bool, ...] = ALL_SLOTS,
    solid_env: bool = False,
    debug_mode: str = "none",
    bloom: bool = False,
    dof: bool = False,
    smaa: bool = False,
    has_nearest: bool = True,
    needs_clip: bool = True,
    ext=None,
    has_uv1: bool = True,
    has_color: bool = True,
    light_tiles: bool = False,
    interpret: bool | None = None,
):
    """Render with the framebuffer row-sharded over `mesh` (1-D).

    Same pass set and output contract as passes/frame.py::render_frame —
    (display (H,W,4), tri_id (H,W), depth (H,W)), row-sharded over the
    mesh axis. The padded supersampled height must split into TILE_H-
    aligned bands: (pad(height*scale) % (TILE_H * n_devices)) == 0.
    """
    if ext is None:
        ext = ALL_EXT
    assert not (supersample and msaa), "pick one AA mode"
    (axis,) = mesh.axis_names
    n = mesh.shape[axis]
    scale = 2 if supersample else 1
    rw2 = _pad_to(width * scale, TILE_W)
    rh2 = _pad_to(height * scale, TILE_H)
    rw1 = _pad_to(width, TILE_W)
    rh1 = _pad_to(height, TILE_H)
    assert rh2 % (TILE_H * n) == 0, (
        f"padded render height {rh2} must split into TILE_H({TILE_H})-aligned "
        f"bands across {n} devices")
    band2_h = rh2 // n
    if supersample or msaa:
        assert rh1 % (TILE_H * n) == 0, (
            f"padded display height {rh1} must split into TILE_H({TILE_H})-"
            f"aligned bands across {n} devices for the 1x overlay pass")
    band1_h = rh1 // n

    replicated = NamedSharding(mesh, P())
    row_sharded = NamedSharding(mesh, P(axis))

    common = dict(
        use_mips=use_mips, has_morphs=has_morphs, skin_sets=skin_sets,
        slot_mask=slot_mask, solid_env=solid_env, interpret=interpret,
        hooks=None, has_nearest=has_nearest, needs_clip=needs_clip,
        ext=ext, has_uv1=has_uv1, has_color=has_color,
        light_tiles=light_tiles,
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_rep=False,
    )
    def _band_single_scale(ds_rep, om, tm, hm):
        """Non-supersampled frame: opaque + overlay in one band pass."""
        y0 = jax.lax.axis_index(axis) * band2_h
        hdr_ch, tri_id, depth = _frame_band(
            ds_rep, om,
            tm if has_transparent else None,
            hm if has_hud else None,
            rw=rw2, band_h=band2_h, rh_full=rh2, row_offset=y0,
            shift_rows=True,
            has_transparent=has_transparent, has_hud=has_hud,
            n_transparent_layers=n_transparent_layers,
            debug_mode=debug_mode, **common,
        )
        r, g, b, a = (c.reshape(band2_h, rw2) for c in hdr_ch)
        return r, g, b, a, tri_id, depth

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_rep=False,
    )
    def _band_opaque(ds_rep, om):
        """Supersampled opaque stage at 2x resolution."""
        y0 = jax.lax.axis_index(axis) * band2_h
        hdr_ch, tri_id, depth = _opaque_band(
            ds_rep, om,
            rw=rw2, band_h=band2_h, rh_full=rh2, row_offset=y0,
            shift_rows=True, debug_mode=debug_mode, **common,
        )
        r, g, b, a = (c.reshape(band2_h, rw2) for c in hdr_ch)
        return r, g, b, a, tri_id, depth

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=tuple(P(axis) for _ in range(9)),
        check_rep=False,
    )
    def _band_opaque_msaa(ds_rep, om):
        """MSAA opaque stage: 2x2-sample coverage raster per band, one
        shade per display pixel (passes/frame.py::_opaque_band_msaa)."""
        y0 = jax.lax.axis_index(axis) * band1_h
        hdr_ch, samp, depth1 = _opaque_band_msaa(
            ds_rep, om,
            rw2=_pad_to(width * 2, TILE_W), band2_h=2 * band1_h,
            rh2_full=2 * rh1,
            rw1=rw1, band1_h=band1_h, rh1_full=rh1,
            row_offset1=y0, shift_rows=True, debug_mode=debug_mode, **common,
        )
        r, g, b, a = (c.reshape(band1_h, rw1) for c in hdr_ch)
        return (r, g, b, a, *samp, depth1)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_rep=False,
    )
    def _band_overlay(ds_rep, tm, hm, hdr_img, tri_id, depth):
        """Transparent peel + HUD at display (1x) resolution over the
        resolved opaque bands."""
        y0 = jax.lax.axis_index(axis) * band1_h
        hdr_ch = [hdr_img[..., c].reshape(band1_h * rw1) for c in range(4)]
        hdr_ch, tri_id = _overlay_band(
            hdr_ch, tri_id, depth, ds_rep,
            tm if has_transparent else None,
            hm if has_hud else None,
            rw=rw1, band_h=band1_h, rh_full=rh1, row_offset=y0,
            shift_rows=True,
            has_transparent=has_transparent, has_hud=has_hud,
            n_transparent_layers=n_transparent_layers, **common,
        )
        r, g, b, a = (c.reshape(band1_h, rw1) for c in hdr_ch)
        return r, g, b, a, tri_id

    ds_rep = jax.device_put(ds, replicated)
    om = jax.device_put(jnp.asarray(opaque_mask), replicated)
    zeros = jnp.zeros_like(jnp.asarray(opaque_mask))
    tm = jax.device_put(
        jnp.asarray(transparent_mask) if transparent_mask is not None
        else zeros, replicated)
    hm = jax.device_put(
        jnp.asarray(hud_mask) if hud_mask is not None else zeros, replicated)

    @functools.partial(jax.jit, out_shardings=(row_sharded,) * 3)
    def _frame(ds_rep, om, tm, hm):
        if msaa:
            r, g, b, a, s0, s1, s2, s3, depth = _band_opaque_msaa(ds_rep, om)
            # edge blend OUTSIDE shard_map: the rolls become GSPMD halo
            # exchanges across band boundaries
            hdr_ch = _msaa_edge_blend(
                [x.reshape(rh1 * rw1) for x in (r, g, b, a)],
                [s0, s1, s2, s3], rh1, rw1)
            hdr_img = jnp.stack(
                [c.reshape(rh1, rw1) for c in hdr_ch], axis=-1)
            r, g, b, a, tri_id = _band_overlay(
                ds_rep, tm, hm, hdr_img, s0, depth)
            hdr_ch = [x.reshape(rh1 * rw1) for x in (r, g, b, a)]
        elif scale == 2:
            r, g, b, a, tri_id, depth = _band_opaque(ds_rep, om)
            hdr_ch = [x for x in (r, g, b, a)]
            # resolve to 1x between the stages — plain pjit'd image ops
            # over the row-sharded planes; GSPMD handles the 2:1 reshard
            hdr_ch, tri_id, depth = _resolve_supersample(
                [c.reshape(rh2 * rw2) for c in hdr_ch], tri_id, depth,
                width=width, height=height, rw2=rw2, rw1=rw1, rh1=rh1)
            hdr_img = jnp.stack(
                [c.reshape(rh1, rw1) for c in hdr_ch], axis=-1)
            r, g, b, a, tri_id = _band_overlay(
                ds_rep, tm, hm, hdr_img, tri_id, depth)
            hdr_ch = [x.reshape(rh1 * rw1) for x in (r, g, b, a)]
        else:
            r, g, b, a, tri_id, depth = _band_single_scale(ds_rep, om, tm, hm)
            hdr_ch = [x.reshape(rh1 * rw1) for x in (r, g, b, a)]
        ldr, tri_id, depth = _finish_frame(
            hdr_ch, tri_id, depth, ds_rep,
            rw=rw1, rh=rh1, width=width, height=height,
            tonemap=tonemap, bloom=bloom, dof=dof, smaa=smaa, hooks=None,
        )
        T_pool = _total_triangles(ds_rep)
        tri_id = jnp.where(tri_id >= 0, tri_id % T_pool, -1)
        return ldr, tri_id, depth

    return _frame(ds_rep, om, tm, hm)


def render_frame_sharded_2d(
    mesh: Mesh,
    ds,
    opaque_mask,
    transparent_mask=None,
    hud_mask=None,
    *,
    width: int,
    height: int,
    tonemap: ToneMapping = ToneMapping.KHRONOS_PBR_NEUTRAL,
    use_mips: bool = True,
    has_morphs: bool = False,
    skin_sets: int = 0,
    has_transparent: bool = False,
    has_hud: bool = False,
    n_transparent_layers: int = 4,
    slot_mask: Tuple[bool, ...] = ALL_SLOTS,
    solid_env: bool = False,
    bloom: bool = False,
    dof: bool = False,
    smaa: bool = False,
    has_nearest: bool = True,
    needs_clip: bool = True,
    ext=None,
    has_uv1: bool = True,
    has_color: bool = True,
    light_tiles: bool = False,
    interpret: bool | None = None,
):
    """Single-scale frame over a 2-D ("rows", "cols") device mesh:
    framebuffer SCREEN TILES sharded along both axes. Each device owns a
    (band_h x band_w) tile, translates the shared plane-equation setup
    into fully local coordinates (_shift_rows_band + _shift_cols_band),
    and runs the production band pipeline on its tile; the image-space
    tail (effects, tonemap) runs as pjit'd stencils over the 2-D-sharded
    image, where GSPMD inserts the halo exchanges along BOTH axes.

    This generalizes the 1-D row sharding (render_frame_sharded) when a
    slab of chips makes tall bands ICI-unfriendly — e.g. a 4x2 mesh
    keeps each shard's halo perimeter smaller than 8 stacked rows would.
    Constraints: single-scale only (no supersample/MSAA resolve between
    stages), and no KHR_materials_volume refraction (its background
    gather crosses tile boundaries)."""
    if ext is None:
        ext = ALL_EXT
    assert not (has_transparent and ext[EXT_VOLUME]), (
        "2-D tile sharding cannot serve screen-space refraction — pass "
        "ext with the volume flag off (renderer buckets do this when no "
        "material uses KHR_materials_volume)")
    rows_ax, cols_ax = mesh.axis_names
    nr = mesh.shape[rows_ax]
    nc = mesh.shape[cols_ax]
    rw1 = _pad_to(width, TILE_W)
    rh1 = _pad_to(height, TILE_H)
    assert rh1 % (TILE_H * nr) == 0, (rh1, nr)
    assert rw1 % (TILE_W * nc) == 0, (rw1, nc)
    band_h = rh1 // nr
    band_w = rw1 // nc

    replicated = NamedSharding(mesh, P())
    tile_sharded = NamedSharding(mesh, P(rows_ax, cols_ax))

    common = dict(
        use_mips=use_mips, has_morphs=has_morphs, skin_sets=skin_sets,
        slot_mask=slot_mask, solid_env=solid_env, interpret=interpret,
        hooks=None, has_nearest=has_nearest, needs_clip=needs_clip,
        ext=ext, has_uv1=has_uv1, has_color=has_color,
        light_tiles=light_tiles,
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=tuple(P(rows_ax, cols_ax) for _ in range(6)),
        check_rep=False,
    )
    def _tile(ds_rep, om, tm, hm):
        y0 = jax.lax.axis_index(rows_ax) * band_h
        x0 = jax.lax.axis_index(cols_ax) * band_w
        hdr_ch, tri_id, depth = _frame_band(
            ds_rep, om,
            tm if has_transparent else None,
            hm if has_hud else None,
            rw=band_w, band_h=band_h, rh_full=rh1, row_offset=y0,
            shift_rows=True, rw_full=rw1, col_offset=x0, shift_cols=True,
            has_transparent=has_transparent, has_hud=has_hud,
            n_transparent_layers=n_transparent_layers,
            debug_mode="none", **common,
        )
        r, g, b, a = (c.reshape(band_h, band_w) for c in hdr_ch)
        return r, g, b, a, tri_id, depth

    ds_rep = jax.device_put(ds, replicated)
    om = jax.device_put(jnp.asarray(opaque_mask), replicated)
    zeros = jnp.zeros_like(jnp.asarray(opaque_mask))
    tm = jax.device_put(
        jnp.asarray(transparent_mask) if transparent_mask is not None
        else zeros, replicated)
    hm = jax.device_put(
        jnp.asarray(hud_mask) if hud_mask is not None else zeros, replicated)

    @functools.partial(jax.jit, out_shardings=(tile_sharded,) * 3)
    def _frame(ds_rep, om, tm, hm):
        r, g, b, a, tri_id, depth = _tile(ds_rep, om, tm, hm)
        hdr_ch = [x.reshape(rh1 * rw1) for x in (r, g, b, a)]
        ldr, tri_id, depth = _finish_frame(
            hdr_ch, tri_id, depth, ds_rep,
            rw=rw1, rh=rh1, width=width, height=height,
            tonemap=tonemap, bloom=bloom, dof=dof, smaa=smaa, hooks=None,
        )
        T_pool = _total_triangles(ds_rep)
        tri_id = jnp.where(tri_id >= 0, tri_id % T_pool, -1)
        return ldr, tri_id, depth

    return _frame(ds_rep, om, tm, hm)
