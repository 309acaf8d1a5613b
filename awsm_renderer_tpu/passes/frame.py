"""Frame pipeline: vertex → raster → deferred shade → transparent → HUD →
(effects) → display.

TPU-native analog of the reference's render loop (crates/renderer/src/
render.rs:53-383): the whole frame is ONE jitted function over the device
scene; XLA plays the role of the command encoder (pass scheduling, fusion,
buffer reuse). Pass toggles and capacities are static args = the
reference's pipeline-variant cache keys. Pass order mirrors render.rs:
geometry (world, HUD) → opaque shade → transparent forward → effects →
display.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import RendererConfig, ToneMapping
from ..ops.effects import bloom_c, depth_of_field_c, smaa_c
from ..ops.raster import (
    TILE_H, TILE_W, pad_setup, pad_setup_rows, rasterize, rasterize_layers,
    rasterize_layers_compact, rasterize_layers_rows, rasterize_rows,
)
from ..ops.shade import (
    ALL_SLOTS, shade_deferred_c, shade_surface, shade_transparent_compact32,
    shade_transparent_layers_c,
)
from ..ops.tonemap import display_pass_c
from ..ops.vertex import vertex_stage


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class RenderHooks:
    """The reference's 7 hook points (render.rs:28-46). The five in-frame
    hooks are traceable jax functions running INSIDE the jitted frame
    (swapping a hook set is a retrace, like the reference's hook-driven
    pipeline rebuilds); pre/post_render are host callbacks around the
    dispatch (the reference runs them around its command submission).

    Signatures:
      pre_render(renderer) -> None            [host, before the flush]
      first_pass(ds) -> ds                    [in-jit, before vertex/raster]
      after_geometry(vis: dict, ds) -> vis dict
      before_transparent(hdr, depth, ds) -> hdr
      after_transparent(hdr, ds) -> hdr
      last_pass(ldr, ds) -> ldr
      post_render(renderer) -> None           [host, after the dispatch]

    Draw user geometry mid-frame with passes/extra.py
    extra_geometry_pass (the analog of the reference's public hook-pass
    builders, render.rs:387-546)."""

    pre_render: Optional[Callable] = None
    first_pass: Optional[Callable] = None
    after_geometry: Optional[Callable] = None
    before_transparent: Optional[Callable] = None
    after_transparent: Optional[Callable] = None
    last_pass: Optional[Callable] = None
    post_render: Optional[Callable] = None


def _sort_triangles(setup: jnp.ndarray):
    """Sort triangle columns of an (NSETUP, T) block by Z-order of their
    screen bbox center (legacy layout — used by the sharded path; the
    main frame sorts row-major blocks in prep_setup before transposing,
    which is ~6 ms cheaper at 524k triangles)."""
    from ..ops.vertex import (
        S_BB_MAXX, S_BB_MAXY, S_BB_MINX, S_BB_MINY, _morton,
    )

    cx = ((setup[S_BB_MINX] + setup[S_BB_MAXX]) * 0.5 / 8.0).astype(jnp.int32)
    cy = ((setup[S_BB_MINY] + setup[S_BB_MAXY]) * 0.5 / 8.0).astype(jnp.int32)
    key = _morton(jnp.clip(cx, 0, 0xFFFF), jnp.clip(cy, 0, 0xFFFF))
    # invalid triangles carry empty bboxes (minx=+BIG) and sort to the end
    key = jnp.where(setup[S_BB_MINX] < 1e37, key, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(key)
    return setup[:, perm], perm


def prep_setup(rows: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """(T, NSETUP) vertex-stage rows + Morton key → sorted, padded
    (NSETUP, T') raster input.

    Spatial sorting makes the raster's per-chunk bboxes tight, which is
    the difference between O(covered tiles) and O(all tiles) work — the
    TPU analog of the reference's draw sorting (renderable.rs:101
    geometry_sort_renderable minimizes pipeline switches; here we
    minimize chunk-tile overlap instead). Sorting happens on the
    row-major block (one 256-B-row gather) before the transpose."""
    perm = jnp.argsort(key)
    return pad_setup(rows[perm].T)


def prep_setup_rows(rows: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """(T, NSETUP) vertex-stage rows → padded ROW-MAJOR (T', NSETUP) v5
    raster input (a 16-triangle group is one contiguous setup burst; no
    transpose anywhere on the path).

    NO per-frame sort: the v5 binner works on 16-triangle groups, and at
    that granularity the mesh-pool order (triangles contiguous per mesh)
    measured TIGHTER than a global screen-space Morton order on the
    1080p stress scene (27.6k vs 41.3k subtile visits; Morton jumps at
    quadrant boundaries poison small groups). Deleting the sort also
    deletes its ~5.6 ms argsort + 256-B-row permute gather. The Morton
    `key` stays accepted for the v4/dense paths (prep_setup)."""
    del key
    return pad_setup_rows(rows)


def _shift_rows_band(rows: jnp.ndarray, y0) -> jnp.ndarray:
    """Translate row-major (T, NSETUP) plane-equation setup into
    band-local y coordinates: E(px, py - y0) must equal the global value,
    so every y-linear plane's constant gains B*y0 and bboxes translate.
    Used by the row-sharded frame (parallel/sharding.py) — each device
    rasterizes its band with local tile coordinates."""
    from ..ops.vertex import (
        S_BB_MAXY, S_BB_MINY, S_E0B, S_E0C, S_E1B, S_E1C, S_E2B, S_E2C,
        S_ZB, S_ZC,
    )

    y0 = jnp.float32(y0)
    s = rows
    for rb, rc in ((S_E0B, S_E0C), (S_E1B, S_E1C), (S_E2B, S_E2C),
                   (S_ZB, S_ZC)):
        s = s.at[:, rc].add(s[:, rb] * y0)
    s = s.at[:, S_BB_MINY].add(-y0)
    s = s.at[:, S_BB_MAXY].add(-y0)
    return s


def _shift_cols_band(rows: jnp.ndarray, x0) -> jnp.ndarray:
    """x-axis analog of _shift_rows_band: E(px - x0, py) — every
    x-linear plane's constant gains A*x0 and the x bboxes translate.
    Composing both shifts gives a 2-D (rows x cols) screen-tile shard
    its fully local coordinates."""
    from ..ops.vertex import (
        S_BB_MAXX, S_BB_MINX, S_E0A, S_E0C, S_E1A, S_E1C, S_E2A, S_E2C,
        S_ZA, S_ZC,
    )

    x0 = jnp.float32(x0)
    s = rows
    for ra, rc in ((S_E0A, S_E0C), (S_E1A, S_E1C), (S_E2A, S_E2C),
                   (S_ZA, S_ZC)):
        s = s.at[:, rc].add(s[:, ra] * x0)
    s = s.at[:, S_BB_MINX].add(-x0)
    s = s.at[:, S_BB_MAXX].add(-x0)
    return s


_CORNER_NAMES = ("c_pos", "c_norm", "c_tang", "c_uv0", "c_uv1", "c_color",
                 "c_joints", "c_weights", "c_morph_base")


def _combined_geometry(ds):
    """Pool corners + instanced groups tiled across their instances.

    Instanced groups (core/meshes.py _InstGroup; reference
    instances.rs:22-203) store each resource's corners ONCE in ds; here
    they are tiled I× with jnp.tile — a broadcast XLA fuses into the
    vertex stage's (T,) consumers, so the duplication never round-trips
    through HBM as a standalone buffer — and their per-triangle mesh row
    comes from the tiny (I,) instance-row vector. Group order is gid
    order (Meshes.inst_group_items), which picking mirrors."""
    gids = sorted({int(k[4:].split("_", 1)[0]) for k in ds
                   if k.startswith("inst") and "_" in k
                   and k[4:].split("_", 1)[0].isdigit()})
    if not gids:
        return {n: ds[n] for n in _CORNER_NAMES}, ds["tri_mesh"]
    parts = {n: [ds[n]] for n in _CORNER_NAMES}
    tri = [ds["tri_mesh"]]
    for g in gids:
        rows = ds[f"inst{g}_rows"]          # (I,) i32 mesh rows
        live = ds[f"inst{g}_live"]          # (Tp,) bool
        n_inst = rows.shape[0]
        tp = live.shape[0]
        for n in _CORNER_NAMES:
            parts[n].append(jnp.tile(ds[f"inst{g}_{n}"], (1, n_inst)))
        tri.append(jnp.where(
            jnp.tile(live, n_inst),
            jnp.repeat(rows, tp, total_repeat_length=n_inst * tp),
            jnp.int32(-1)))
    return ({n: jnp.concatenate(parts[n], axis=1) for n in _CORNER_NAMES},
            jnp.concatenate(tri))


def _total_triangles(ds) -> int:
    """Device triangle count of the combined stream: pool + instanced
    groups (the clip doubling and picking modulo key off this)."""
    t = ds["tri_mesh"].shape[0]
    for k in ds:
        if k.startswith("inst") and k.endswith("_rows"):
            g = k[4:-5]
            if g.isdigit():
                t += ds[k].shape[0] * ds[f"inst{g}_live"].shape[0]
    return t


def _run_vertex(ds, mask, *, rw, rh_full, row_offset, shift_rows,
                has_morphs, skin_sets, needs_clip,
                col_offset=0, shift_cols=False):
    geo, tri_mesh = _combined_geometry(ds)

    # ---- animated-subset split (r4): morph/skin vertex math costs ~18
    # per-corner GATHERS over the WHOLE pool (6 morph-delta + 12
    # joint-matrix fetches, ops/vertex.py) — +33 ms/frame at 262k tris
    # when only a few thousand triangles are actually animated (the
    # reference pays per-mesh: its geometry pass binds morph/skin shader
    # variants per draw, geometry/pipeline.rs). When the renderer ships
    # the animated triangle set (ds["anim_tri_idx"], pool indices, -1
    # pads), the POOL runs the plain stage and only the compact subset
    # pays morphs/skins; its rows overwrite theirs at the same pool
    # positions, preserving the v5 row-index == id invariant.
    anim_idx = ds.get("anim_tri_idx") if (has_morphs or skin_sets) else None
    if anim_idx is not None:
        rows, key = vertex_stage(
            geo["c_pos"], geo["c_norm"], geo["c_tang"], geo["c_uv0"],
            geo["c_uv1"], geo["c_color"], geo["c_joints"], geo["c_weights"],
            geo["c_morph_base"],
            ds["morph_deltas"], tri_mesh, ds["mesh_info"],
            ds["morph_weights"], ds["world"], ds["normal_mat"],
            ds["joint_matrices"], ds["camera"]["view_proj"], mask,
            width=rw, height=rh_full, has_morphs=False,
            skin_sets=0, needs_clip=needs_clip,
        )
        T = tri_mesh.shape[0]
        safe = jnp.maximum(anim_idx, 0)

        def _cols(a):
            cdim, t = a.shape
            gidx = (jnp.arange(cdim, dtype=jnp.int32)[:, None] * t
                    + safe[None, :])
            return a.reshape(cdim * t)[gidx.reshape(-1)].reshape(cdim, -1)

        ageo = {n: _cols(geo[n]) for n in _CORNER_NAMES}
        a_tri = jnp.where(anim_idx >= 0, jnp.take(tri_mesh, safe),
                          jnp.int32(-1))
        rows_a, _ = vertex_stage(
            ageo["c_pos"], ageo["c_norm"], ageo["c_tang"], ageo["c_uv0"],
            ageo["c_uv1"], ageo["c_color"], ageo["c_joints"],
            ageo["c_weights"], ageo["c_morph_base"],
            ds["morph_deltas"], a_tri, ds["mesh_info"],
            ds["morph_weights"], ds["world"], ds["normal_mat"],
            ds["joint_matrices"], ds["camera"]["view_proj"], mask,
            anim_idx,
            width=rw, height=rh_full, has_morphs=has_morphs,
            skin_sets=skin_sets, needs_clip=needs_clip,
        )
        Nc = anim_idx.shape[0]
        # pad sentinel must be OUT-OF-RANGE POSITIVE: JAX wraps negative
        # scatter indices BEFORE the drop-mode bounds check (verified:
        # .at[[-1]].set(..., mode="drop") writes the LAST element), so a
        # -1 pad would clobber the last pool row. 2*T is OOB for both
        # the T-row (no-clip) and 2*T-row (clip-doubled) layouts.
        oob = jnp.int32(2 * T)
        if needs_clip:
            # clip doubling: row t is the primary, row T+t the secondary
            tgt = jnp.concatenate([
                jnp.where(anim_idx >= 0, anim_idx, oob),
                jnp.where(anim_idx >= 0, T + anim_idx, oob)])
        else:
            tgt = jnp.where(anim_idx >= 0, anim_idx, oob)
            rows_a = rows_a[:Nc]
        rows = rows.at[tgt].set(rows_a, mode="drop")
    else:
        rows, key = vertex_stage(
            geo["c_pos"], geo["c_norm"], geo["c_tang"], geo["c_uv0"],
            geo["c_uv1"], geo["c_color"], geo["c_joints"], geo["c_weights"],
            geo["c_morph_base"],
            ds["morph_deltas"], tri_mesh, ds["mesh_info"],
            ds["morph_weights"], ds["world"], ds["normal_mat"],
            ds["joint_matrices"], ds["camera"]["view_proj"], mask,
            width=rw, height=rh_full, has_morphs=has_morphs,
            skin_sets=skin_sets, needs_clip=needs_clip,
        )
    if shift_rows:
        rows = _shift_rows_band(rows, row_offset)
    if shift_cols:
        rows = _shift_cols_band(rows, col_offset)
    return rows, key


def _run_vertex_compact(ds, mask, tri_idx, *, rw, rh_full, row_offset,
                        shift_rows, has_morphs, skin_sets, needs_clip):
    """Vertex stage over a COMPACTED triangle set: `tri_idx` (Nc,) i32
    holds pool triangle indices (-1 = padding). The overlay buckets
    (transparent + HUD) typically hold a few hundred live triangles out
    of a few hundred thousand pool rows — running the full vertex stage
    plus bin sort for them cost ~8 ms/frame at 1080p. The gather is tiny
    (output-sized), ids stay pool ids via vertex_stage(orig_ids=...), so
    the FAT raster kernels (which read ids from S_ORIG_ID) emit pool-space
    tri_id planes directly. Instanced-group geometry never reaches this
    path (the renderer passes tri_idx=None when an overlay mesh is
    instanced)."""
    safe = jnp.maximum(tri_idx, 0)
    # column gather via FLAT row-major indices: jnp.take(pool, idx,
    # axis=1) makes XLA relayout the ENTIRE (C, T) pool to {0,1}
    # (column-major) first — six ~0.25 ms full-pool copies per frame
    # for a few thousand gathered columns (compile-checked: the lowered
    # HLO contains `copy f32[6,262144]{0,1}` with ~463k estimated
    # cycles). A flat gather of c*T + idx touches only C*Nc elements
    # and keeps the pools in their native layout.
    def _cols(a):
        cdim, t = a.shape
        gidx = (jnp.arange(cdim, dtype=jnp.int32)[:, None] * t
                + safe[None, :])
        return a.reshape(cdim * t)[gidx.reshape(-1)].reshape(cdim, -1)

    geo = {n: _cols(ds[n]) for n in _CORNER_NAMES}
    tri_mesh = jnp.where(tri_idx >= 0, jnp.take(ds["tri_mesh"], safe),
                         jnp.int32(-1))
    rows, key = vertex_stage(
        geo["c_pos"], geo["c_norm"], geo["c_tang"], geo["c_uv0"],
        geo["c_uv1"], geo["c_color"], geo["c_joints"], geo["c_weights"],
        geo["c_morph_base"],
        ds["morph_deltas"], tri_mesh, ds["mesh_info"],
        ds["morph_weights"], ds["world"], ds["normal_mat"],
        ds["joint_matrices"], ds["camera"]["view_proj"], mask, tri_idx,
        width=rw, height=rh_full, has_morphs=has_morphs,
        skin_sets=skin_sets, needs_clip=needs_clip,
    )
    if shift_rows:
        rows = _shift_rows_band(rows, row_offset)
    return rows, key


def _opaque_band(
    ds, opaque_mask,
    *,
    rw: int,            # padded render width (supersampled space)
    band_h: int,        # this band's height (TILE_H multiple)
    rh_full: int,       # full padded render height
    row_offset,         # band start row (traced ok; 0 = single device)
    shift_rows: bool,   # translate setup into band-local coordinates
    rw_full: int | None = None,   # full padded width (2-D shards)
    col_offset=0,                 # band start column
    shift_cols: bool = False,
    use_mips: bool,
    has_morphs: bool,
    skin_sets: int,
    slot_mask,
    solid_env: bool,
    debug_mode: str,
    interpret,
    hooks,
    has_nearest: bool,
    needs_clip: bool,
    light_tiles: bool = False,
    ext,
    has_uv1: bool,
    has_color: bool,
):
    """Opaque geometry + deferred shade for one framebuffer band: vertex →
    raster → deferred opaque shade (render.rs steps 1, 6), in the
    production channel-plane layout. Returns
    (hdr_ch [r,g,b,a] (band_h*rw,) planes, tri_id, depth (band_h, rw))."""
    sorted_rows = prep_setup_rows(*_run_vertex(
        ds, opaque_mask, rw=(rw_full or rw), rh_full=rh_full,
        row_offset=row_offset, shift_rows=shift_rows,
        col_offset=col_offset, shift_cols=shift_cols,
        has_morphs=has_morphs, skin_sets=skin_sets,
        needs_clip=needs_clip))
    vis = rasterize_rows(sorted_rows, width=rw, height=band_h,
                         interpret=interpret, has_uv1=has_uv1,
                         has_color=has_color, analytic_derivs=False)
    if hooks and hooks.after_geometry:
        vis = hooks.after_geometry(vis, ds)
    # HDR rides as [r,g,b,a] (P,) channel planes through the whole frame —
    # every (H,W,4) stack/re-slice round-trip pays a multi-ms relayout
    hdr_ch = shade_deferred_c(
        vis, ds,
        width=rw, height=band_h, height_full=rh_full, row_offset=row_offset,
        width_full=rw_full, col_offset=col_offset,
        use_mips=use_mips, slot_mask=slot_mask,
        solid_env=solid_env, has_nearest=has_nearest, ext=ext,
        debug_mode=debug_mode, light_tiles=light_tiles,
    )
    return hdr_ch, vis["tri_id"], vis["depth"]


def _overlay_band(
    hdr_ch, tri_id, depth,
    ds, transparent_mask, hud_mask,
    *,
    rw: int,
    band_h: int,
    rh_full: int,
    row_offset,
    shift_rows: bool,
    rw_full: int | None = None,
    col_offset=0,
    shift_cols: bool = False,
    use_mips: bool,
    has_morphs: bool,
    skin_sets: int,
    has_transparent: bool,
    has_hud: bool,
    n_transparent_layers: int,
    slot_mask,
    solid_env: bool,
    interpret,
    hooks,
    has_nearest: bool,
    needs_clip: bool,
    light_tiles: bool = False,
    ext,
    has_uv1: bool,
    has_color: bool,
    overlay_slot_mask=None,   # slot/ext masks of the OVERLAY bucket's own
    overlay_ext=None,         # materials (per-pass specialization)
    crop_y0=None,             # traced i32: overlay band start row, or None
    crop_h: Optional[int] = None,   # static bucketed band height
    ov_tri_idx=None,          # (Nc,) i32 compacted overlay triangle ids
    tile_cap: Optional[int] = None,  # static covered-tile cap for the
                                     # transparent shade (shade.py)
):
    """Transparent forward peel + HUD over the (already shaded) opaque band
    (render.rs steps 9, 2/10). With supersampling on, this runs at DISPLAY
    resolution on the resolved opaque image — the analog of the reference
    resolving its MSAA opaque target at the opaque→transparent blit
    (render.rs:224-261) — which keeps the K-layer peel O(display pixels).
    Returns (hdr_ch, tri_id)."""
    if overlay_slot_mask is None:
        overlay_slot_mask = slot_mask
    if overlay_ext is None:
        overlay_ext = ext

    # ---- overlay band crop: the whole overlay runs on the row band the
    # transparent/HUD geometry can actually touch (host-projected AABBs,
    # bucketed height so camera motion only moves a traced offset). The
    # K-layer peel + batched shade otherwise pay full-screen ALU for a
    # few panes of glass — ~22 ms of shading at 1080p/K=4 vs ~2 ms on a
    # typical band. Skipped under sharding (shift_rows), with overlay
    # hooks (they see full-frame images), and with screen-space
    # refraction (it gathers the opaque buffer outside the band).
    if (crop_h is not None and not shift_rows and crop_h < band_h
            and not (hooks and (hooks.before_transparent
                                or hooks.after_transparent))
            and not overlay_ext[5]):   # EXT_VOLUME: refraction gathers
                                       # the opaque buffer outside the band
        y0 = crop_y0
        off = y0 * rw
        hdr_c = [jax.lax.dynamic_slice(c, (off,), (crop_h * rw,))
                 for c in hdr_ch]
        tri_c = jax.lax.dynamic_slice(tri_id, (y0, 0), (crop_h, rw))
        dep_c = jax.lax.dynamic_slice(depth, (y0, 0), (crop_h, rw))
        hdr_c, tri_c = _overlay_band(
            hdr_c, tri_c, dep_c, ds, transparent_mask, hud_mask,
            rw=rw, band_h=crop_h, rh_full=rh_full, row_offset=y0,
            shift_rows=True, use_mips=use_mips, has_morphs=has_morphs,
            skin_sets=skin_sets, has_transparent=has_transparent,
            has_hud=has_hud, n_transparent_layers=n_transparent_layers,
            slot_mask=slot_mask, solid_env=solid_env, interpret=interpret,
            hooks=hooks, has_nearest=has_nearest, needs_clip=needs_clip,
            ext=ext, has_uv1=has_uv1, has_color=has_color,
            light_tiles=light_tiles,
            overlay_slot_mask=overlay_slot_mask, overlay_ext=overlay_ext,
            ov_tri_idx=ov_tri_idx, tile_cap=tile_cap,
        )
        hdr_ch = [jax.lax.dynamic_update_slice(full, band, (off,))
                  for full, band in zip(hdr_ch, hdr_c)]
        tri_id = jax.lax.dynamic_update_slice(tri_id, tri_c, (y0, 0))
        return hdr_ch, tri_id

    def run_vertex(mask):
        if ov_tri_idx is not None:
            assert not shift_cols, "compacted overlay pools are 1-D only"
            return _run_vertex_compact(
                ds, mask, ov_tri_idx, rw=rw, rh_full=rh_full,
                row_offset=row_offset, shift_rows=shift_rows,
                has_morphs=has_morphs, skin_sets=skin_sets,
                needs_clip=needs_clip)
        return _run_vertex(
            ds, mask, rw=(rw_full or rw), rh_full=rh_full,
            row_offset=row_offset, shift_rows=shift_rows,
            col_offset=col_offset, shift_cols=shift_cols,
            has_morphs=has_morphs,
            skin_sets=skin_sets, needs_clip=needs_clip)

    def _stack(ch):
        return jnp.stack(ch, axis=-1).reshape(band_h, rw, 4)

    def _unstack(img):
        flat = img.reshape(band_h * rw, 4)
        return [flat[:, c] for c in range(4)]

    if hooks and hooks.before_transparent:
        hdr_ch = _unstack(hooks.before_transparent(_stack(hdr_ch), depth, ds))

    # ---- transparent forward pass (render.rs step 9: back-to-front over
    # opaque with shared read-only depth) -------------------------------------
    if has_transparent and transparent_mask is not None:
        t_rows = prep_setup_rows(*run_vertex(transparent_mask))
        n_t32 = (-(-band_h // 32)) * (rw // 32)
        # covered-tile compaction of the WHOLE K-layer pipeline: the
        # peels rasterize only covered 32x32 tiles and shade+composite
        # stay in compact space (rasterize_layers_compact). Invalid with
        # volume refraction (it gathers the opaque buffer at arbitrary
        # band pixels); sharded callers never pass a tile_cap (the
        # coverage argsort would be per-shard).
        if (tile_cap is not None and not overlay_ext[5]
                and min(tile_cap, n_t32) * 1024 < band_h * rw):
            layers_c, t_idx, ntx32 = rasterize_layers_compact(
                t_rows, depth, width=rw, height=band_h,
                n_layers=n_transparent_layers, tile_cap32=tile_cap,
                interpret=interpret, has_uv1=has_uv1, has_color=has_color,
            )
            hdr_ch = shade_transparent_compact32(
                layers_c, t_idx, hdr_ch, ds,
                width=rw, height=band_h, height_full=rh_full,
                row_offset=row_offset, n_tx=ntx32,
                use_mips=use_mips, slot_mask=overlay_slot_mask,
                solid_env=solid_env, has_nearest=has_nearest,
                ext=overlay_ext, n_layers=n_transparent_layers,
                light_tiles=light_tiles,
            )
        else:
            # analytic (plane-equation) uv derivatives here too: the
            # opaque resolve and the compacted peel both use them, and
            # the tile_cap can toggle with camera motion — screen
            # differencing in this fallback would make mip selection
            # pop at the transition (and differ from the opaque pass)
            layers = rasterize_layers_rows(
                t_rows, depth, width=rw, height=band_h,
                n_layers=n_transparent_layers, interpret=interpret,
                has_uv1=has_uv1, has_color=has_color,
                analytic_derivs=True,
            )
            hdr_ch = shade_transparent_layers_c(
                layers, hdr_ch, ds,
                width=rw, height=band_h, height_full=rh_full,
                row_offset=row_offset,
                width_full=rw_full, col_offset=col_offset,
                use_mips=use_mips, slot_mask=overlay_slot_mask,
                solid_env=solid_env,
                has_nearest=has_nearest, ext=overlay_ext,
                n_layers=n_transparent_layers,
                tile_cap=None, light_tiles=light_tiles,
            )

    if hooks and hooks.after_transparent:
        hdr_ch = _unstack(hooks.after_transparent(_stack(hdr_ch), ds))

    # ---- HUD pass (render.rs step 2/10: HUD geometry, own cleared depth) ----
    if has_hud and hud_mask is not None:
        h_rows = prep_setup_rows(*run_vertex(hud_mask))
        if ov_tri_idx is not None:
            # compacted pools break the v5 resolve's row-index == pool-id
            # invariant; the FAT v4 kernel reads ids from S_ORIG_ID and at
            # a few hundred triangles its one sweep beats v5's resolve
            # gathers anyway
            h_vis = rasterize(h_rows.T, width=rw, height=band_h,
                              interpret=interpret, has_uv1=has_uv1,
                              has_color=has_color, analytic_derivs=False)
            h_vis = {k: v[:band_h, :rw] for k, v in h_vis.items()}
        else:
            h_vis = rasterize_rows(h_rows, width=rw, height=band_h,
                                   interpret=interpret, has_uv1=has_uv1,
                                   has_color=has_color,
                                   analytic_derivs=False)
        P = rw * band_h
        h_planes = {k: v.reshape(P) for k, v in h_vis.items()}
        h_color, h_alpha, h_valid, _ = shade_surface(
            h_planes, ds,
            width=rw, height=band_h, height_full=rh_full,
            row_offset=row_offset,
            width_full=rw_full, col_offset=col_offset,
            use_mips=use_mips, slot_mask=overlay_slot_mask,
            solid_env=solid_env,
            has_nearest=has_nearest, ext=overlay_ext,
            light_tiles=light_tiles,
        )
        a = jnp.where(h_valid, h_alpha, 0.0)
        out = [jnp.where(h_valid, h_color[c] * a + hdr_ch[c] * (1 - a),
                         hdr_ch[c]) for c in range(3)]
        out.append(jnp.where(h_valid, jnp.maximum(hdr_ch[3], a), hdr_ch[3]))
        hdr_ch = out
        tri_id = jnp.where(h_vis["tri_id"] >= 0, h_vis["tri_id"], tri_id)

    return hdr_ch, tri_id


def _frame_band(
    ds, opaque_mask, transparent_mask, hud_mask,
    *,
    rw: int,
    band_h: int,
    rh_full: int,
    row_offset,
    shift_rows: bool,
    rw_full: int | None = None,
    col_offset=0,
    shift_cols: bool = False,
    use_mips: bool,
    has_morphs: bool,
    skin_sets: int,
    has_transparent: bool,
    has_hud: bool,
    n_transparent_layers: int,
    slot_mask,
    solid_env: bool,
    debug_mode: str,
    interpret,
    hooks,
    has_nearest: bool,
    needs_clip: bool,
    ext,
    has_uv1: bool,
    has_color: bool,
    light_tiles: bool = False,
    overlay_slot_mask=None,
    overlay_ext=None,
    ov_tri_idx=None,
    tile_cap: Optional[int] = None,
):
    """Single-scale band pipeline: opaque + overlay at the same resolution
    (the non-supersampled frame; the supersampled frame resolves between
    the two stages — see render_frame). Returns
    (hdr_ch planes, tri_id, depth (band_h, rw))."""
    hdr_ch, tri_id, depth = _opaque_band(
        ds, opaque_mask,
        rw=rw, band_h=band_h, rh_full=rh_full, row_offset=row_offset,
        shift_rows=shift_rows, rw_full=rw_full, col_offset=col_offset,
        shift_cols=shift_cols,
        use_mips=use_mips, has_morphs=has_morphs,
        skin_sets=skin_sets, slot_mask=slot_mask, solid_env=solid_env,
        debug_mode=debug_mode, interpret=interpret, hooks=hooks,
        has_nearest=has_nearest, needs_clip=needs_clip, ext=ext,
        has_uv1=has_uv1, has_color=has_color, light_tiles=light_tiles,
    )
    hdr_ch, tri_id = _overlay_band(
        hdr_ch, tri_id, depth, ds, transparent_mask, hud_mask,
        rw=rw, band_h=band_h, rh_full=rh_full, row_offset=row_offset,
        shift_rows=shift_rows, rw_full=rw_full, col_offset=col_offset,
        shift_cols=shift_cols,
        use_mips=use_mips, has_morphs=has_morphs,
        skin_sets=skin_sets, has_transparent=has_transparent,
        has_hud=has_hud, n_transparent_layers=n_transparent_layers,
        slot_mask=slot_mask, solid_env=solid_env, interpret=interpret,
        hooks=hooks, has_nearest=has_nearest, needs_clip=needs_clip,
        ext=ext, has_uv1=has_uv1, has_color=has_color,
        light_tiles=light_tiles,
        overlay_slot_mask=overlay_slot_mask, overlay_ext=overlay_ext,
    )
    return hdr_ch, tri_id, depth


def _opaque_band_msaa(
    ds, opaque_mask,
    *,
    rw2: int, band2_h: int, rh2_full: int,   # supersampled raster space
    rw1: int, band1_h: int, rh1_full: int,   # display (shading) space
    row_offset1,        # band start row in DISPLAY space
    shift_rows: bool,
    use_mips: bool,
    has_morphs: bool,
    skin_sets: int,
    slot_mask,
    solid_env: bool,
    debug_mode: str,
    interpret,
    hooks,
    has_nearest: bool,
    needs_clip: bool,
    ext,
    has_uv1: bool,
    has_color: bool,
    light_tiles: bool = False,
    tile_cap: Optional[int] = None,
    tile_rows: int = 8,
):
    """MSAA-4x-equivalent opaque stage: coverage + depth at 2x2 samples
    per display pixel (slim raster — ids and depth only), shading ONCE
    per display pixel on the top-left sample. This is hardware MSAA's
    actual cost model (multi-sample raster, per-pixel fragment shading —
    reference anti_alias.rs msaa_sample_count = None|4), unlike the
    brute-force `supersample` path which shades all 4 samples. The
    per-sample ids feed _msaa_edge_blend after shading.

    Returns (hdr_ch planes (band1_h*rw1,), samp = 4x (band1_h, rw1)
    sample-id planes [top-left/tr/bl/br], depth1 (band1_h, rw1))."""
    from ..ops.raster import _interpret_default, rasterize16_msaa

    if interpret is None:
        interpret = _interpret_default()
    assert band2_h == 2 * band1_h, (band2_h, band1_h)
    rows, key = _run_vertex(
        ds, opaque_mask, rw=rw2, rh_full=rh2_full,
        row_offset=2 * row_offset1, shift_rows=shift_rows,
        has_morphs=has_morphs, skin_sets=skin_sets, needs_clip=needs_clip)
    srows = prep_setup_rows(rows, key)
    # MSAA-native raster: the kernel emits the 4 per-sample id planes +
    # min depth at DISPLAY layout directly (the former rasterize at 2x +
    # [i::2, j::2] sample extraction paid ~100 ms of lane-strided-slice
    # gathers at 1080p — see rasterize16_msaa)
    samp_raw, depth1_raw = rasterize16_msaa(
        srows, width2=rw2, height2=band2_h, interpret=interpret)

    w_half = rw2 // 2
    def _fit_cols(p, fill):
        if w_half == rw1:
            return p
        if w_half > rw1:
            return p[:, :rw1]
        return jnp.pad(p, ((0, 0), (0, rw1 - w_half)),
                       constant_values=fill)

    samp = [_fit_cols(s, -1) for s in samp_raw]
    depth1 = _fit_cols(depth1_raw, 1.0)

    if debug_mode == "edges":
        # MSAA edge-detect view (reference: material_opaque compute.wgsl
        # MSAA variant's edge detection, surfaced by debug_to_copy.wgsl):
        # white where the pixel's 4 coverage samples disagree on the
        # winner (the per-sample resolve does real work there), dim gray
        # on interior coverage, black on miss. Skips shading entirely.
        rep0 = samp[0]
        edge = ((samp[1] != rep0) | (samp[2] != rep0) | (samp[3] != rep0))
        v = jnp.where(edge, 1.0,
                      jnp.where(rep0 >= 0, 0.15, 0.0)) \
            .reshape(band1_h * rw1).astype(jnp.float32)
        cov = (rep0 >= 0).reshape(band1_h * rw1).astype(jnp.float32)
        return [v, v, v, cov], samp, depth1

    from ..ops.shade import RESOLVE_NAMES, resolve_planes_fused

    rep = samp[0]
    # barrier: rep is the deswizzled Pallas output — a transpose XLA
    # turns into a layout BITCAST, and a gather whose index operand
    # carries that swizzled layout runs ~8x slow (31.6 ms vs 3.9 ms for
    # the b0 table gather at 1080p, profiled). The barrier materializes
    # the indices once in canonical layout (~1 ms relayout copy).
    rep_flat = jax.lax.optimization_barrier(rep.reshape(band1_h * rw1))

    # covered-tile compaction: skip resolve + PBR work on pure-sky tiles
    # (shade.py shade_deferred_compact_c). Solid env fills skipped tiles
    # with the constant; image envs ride the texel-pool env rows
    # (ds["env_pool_base"]) — per-pixel sky for skipped tiles is one
    # O(sky pixels) gather into the same table. Hooks see full-frame
    # vis planes, so compaction is skipped with an after_geometry hook.
    n_units = ((band1_h // tile_rows) * (rw1 // 128)
               if band1_h % tile_rows == 0 else 0)
    if (tile_cap is not None and (solid_env or "env_pool_base" in ds)
            and band1_h % 8 == 0 and rw1 % 128 == 0
            and band1_h % tile_rows == 0
            and (min(tile_cap, n_units) * tile_rows) % 8 == 0
            and tile_cap * tile_rows * 128 < band1_h * rw1
            and not (hooks and hooks.after_geometry)):
        from ..ops.shade import shade_deferred_compact_c

        hdr_ch = shade_deferred_compact_c(
            rep_flat, srows, depth1.reshape(band1_h * rw1), ds,
            width=rw1, height=band1_h, height_full=rh1_full,
            row_offset=row_offset1,
            resolve_row_offset=0 if shift_rows else row_offset1,
            coord_scale=2, use_mips=use_mips, slot_mask=slot_mask,
            solid_env=solid_env, has_nearest=has_nearest, ext=ext,
            debug_mode=debug_mode, tile_cap=tile_cap, interpret=interpret,
            tile_rows=tile_rows, light_tiles=light_tiles,
        )
        return hdr_ch, samp, depth1

    vis = resolve_planes_fused(
        rep_flat, srows, width=rw1, height_full=rh1_full,
        row_offset=0 if shift_rows else row_offset1, coord_scale=2,
        interpret=interpret)
    vis = {k: vis[k] for k in RESOLVE_NAMES}
    vis["depth"] = depth1.reshape(band1_h * rw1)
    if hooks and hooks.after_geometry:
        vis = hooks.after_geometry(vis, ds)
    hdr_ch = shade_deferred_c(
        vis, ds,
        width=rw1, height=band1_h, height_full=rh1_full,
        row_offset=row_offset1,
        use_mips=use_mips, slot_mask=slot_mask,
        solid_env=solid_env, has_nearest=has_nearest, ext=ext,
        debug_mode=debug_mode, light_tiles=light_tiles,
    )
    return hdr_ch, samp, depth1


def _msaa_edge_blend(hdr_ch, samp, H: int, W: int):
    """Per-sample MSAA resolve in image space: each of a pixel's 4
    coverage samples contributes the shaded color of the pixel whose
    winner triangle matches it — its own pixel when the ids agree
    (interior: all 4 match, the blend is the identity), otherwise the
    nearest neighbor toward the sample's quadrant (axis neighbors first,
    then the diagonal; fallback own pixel). Pure rolls + selects — the
    TPU analog of the reference's MSAA edge-detect per-sample resolve
    (material_opaque compute.wgsl MSAA variant). Runs OUTSIDE shard_map:
    under pjit the rolls become GSPMD halo exchanges."""
    rep = samp[0]
    imgs = [c.reshape(H, W) for c in hdr_ch]
    acc = [jnp.zeros_like(imgs[0]) for _ in range(4)]
    for s_idx, (i, j) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        ts = samp[s_idx]
        if s_idx == 0:
            acc = [a + im for a, im in zip(acc, imgs)]   # ts == rep always
            continue
        dy = -1 if i == 0 else 1
        dx = -1 if j == 0 else 1
        chosen = list(imgs)
        found = ts == rep
        for (oy, ox) in ((0, dx), (dy, 0), (dy, dx)):
            ntid = jnp.roll(rep, (-oy, -ox), axis=(0, 1))   # value at p+(oy,ox)
            m = (~found) & (ntid == ts)
            chosen = [jnp.where(m, jnp.roll(im, (-oy, -ox), axis=(0, 1)), c)
                      for im, c in zip(imgs, chosen)]
            found = found | m
        acc = [a + c for a, c in zip(acc, chosen)]
    return [(a * 0.25).reshape(H * W) for a in acc]


def _resolve_supersample(hdr_ch, tri_id, depth, *, width: int, height: int,
                         rw2: int, rw1: int, rh1: int):
    """2×2 box-resolve of the supersampled opaque HDR down to display
    resolution, re-padded onto the 1× raster grid. Linear-HDR resolve,
    like the reference's MSAA resolve of its Rgba16float opaque target at
    the opaque→transparent blit (render.rs:224-261). Depth resolves with
    min (nearest sample — conservative occlusion for the transparent
    peel); tri_id takes the top-left sample (picking is per display
    pixel). Pads: tri_id=-1 (miss), depth=0.0 (fully occluded — no
    transparent work lands in padding, which is cropped anyway)."""
    h2, w2 = height * 2, width * 2
    hdr_ch = [c.reshape(-1, rw2)[:h2, :w2]
              .reshape(height, 2, width, 2).mean(axis=(1, 3))
              for c in hdr_ch]
    tri_id = tri_id[:h2:2, :w2:2]
    depth = depth[:h2, :w2].reshape(height, 2, width, 2).min(axis=(1, 3))
    pad = ((0, rh1 - height), (0, rw1 - width))
    hdr_ch = [jnp.pad(c, pad).reshape(rh1 * rw1) for c in hdr_ch]
    tri_id = jnp.pad(tri_id, pad, constant_values=-1)
    depth = jnp.pad(depth, pad)
    return hdr_ch, tri_id, depth


def _finish_frame(
    hdr_ch, tri_id, depth, ds,
    *,
    rw: int, rh: int,
    width: int, height: int,
    tonemap: ToneMapping,
    bloom: bool, dof: bool, smaa: bool,
    hooks,
    dof_rings=None,
):
    """Image-space frame tail at display resolution: crop padding, effects
    chain (bloom ping-pong, DoF — render.rs step 12), tonemap display
    pass, SMAA. Pure image ops on (H, W) arrays — under pjit with a
    row-sharded input, GSPMD inserts the halo exchanges these stencils
    need, which is exactly the XLA-native replacement for hand-written
    boundary passing. (The supersample resolve happens earlier, before
    the transparent/HUD overlay — _resolve_supersample.)"""
    hdr_ch = [c.reshape(rh, rw)[:height, :width] for c in hdr_ch]
    tri_id = tri_id[:height, :width]
    depth = depth[:height, :width]

    # effects stay on per-channel (H, W) planes: the AoS (H, W, 4) chain
    # ran at 4/128 lane utilization (~25 ms of blur/select fusions at
    # 1080p — f32[8294400] ops in the profile); planes run the same math
    # in ~3 ms (ops/effects.py banner)
    rgb = hdr_ch[:3]
    if bloom:
        rgb = bloom_c(rgb)
    if dof and dof_rings != ():
        # dof_rings: host-proven active ring subset (effects.py
        # dof_active_rings); () = the pass is exactly the identity (the
        # WGSL coc<0.5 early-out, decided at specialization time)
        from ..ops.effects import DOF_RING_SCALES

        rgb = depth_of_field_c(
            rgb, depth, ds["camera"],
            rings=DOF_RING_SCALES if dof_rings is None else dof_rings)
    hdr_ch = rgb + hdr_ch[3:]

    ldr_ch = display_pass_c(hdr_ch, tonemap)
    # ---- SMAA runs on the display image (effects_wgsl/helpers/smaa.wgsl) -----
    if smaa:
        ldr_ch = smaa_c(ldr_ch[:3]) + ldr_ch[3:]
    ldr = jnp.stack(ldr_ch, axis=-1)
    if hooks and hooks.last_pass:
        ldr = hooks.last_pass(ldr, ds)
    return ldr, tri_id, depth


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "supersample", "msaa", "tonemap", "use_mips",
        "has_morphs", "skin_sets", "has_transparent", "has_hud",
        "n_transparent_layers", "slot_mask", "solid_env", "debug_mode",
        "interpret", "bloom", "dof", "smaa", "hooks", "has_nearest",
        "max_bins", "needs_clip", "ext", "has_uv1", "has_color",
        "overlay_slot_mask", "overlay_ext", "overlay_crop_h",
        "overlay_tile_cap", "opaque_tile_cap", "opaque_tile_rows",
        "dof_rings", "light_tiles",
    ),
)
def render_frame(
    ds,                 # DeviceScene dict (all jnp arrays)
    opaque_mask,        # (Mcap,) bool — visible opaque meshes this frame
    transparent_mask=None,
    hud_mask=None,
    *,
    width: int,         # output width (pre-supersample)
    height: int,
    supersample: bool,
    msaa: bool = False,
    tonemap: ToneMapping,
    use_mips: bool,
    has_morphs: bool,
    skin_sets: int,
    has_transparent: bool = False,
    has_hud: bool = False,
    n_transparent_layers: int = 4,
    slot_mask: Tuple[bool, ...] = ALL_SLOTS,
    solid_env: bool = False,
    debug_mode: str = "none",
    interpret: bool | None = None,
    bloom: bool = False,
    dof: bool = False,
    smaa: bool = False,
    hooks: Optional[RenderHooks] = None,
    has_nearest: bool = True,
    max_bins: int = 256,
    needs_clip: bool = True,
    ext=None,
    has_uv1: bool = True,
    has_color: bool = True,
    overlay_slot_mask: Optional[Tuple[bool, ...]] = None,
    overlay_ext: Optional[Tuple[bool, ...]] = None,
    overlay_crop_y0=None,
    overlay_crop_h: Optional[int] = None,
    overlay_tri_idx=None,
    overlay_tile_cap: Optional[int] = None,
    opaque_tile_cap: Optional[int] = None,
    opaque_tile_rows: int = 8,
    dof_rings=None,
    light_tiles: bool = False,
):
    """Returns (display_rgba (H,W,4) f32 in [0,1], tri_id (H,W) i32, depth).

    Composition: _frame_band over the whole framebuffer (one band) +
    _finish_frame. The fat visibility buffer is intentional: the raster
    interpolates every attribute plane in one pass (a slim (tri_id, depth)
    buffer + post-raster resolve gather was benched at 1080p and LOST
    ~50 ms — any second 2M-row gather in the same XLA computation costs
    ~25-45 ms; the slim path stays available for sparse coverage)."""
    from ..ops.shade import ALL_EXT

    if ext is None:
        ext = ALL_EXT
    assert not (supersample and msaa), "pick one AA mode"
    if hooks and hooks.first_pass:
        ds = hooks.first_pass(ds)
    scale = 2 if supersample else 1
    rw2 = _pad_to(width * scale, TILE_W)
    rh2 = _pad_to(height * scale, TILE_H)
    rw1 = _pad_to(width, TILE_W)
    rh1 = _pad_to(height, TILE_H)

    common = dict(
        use_mips=use_mips, has_morphs=has_morphs, skin_sets=skin_sets,
        slot_mask=slot_mask, solid_env=solid_env,
        interpret=interpret, hooks=hooks, has_nearest=has_nearest,
        needs_clip=needs_clip, ext=ext, has_uv1=has_uv1, has_color=has_color,
        light_tiles=light_tiles,
    )
    if msaa:
        hdr_ch, samp, depth = _opaque_band_msaa(
            ds, opaque_mask,
            rw2=_pad_to(width * 2, TILE_W), band2_h=2 * rh1, rh2_full=2 * rh1,
            rw1=rw1, band1_h=rh1, rh1_full=rh1,
            row_offset1=0, shift_rows=False, debug_mode=debug_mode,
            tile_cap=opaque_tile_cap, tile_rows=opaque_tile_rows, **common,
        )
        if debug_mode != "edges":     # keep the edge VIEW crisp
            hdr_ch = _msaa_edge_blend(hdr_ch, samp, rh1, rw1)
        tri_id = samp[0]
    else:
        hdr_ch, tri_id, depth = _opaque_band(
            ds, opaque_mask,
            rw=rw2, band_h=rh2, rh_full=rh2, row_offset=0, shift_rows=False,
            debug_mode=debug_mode, **common,
        )
    if scale == 2:
        # resolve BEFORE the overlay: the transparent peel + HUD then run
        # at display resolution (reference: MSAA opaque resolve at the
        # opaque→transparent blit, render.rs:224-261). Also what keeps the
        # K-layer peel's gathers O(display pixels) instead of O(4x).
        hdr_ch, tri_id, depth = _resolve_supersample(
            hdr_ch, tri_id, depth,
            width=width, height=height, rw2=rw2, rw1=rw1, rh1=rh1)
    hdr_ch, tri_id = _overlay_band(
        hdr_ch, tri_id, depth, ds, transparent_mask, hud_mask,
        rw=rw1, band_h=rh1, rh_full=rh1, row_offset=0, shift_rows=False,
        use_mips=use_mips, has_morphs=has_morphs, skin_sets=skin_sets,
        has_transparent=has_transparent, has_hud=has_hud,
        n_transparent_layers=n_transparent_layers, slot_mask=slot_mask,
        solid_env=solid_env, interpret=interpret, hooks=hooks,
        has_nearest=has_nearest, needs_clip=needs_clip, ext=ext,
        has_uv1=has_uv1, has_color=has_color, light_tiles=light_tiles,
        overlay_slot_mask=overlay_slot_mask, overlay_ext=overlay_ext,
        crop_y0=overlay_crop_y0, crop_h=overlay_crop_h,
        ov_tri_idx=overlay_tri_idx, tile_cap=overlay_tile_cap,
    )
    ldr, tri_id, depth = _finish_frame(
        hdr_ch, tri_id, depth, ds,
        rw=rw1, rh=rh1, width=width, height=height,
        tonemap=tonemap, bloom=bloom, dof=dof, smaa=smaa, hooks=hooks,
        dof_rings=dof_rings,
    )

    # picking ids in original triangle-pool space (clipping doubles columns)
    T_pool = _total_triangles(ds)
    tri_id = jnp.where(tri_id >= 0, tri_id % T_pool, -1)
    return ldr, tri_id, depth


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "tonemap", "use_mips",
        "has_morphs", "skin_sets", "has_transparent", "has_hud",
        "n_transparent_layers", "slot_mask", "solid_env",
        "interpret", "bloom", "dof", "smaa", "hooks", "has_nearest",
        "needs_clip", "ext", "has_uv1", "has_color",
        "overlay_slot_mask", "overlay_ext", "overlay_crop_h",
        "overlay_tile_cap", "dof_rings", "light_tiles",
        "shade_cap", "alpha",
    ),
    # donate the 42-MB history (+ age) so the steady-state loop updates
    # ONE buffer in place: without donation every frame allocates a
    # fresh history and the old ones free lazily through the relay —
    # measured as an upward ms/frame drift over a ~200-frame run
    donate_argnames=("hist", "age"),
)
def render_frame_temporal(
    ds,
    opaque_mask,
    transparent_mask=None,
    hud_mask=None,
    hist=None,          # (5, rh1, rw1) f32 history [r,g,b,tid,depth]
    age=None,           # (n_units,) i32 frames since each unit shaded
    *,
    width: int,
    height: int,
    tonemap: ToneMapping,
    use_mips: bool,
    has_morphs: bool,
    skin_sets: int,
    has_transparent: bool = False,
    has_hud: bool = False,
    n_transparent_layers: int = 4,
    slot_mask: Tuple[bool, ...] = ALL_SLOTS,
    solid_env: bool = False,
    interpret: bool | None = None,
    bloom: bool = False,
    dof: bool = False,
    smaa: bool = False,
    hooks: Optional[RenderHooks] = None,
    has_nearest: bool = True,
    needs_clip: bool = True,
    ext=None,
    has_uv1: bool = True,
    has_color: bool = True,
    overlay_slot_mask: Optional[Tuple[bool, ...]] = None,
    overlay_ext: Optional[Tuple[bool, ...]] = None,
    overlay_crop_y0=None,
    overlay_crop_h: Optional[int] = None,
    overlay_tri_idx=None,
    overlay_tile_cap: Optional[int] = None,
    dof_rings=None,
    light_tiles: bool = False,
    shade_cap: int = 512,
    alpha: float = 0.12,
):
    """Temporal-reuse frame (TAA): the different COST MODEL the measured
    ~29 ms floor analysis calls for (BASELINE.md) — shade only what the
    previous frame cannot answer for.

    The reference carries this path's scaffolding unused (camera.rs:13
    APPLY_JITTER=false, get_halton_jitter :257, frame_count uniform);
    here it is live. Per frame:

      1. slim geometry at 1x display resolution with the JITTERED camera
         (ids + depth only — replaces the MSAA sample raster; the AA now
         comes from jitter accumulation, not coverage samples),
      2. reproject the (5, rh1, rw1) history through the UNJITTERED
         current + previous matrices (ops/temporal.py), validating per
         pixel by winner-id + depth agreement,
      3. shade a fixed budget of `shade_cap` (8, 128) units — invalid
         units first, then age-due refresh (shade_units_c, the compact
         shade machinery with the unit choice externalized),
      4. temporal resolve with 3x3 neighborhood clamp (temporal_merge);
         the merged pre-overlay opaque HDR becomes the new history,
      5. transparent/HUD overlay + effects + display run per frame as in
         render_frame (they already pay O(their coverage), not O(frame)).

    The shade budget is a STATIC cost: a mostly-valid frame (slow orbit)
    pays O(shade_cap) shading instead of O(covered units). Overflow
    (invalid units beyond the cap) displays the best stand-in and stays
    invalid, so the next frames repair it — correctness is eventual
    (bounded by n_units/shade_cap frames), display is never undefined.

    Returns (ldr, tri_id, depth, new_hist, new_age). In-jit hooks that
    reshape the opaque stage (first_pass / after_geometry) are not
    supported here — the renderer falls back to render_frame."""
    from ..ops.raster import rasterize16_slim, _interpret_default
    from ..ops.shade import ALL_EXT, _tile_swizzle, shade_units_c
    from ..ops.temporal import (
        reproject_history, select_units, temporal_merge, temporal_offsets,
    )

    if ext is None:
        ext = ALL_EXT
    assert hist is not None and age is not None
    assert not (hooks and (hooks.first_pass or hooks.after_geometry)), \
        "temporal frame does not support opaque-stage hooks"
    if interpret is None:
        interpret = _interpret_default()
    rw1 = _pad_to(width, TILE_W)
    rh1 = _pad_to(height, TILE_H)
    P = rh1 * rw1
    th = 8
    U = th * 128

    # ---- 1. slim geometry (jittered camera) -----------------------------
    srows = prep_setup_rows(*_run_vertex(
        ds, opaque_mask, rw=rw1, rh_full=rh1, row_offset=0,
        shift_rows=False, has_morphs=has_morphs, skin_sets=skin_sets,
        needs_clip=needs_clip))
    col, depth = rasterize16_slim(srows, width=rw1, height=rh1,
                                  interpret=interpret)

    # ---- 2. reproject + validate (unjittered matrices) -------------------
    off_x, off_y, exp_z = temporal_offsets(
        ds["camera"], depth, width=rw1, height=rh1)
    rep_r, rep_g, rep_b, valid, blendable = reproject_history(
        hist, off_x, off_y, exp_z, col, width=rw1, height=rh1,
        interpret=interpret)

    # ---- 3. shade the budgeted unit set ----------------------------------
    idx, shaded_unit = select_units(
        valid, age, width=rw1, height=rh1, shade_cap=shade_cap)
    C = idx.shape[0]
    tid_c = jnp.take(_tile_swizzle(col, rh1, rw1, th), idx,
                     axis=0).reshape(C * U)
    dep_c = jnp.take(_tile_swizzle(depth, rh1, rw1, th), idx,
                     axis=0).reshape(C * U)
    out_c, _valid_c = shade_units_c(
        tid_c, dep_c, idx, srows, ds,
        width=rw1, height_full=rh1, row_offset=0, resolve_row_offset=0,
        coord_scale=1, th=th, use_mips=use_mips, slot_mask=slot_mask,
        solid_env=solid_env, has_nearest=has_nearest, ext=ext,
        debug_mode="none", interpret=interpret, light_tiles=light_tiles,
    )
    n_units = (rh1 // th) * (rw1 // 128)
    from ..ops.shade import _tile_unswizzle

    new_ch = [_tile_unswizzle(
        jnp.zeros((n_units, U), jnp.float32).at[idx]
        .set(out_c[c].reshape(C, U)), rh1, rw1, th) for c in range(3)]
    shaded_px = _tile_unswizzle(
        jnp.zeros((n_units, U), bool).at[idx].set(True), rh1, rw1, th)

    # ---- 4. temporal resolve + new history -------------------------------
    merged, new_hist, cov = temporal_merge(
        new_ch, shaded_px, [rep_r, rep_g, rep_b], valid, blendable,
        hist, col, depth, width=rw1, height=rh1, alpha=alpha)
    new_age = jnp.where(shaded_unit, 0, age + 1)
    hdr_ch = merged + [cov]

    # ---- 5. overlay + effects + display (as render_frame) ----------------
    tri_id = col.reshape(rh1, rw1)
    depth2 = depth.reshape(rh1, rw1)
    hdr_ch, tri_id = _overlay_band(
        hdr_ch, tri_id, depth2, ds, transparent_mask, hud_mask,
        rw=rw1, band_h=rh1, rh_full=rh1, row_offset=0, shift_rows=False,
        use_mips=use_mips, has_morphs=has_morphs, skin_sets=skin_sets,
        has_transparent=has_transparent, has_hud=has_hud,
        n_transparent_layers=n_transparent_layers, slot_mask=slot_mask,
        solid_env=solid_env, interpret=interpret, hooks=hooks,
        has_nearest=has_nearest, needs_clip=needs_clip, ext=ext,
        has_uv1=has_uv1, has_color=has_color, light_tiles=light_tiles,
        overlay_slot_mask=overlay_slot_mask, overlay_ext=overlay_ext,
        crop_y0=overlay_crop_y0, crop_h=overlay_crop_h,
        ov_tri_idx=overlay_tri_idx, tile_cap=overlay_tile_cap,
    )
    ldr, tri_id, depth2 = _finish_frame(
        hdr_ch, tri_id, depth2, ds,
        rw=rw1, rh=rh1, width=width, height=height,
        tonemap=tonemap, bloom=bloom, dof=dof, smaa=smaa, hooks=hooks,
        dof_rings=dof_rings,
    )
    T_pool = _total_triangles(ds)
    tri_id = jnp.where(tri_id >= 0, tri_id % T_pool, -1)
    return ldr, tri_id, depth2, new_hist, new_age
