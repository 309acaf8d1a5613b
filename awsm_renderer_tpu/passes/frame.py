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
from ..ops.effects import bloom as bloom_pass
from ..ops.effects import depth_of_field, smaa as smaa_pass
from ..ops.raster import (
    TILE_H, TILE_W, pad_setup, pad_setup_rows, rasterize, rasterize_layers,
    rasterize_layers_rows, rasterize_rows,
)
from ..ops.shade import (
    ALL_SLOTS, shade_deferred_c, shade_surface, shade_transparent_layers_c,
)
from ..ops.tonemap import display_pass_c
from ..ops.vertex import vertex_stage


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class RenderHooks:
    """Extension points inside the jitted frame (reference: render.rs:28-46
    RenderHooks — pre_render, after_geometry_pass, before/after_transparent,
    last_pass). Hooks are traceable jax functions; swapping a hook set is a
    retrace, like the reference's hook-driven pipeline rebuilds.

    Signatures:
      after_geometry(vis: dict, ds) -> vis dict
      before_transparent(hdr, depth, ds) -> hdr
      after_transparent(hdr, ds) -> hdr
      last_pass(ldr, ds) -> ldr
    """

    after_geometry: Optional[Callable] = None
    before_transparent: Optional[Callable] = None
    after_transparent: Optional[Callable] = None
    last_pass: Optional[Callable] = None


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


def _frame_band(
    ds, opaque_mask, transparent_mask, hud_mask,
    *,
    rw: int,            # padded render width (supersampled space)
    band_h: int,        # this band's height (TILE_H multiple)
    rh_full: int,       # full padded render height
    row_offset,         # band start row (traced ok; 0 = single device)
    shift_rows: bool,   # translate setup into band-local coordinates
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
):
    """Geometry + shading for one horizontal framebuffer band: vertex →
    raster → deferred opaque shade → transparent peel → HUD, all in the
    production channel-plane layout. The single-device frame is the
    band_h == rh_full, row_offset == 0 case; the row-sharded frame maps
    this over devices (parallel/sharding.py). Returns
    (hdr_ch [r,g,b,a] (band_h*rw,) planes, tri_id, depth (band_h, rw))."""

    def run_vertex(mask):
        rows, key = vertex_stage(
            ds["c_pos"], ds["c_norm"], ds["c_tang"], ds["c_uv0"], ds["c_uv1"],
            ds["c_color"], ds["c_joints"], ds["c_weights"], ds["c_morph_base"],
            ds["morph_deltas"], ds["tri_mesh"], ds["mesh_info"],
            ds["morph_weights"], ds["world"], ds["normal_mat"],
            ds["joint_matrices"], ds["camera"]["view_proj"], mask,
            width=rw, height=rh_full, has_morphs=has_morphs,
            skin_sets=skin_sets, needs_clip=needs_clip,
        )
        if shift_rows:
            rows = _shift_rows_band(rows, row_offset)
        return rows, key

    # ---- geometry + opaque shade (render.rs steps 1, 6) ---------------------
    sorted_rows = prep_setup_rows(*run_vertex(opaque_mask))
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
        use_mips=use_mips, slot_mask=slot_mask,
        solid_env=solid_env, has_nearest=has_nearest, ext=ext,
        debug_mode=debug_mode,
    )
    tri_id = vis["tri_id"]
    depth = vis["depth"]

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
        layers = rasterize_layers_rows(
            t_rows, depth, width=rw, height=band_h,
            n_layers=n_transparent_layers, interpret=interpret,
            has_uv1=has_uv1, has_color=has_color, analytic_derivs=False,
        )
        hdr_ch = shade_transparent_layers_c(
            layers, hdr_ch, ds,
            width=rw, height=band_h, height_full=rh_full,
            row_offset=row_offset,
            use_mips=use_mips, slot_mask=slot_mask, solid_env=solid_env,
            has_nearest=has_nearest, ext=ext,
            n_layers=n_transparent_layers,
        )

    if hooks and hooks.after_transparent:
        hdr_ch = _unstack(hooks.after_transparent(_stack(hdr_ch), ds))

    # ---- HUD pass (render.rs step 2/10: HUD geometry, own cleared depth) ----
    if has_hud and hud_mask is not None:
        h_rows = prep_setup_rows(*run_vertex(hud_mask))
        h_vis = rasterize_rows(h_rows, width=rw, height=band_h,
                               interpret=interpret, has_uv1=has_uv1,
                               has_color=has_color, analytic_derivs=False)
        P = rw * band_h
        h_planes = {k: v.reshape(P) for k, v in h_vis.items()}
        h_color, h_alpha, h_valid, _ = shade_surface(
            h_planes, ds,
            width=rw, height=band_h, height_full=rh_full,
            row_offset=row_offset,
            use_mips=use_mips, slot_mask=slot_mask, solid_env=solid_env,
            has_nearest=has_nearest, ext=ext,
        )
        a = jnp.where(h_valid, h_alpha, 0.0)
        out = [jnp.where(h_valid, h_color[c] * a + hdr_ch[c] * (1 - a),
                         hdr_ch[c]) for c in range(3)]
        out.append(jnp.where(h_valid, jnp.maximum(hdr_ch[3], a), hdr_ch[3]))
        hdr_ch = out
        tri_id = jnp.where(h_vis["tri_id"] >= 0, h_vis["tri_id"], tri_id)

    return hdr_ch, tri_id, depth


def _finish_frame(
    hdr_ch, tri_id, depth, ds,
    *,
    rw: int, rh: int,
    width: int, height: int,
    scale: int,
    tonemap: ToneMapping,
    bloom: bool, dof: bool, smaa: bool,
    hooks,
):
    """Image-space frame tail: crop padding, supersample-resolve in linear
    HDR, effects chain (bloom ping-pong, DoF — render.rs step 12), tonemap
    display pass, SMAA. Pure image ops on (H, W) arrays — under pjit with a
    row-sharded input, GSPMD inserts the halo exchanges these stencils
    need, which is exactly the XLA-native replacement for hand-written
    boundary passing."""
    hdr_ch = [c.reshape(rh, rw)[: height * scale, : width * scale]
              for c in hdr_ch]
    tri_id = tri_id[: height * scale, : width * scale]
    depth = depth[: height * scale, : width * scale]
    if scale == 2:
        hdr_ch = [c.reshape(height, 2, width, 2).mean(axis=(1, 3))
                  for c in hdr_ch]
        tri_id = tri_id[::2, ::2]
        depth = depth.reshape(height, 2, width, 2).min(axis=(1, 3))

    if bloom or dof:
        hdr = jnp.stack(hdr_ch, axis=-1)
        if bloom:
            hdr = bloom_pass(hdr)
        if dof:
            hdr = depth_of_field(hdr, depth, ds["camera"])
        hdr_ch = [hdr[..., c] for c in range(4)]

    ldr_ch = display_pass_c(hdr_ch, tonemap)
    ldr = jnp.stack(ldr_ch, axis=-1)
    # ---- SMAA runs on the display image (effects_wgsl/helpers/smaa.wgsl) -----
    if smaa:
        ldr = smaa_pass(ldr)
    if hooks and hooks.last_pass:
        ldr = hooks.last_pass(ldr, ds)
    return ldr, tri_id, depth


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "supersample", "tonemap", "use_mips",
        "has_morphs", "skin_sets", "has_transparent", "has_hud",
        "n_transparent_layers", "slot_mask", "solid_env", "debug_mode",
        "interpret", "bloom", "dof", "smaa", "hooks", "has_nearest", "max_bins", "needs_clip", "ext", "has_uv1", "has_color",
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
    scale = 2 if supersample else 1
    rw = _pad_to(width * scale, TILE_W)
    rh = _pad_to(height * scale, TILE_H)

    hdr_ch, tri_id, depth = _frame_band(
        ds, opaque_mask, transparent_mask, hud_mask,
        rw=rw, band_h=rh, rh_full=rh, row_offset=0, shift_rows=False,
        use_mips=use_mips, has_morphs=has_morphs, skin_sets=skin_sets,
        has_transparent=has_transparent, has_hud=has_hud,
        n_transparent_layers=n_transparent_layers, slot_mask=slot_mask,
        solid_env=solid_env, debug_mode=debug_mode, interpret=interpret,
        hooks=hooks, has_nearest=has_nearest, needs_clip=needs_clip,
        ext=ext, has_uv1=has_uv1, has_color=has_color,
    )
    ldr, tri_id, depth = _finish_frame(
        hdr_ch, tri_id, depth, ds,
        rw=rw, rh=rh, width=width, height=height, scale=scale,
        tonemap=tonemap, bloom=bloom, dof=dof, smaa=smaa, hooks=hooks,
    )

    # picking ids in original triangle-pool space (clipping doubles columns)
    T_pool = ds["tri_mesh"].shape[0]
    tri_id = jnp.where(tri_id >= 0, tri_id % T_pool, -1)
    return ldr, tri_id, depth
