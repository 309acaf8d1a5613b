"""Pallas tile-based triangle rasterizer → visibility buffer.

TPU-native replacement for the reference's hardware-raster geometry pass
(crates/renderer/src/render_passes/geometry/: one draw per mesh writing a
4-target visibility G-buffer). Here ONE kernel rasterizes the whole packed
triangle pool into per-pixel planes:

    tri_id (H,W) i32   — setup-column index, -1 = miss (original triangle
                          = tri_id % T_pool; the reference packs split16
                          triangle_index + meta offset into Rgba16uint)
    mat_row            — per-pixel material row (flat attribute)
    uv0/uv1/color/normal/tangent — perspective-correct interpolated vertex
                          attributes (see _PLANE_NAMES); the reference
                          stores packed normal/tangent + barycentrics and
                          re-interpolates in the shade kernel — on TPU we
                          interpolate here so shading needs no gathers
    du0_*/dv0_*        — analytic uv0 screen derivatives (the reference's
                          barycentric_derivatives target, pre-multiplied)
    depth (H,W) f32    — NDC z in [0,1], cleared to 1.0, LESS compare

Kernel shape: grid = (tiles_y, tiles_x, triangle_chunks); each (8,128)
pixel tile revisits its VMEM accumulators across the chunk axis (matmul
accumulator pattern), merging CHUNK triangles per step in sub-groups of 8
fully vectorized (8 triangles × 1024 pixels on the VPU — no per-triangle
scalar loop, no dynamic indexing). A per-chunk conservative screen bbox in
SMEM lets a tile skip entire chunks with 4 scalar compares; Morton-sorted
input (passes/frame.py) keeps those bboxes tight.

Fill convention: top-left (WebGPU/D3D/Vulkan raster rule) with pixel
centers at +0.5, so shared edges shade exactly once — required for
pixel-exact parity with the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vertex import (
    NSETUP,
    S_BB_MAXX, S_BB_MAXY, S_BB_MINX, S_BB_MINY,
    S_COLOR, S_E0A, S_E0B, S_E0C, S_E1A, S_E1B, S_E1C,
    S_E2A, S_E2B, S_E2C, S_IW0, S_IW1, S_IW2, S_MAT_ROW, S_NORMAL,
    S_ORIG_ID, S_TANGENT, S_TANGENT_W, S_UV0, S_UV1,
    S_ZA, S_ZB, S_ZC,
)

# smallest normal f32: E >= _FMIN ⟺ E > 0 for any non-degenerate edge
# value (TPU flushes denormals; edge functions are either exactly 0 or
# >= ~1e-12 in magnitude at screen scale)
_FMIN = 1.1754943508222875e-38

TILE_H = 8
TILE_W = 128
# Binned-kernel LOGICAL tile: the 1024 lanes of a vector op are mapped to a
# 32x32 pixel block instead of the native 8x128 — small triangles overlap
# ~1.5x fewer square tiles than short-wide ones, which directly scales the
# dominant merge-ALU cost. Outputs leave the kernel tile-swizzled
# (n_tiles, 1024) and are de-swizzled by one cheap XLA transpose.
BT_H = 32
BT_W = 32
CHUNK = 128          # triangles DMA'd per grid step
SUB = 8              # triangles merged per vector op
_BIG = 3.0e38

# G-buffer planes: id/depth/material + interpolated vertex attributes +
# uv0 screen derivatives (the reference packs normals/tangents/barycentric
# derivatives into its G-buffer the same way; we add uv/color so shading
# needs no per-triangle gathers at all — gathers are TPU poison).
# uv1 / vertex-color planes are statically elided when the scene never
# uses them (shader-template-style specialization; shading substitutes
# defaults).
def plane_layout(has_uv1: bool = True, has_color: bool = True,
                 slim: bool = False, analytic_derivs: bool = True):
    """→ (plane_names tuple, attr setup-row tuple).

    slim=True emits only (tri_id, depth): the production frame resolves
    every attribute plane AFTER rasterization with one batched setup-row
    gather (ops/shade.py::resolve_gbuffer) — a lone 2M-row gather costs
    ~2-8 ms while interpolating 17 attribute planes inside the merge
    loop costs ~50 ms of VPU time at 1080p. The full layout remains for
    direct unit tests of the kernel.

    analytic_derivs=False omits the du0/dv0 planes: shading then derives
    the uv gradients by screen-space differencing of the uv0 planes (the
    GPU quad-derivative model, min-magnitude forward/backward picks) —
    saving ~25% of the per-fragment merge ALU."""
    if slim:
        return ("tri_id", "depth"), ()
    names = ["tri_id", "depth", "mat_row", "uv0_u", "uv0_v"]
    rows = [S_UV0, S_UV0 + 3]
    if has_uv1:
        names += ["uv1_u", "uv1_v"]
        rows += [S_UV1, S_UV1 + 3]
    if has_color:
        names += ["color_r", "color_g", "color_b", "color_a"]
        rows += [S_COLOR + 3 * c for c in range(4)]
    names += ["normal_x", "normal_y", "normal_z",
              "tangent_x", "tangent_y", "tangent_z", "tangent_w"]
    rows += [S_NORMAL + 3 * c for c in range(3)]
    rows += [S_TANGENT + 3 * c for c in range(3)]
    # tangent handedness is a flat per-triangle row, copied not blended
    # (negative entry = copy row -(r+1); see _flush_planes)
    rows += [-(S_TANGENT_W + 1)]
    if analytic_derivs:
        names += ["du0_dx", "dv0_dx", "du0_dy", "dv0_dy"]
    return tuple(names), tuple(rows)


_PLANE_NAMES, _ATTR_ROWS = plane_layout()
N_PLANES = len(_PLANE_NAMES)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _split_bf16x3(x):
    """Exact 3-way bf16 split of f32: hi + mid + lo == x bitwise.

    Truncation splits (mask low mantissa bits) leave each residual with
    <= 8 significand bits, so every part converts to bf16 exactly. Used
    by the winner-resolve one-hot matmul: 3 bf16 MXU passes reproduce the
    f32 setup values exactly (the one-hot operand is exact 0/1 and the
    accumulation is f32)."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(xi & jnp.int32(-65536), jnp.float32)
    r = x - hi
    ri = jax.lax.bitcast_convert_type(r, jnp.int32)
    mid = jax.lax.bitcast_convert_type(ri & jnp.int32(-65536), jnp.float32)
    lo = r - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def _merge_subgroup(P, px, py, state, zbounds=None, tile_xy=None,
                    slim=False, col_base=None, tile_wh=(TILE_W, TILE_H)):
    """Merge SUB triangles into the tile's best-fragment state.

    P: (SUB, NSETUP) triangle setup values; px/py: (1, npx) pixel centers;
    state: (z (1,npx) f32, fields (NSETUP,npx) f32) — or (z, tid (1,npx)
           i32) in slim mode. `fields` holds the winning triangle's RAW
           setup row per pixel, fetched with ONE small MXU matmul
           (NSETUP,SUB)@(SUB,npx one-hot); attribute interpolation happens
           once per PIXEL at tile flush (_flush_planes), not once per
           covered fragment — that cut the dominant per-merge VPU cost
           (~100 vector ops on (8,1024)) roughly in half at 1080p.
    zbounds: optional (zlo, zhi) per-pixel planes — fragments must satisfy
    zlo < z < zhi (depth peeling against the previous layer + opaque depth);
    tile_xy: optional (tx0, ty0) scalars — when given, the whole subgroup
    is skipped via lax.cond if its combined bbox misses the tile (Morton-
    sorted input makes subgroups spatially tight, so most partial-chunk
    subgroups skip).
    col_base: when given (an i32 scalar, the global setup-column id of
    this subgroup's first triangle), state is (z, col (1,npx) i32) and the
    merge records only the winning COLUMN id — the binned kernel resolves
    the winner's full setup row once per tile afterwards with an exact
    one-hot MXU matmul (_split_bf16x3), which replaces the 7-deep
    (NSETUP, npx) select tree that dominated the per-merge cost.
    Pure jnp — shared between the unrolled TPU kernel and the fori_loop
    interpret path, and unit-testable directly.
    """
    if tile_xy is not None:
        tx0, ty0 = tile_xy
        tw, th = tile_wh
        hit = (
            (jnp.min(P[:, S_BB_MINX]) < tx0 + tw)
            & (jnp.max(P[:, S_BB_MAXX]) > tx0)
            & (jnp.min(P[:, S_BB_MINY]) < ty0 + th)
            & (jnp.max(P[:, S_BB_MAXY]) > ty0)
        )
        return jax.lax.cond(
            hit,
            lambda st: _merge_subgroup(P, px, py, st, zbounds, slim=slim,
                                       col_base=col_base),
            lambda st: st,
            state,
        )

    npx = px.shape[1]

    def col(r):
        return P[:, r : r + 1]  # (SUB, 1) — r is a Python int, static slice

    # v4 plane-equation coverage: E_i = A_i*px + (B_i*py + C_i), two fused
    # madds + one compare per edge. The top-left rule folds into a per-edge
    # threshold derived from the coefficient signs (vertex.py row comment):
    # left edge ⟺ A > 0; top edge ⟺ A == 0 and B > 0.
    covers = []
    zero = jnp.float32(0.0)
    for ra, rb, rc in ((S_E0A, S_E0B, S_E0C), (S_E1A, S_E1B, S_E1C),
                       (S_E2A, S_E2B, S_E2C)):
        a, b, c = col(ra), col(rb), col(rc)
        e = a * px + (b * py + c)
        tl = (a > 0) | ((a == 0) & (b > 0))
        thr = jnp.where(tl, zero, jnp.float32(_FMIN))
        covers.append(e >= thr)

    z = col(S_ZA) * px + (col(S_ZB) * py + col(S_ZC))
    cover = covers[0] & covers[1] & covers[2] & (z >= 0.0) & (z <= 1.0)
    if zbounds is not None:
        zlo, zhi = zbounds
        cover = cover & (z > zlo) & (z < zhi)
    zc = jnp.where(cover, z, _BIG)           # (SUB, npx)

    # resolve sub-group: nearest z, lowest index on ties (LESS + draw order)
    zmin = jnp.min(zc, axis=0, keepdims=True)            # (1, npx)
    local = jax.lax.broadcasted_iota(jnp.int32, (SUB, npx), 0)
    idx_m = jnp.where(zc == zmin, local, SUB)
    win = jnp.min(idx_m, axis=0, keepdims=True)          # (1, npx)

    take = zmin < state[0]
    new_z = jnp.where(take, zmin, state[0])

    if col_base is not None:
        # zmin == _BIG ⇒ take is false (state z <= 1), so `win` is a real
        # covering triangle whenever it is recorded
        newcol = col_base + win
        return (new_z, jnp.where(take, newcol, state[1]))

    if slim:
        # slim mode: attributes resolve post-raster (shade.resolve_gbuffer).
        # original ids ride in a setup row (f32 exact below 2^24); the pick
        # is a one-hot sum, so the value is exact
        oh = ((local == win) & (zc < _BIG)).astype(jnp.float32)
        tid = jnp.sum(col(S_ORIG_ID) * oh, axis=0, keepdims=True).astype(jnp.int32)
        return (new_z, jnp.where(take, tid, state[1]))

    # winner's full setup row per pixel: an exact per-pixel select tree
    # over the SUB candidate rows (selects copy exact f32 — an MXU one-hot
    # matmul needs 3-6 bf16 passes for exactness and measured slower).
    nsetup = P.shape[1]
    picked = jnp.broadcast_to(P[0][:, None], (nsetup, npx))
    for s in range(1, SUB):
        picked = jnp.where(win == s, P[s][:, None], picked)
    return (new_z, jnp.where(take, picked, state[1]))


def _init_fields(npx):
    """Initial per-pixel winner-fields state: zeros except the original-id
    row, which is -1 (miss marker read back by the flush)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (NSETUP, npx), 0)
    return jnp.where(rows == S_ORIG_ID, -1.0, 0.0)


def _flush_planes(z, fields, px, py, attr_rows, analytic_derivs: bool):
    """Interpolate the final G-buffer planes from the winning triangle's
    raw setup fields — once per pixel, after all merges.

    z: (1, npx); fields: (NSETUP, npx). Returns the planes in output order
    (tid i32, depth, mat_row, attrs..., [du0/dv0 derivatives]) as (1, npx)
    arrays. The math matches the reference's shade-time re-interpolation
    (material_opaque compute.wgsl) and shade.resolve_gbuffer exactly; miss
    pixels (all-zero fields) come out as attr 0 / mat_row 0 / tid -1, the
    same values the old per-merge accumulators produced."""

    def row(r):
        return fields[r : r + 1, :]

    # v4: raw edge values from the stored plane equations; the common
    # area factor cancels in the perspective-normalized weights
    e0 = row(S_E0A) * px + (row(S_E0B) * py + row(S_E0C))
    e1 = row(S_E1A) * px + (row(S_E1B) * py + row(S_E1C))
    e2 = row(S_E2A) * px + (row(S_E2B) * py + row(S_E2C))

    iw0, iw1, iw2 = row(S_IW0), row(S_IW1), row(S_IW2)
    pb0 = e0 * iw0
    pb1 = e1 * iw1
    pb2 = e2 * iw2
    denom = pb0 + pb1 + pb2
    inv_denom = 1.0 / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    pn0 = pb0 * inv_denom
    pn1 = pb1 * inv_denom
    pn2 = pb2 * inv_denom

    outs = [row(S_ORIG_ID).astype(jnp.int32), z, row(S_MAT_ROW)]
    for base in attr_rows:
        if base < 0:    # flat copy row (tangent handedness)
            outs.append(row(-base - 1))
        else:
            outs.append(pn0 * row(base) + pn1 * row(base + 1)
                        + pn2 * row(base + 2))

    if analytic_derivs:
        # d(e_i)/dx = A_i, d(e_i)/dy = B_i
        a0, a1, a2 = row(S_E0A), row(S_E1A), row(S_E2A)
        b0_, b1_, b2_ = row(S_E0B), row(S_E1B), row(S_E2B)
        dD_dx = a0 * iw0 + a1 * iw1 + a2 * iw2
        dD_dy = b0_ * iw0 + b1_ * iw1 + b2_ * iw2
        dpn0_dx = inv_denom * (a0 * iw0 - pn0 * dD_dx)
        dpn1_dx = inv_denom * (a1 * iw1 - pn1 * dD_dx)
        dpn2_dx = inv_denom * (a2 * iw2 - pn2 * dD_dx)
        dpn0_dy = inv_denom * (b0_ * iw0 - pn0 * dD_dy)
        dpn1_dy = inv_denom * (b1_ * iw1 - pn1 * dD_dy)
        dpn2_dy = inv_denom * (b2_ * iw2 - pn2 * dD_dy)
        u0a, u0b, u0c = row(S_UV0), row(S_UV0 + 1), row(S_UV0 + 2)
        v0a, v0b, v0c = row(S_UV0 + 3), row(S_UV0 + 4), row(S_UV0 + 5)
        for (da0, da1, da2) in ((dpn0_dx, dpn1_dx, dpn2_dx),
                                (dpn0_dy, dpn1_dy, dpn2_dy)):
            outs.append(da0 * u0a + da1 * u0b + da2 * u0c)
            outs.append(da0 * v0a + da1 * v0b + da2 * v0c)
    return outs


def _make_kernel(unroll: bool, peel: bool, attr_rows=_ATTR_ROWS,
                 n_planes=N_PLANES, slim: bool = False,
                 analytic_derivs: bool = True):
    def _raster_kernel(
        chunk_bbox_ref,   # SMEM (4, n_chunks) f32
        setup_ref,        # VMEM (NSETUP, CHUNK) f32
        *refs,            # [zlo, zhi when peel] + n_planes outs + 2 scratch
    ):
        if peel:
            zlo_ref, zhi_ref = refs[0], refs[1]
            refs = refs[2:]
        outs = refs[:n_planes]
        z_acc, f_acc = refs[n_planes], refs[n_planes + 1]

        i = pl.program_id(0)
        j = pl.program_id(1)
        k = pl.program_id(2)
        n_chunks = pl.num_programs(2)
        npx = TILE_H * TILE_W

        @pl.when(k == 0)
        def _init():
            z_acc[:] = jnp.full_like(z_acc, 1.0)   # depth clear, LESS
            if slim:
                f_acc[:] = jnp.full_like(f_acc, -1)
            else:
                f_acc[:] = _init_fields(npx)

        ty0 = (i * TILE_H).astype(jnp.float32)
        tx0 = (j * TILE_W).astype(jnp.float32)

        overlaps = (
            (chunk_bbox_ref[0, k] < tx0 + TILE_W)
            & (chunk_bbox_ref[2, k] > tx0)
            & (chunk_bbox_ref[1, k] < ty0 + TILE_H)
            & (chunk_bbox_ref[3, k] > ty0)
        )

        flat = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        px = tx0 + (flat % TILE_W).astype(jnp.float32) + 0.5
        py = ty0 + (flat // TILE_W).astype(jnp.float32) + 0.5

        @pl.when(overlaps)
        def _process():
            setup_t = setup_ref[:].T                 # (CHUNK, NSETUP)
            state = (z_acc[:], f_acc[:])
            zbounds = None
            if peel:
                zbounds = (zlo_ref[:].reshape(1, npx), zhi_ref[:].reshape(1, npx))

            txy = (tx0, ty0)
            if unroll:
                for g in range(CHUNK // SUB):
                    Pg = setup_t[g * SUB : (g + 1) * SUB]
                    state = _merge_subgroup(Pg, px, py, state,
                                            zbounds, txy, slim=slim)
            else:
                def body(g, st):
                    Pg = jax.lax.dynamic_slice_in_dim(setup_t, g * SUB, SUB, axis=0)
                    return _merge_subgroup(Pg, px, py, st,
                                           zbounds, txy, slim=slim)

                state = jax.lax.fori_loop(0, CHUNK // SUB, body, state)

            z_acc[:] = state[0]
            f_acc[:] = state[1]

        @pl.when(k == n_chunks - 1)
        def _flush():
            if slim:
                outs[0][:] = f_acc[:].reshape(TILE_H, TILE_W)
                outs[1][:] = z_acc[:].reshape(TILE_H, TILE_W)
            else:
                planes = _flush_planes(z_acc[:], f_acc[:], px, py,
                                       attr_rows, analytic_derivs)
                for o, p in zip(outs, planes):
                    o[:] = p.reshape(TILE_H, TILE_W)

    return _raster_kernel


def build_bins(setup: jnp.ndarray, *, width: int, height: int, max_bins: int,
               tile_w: int = TILE_W, tile_h: int = TILE_H):
    """Per-tile chunk lists: for each (8,128) screen tile, the indices of
    the triangle chunks whose conservative bbox overlaps it.

    This is the TPU analog of tiled binning in software rasterizers
    (PAPERS.md CuRast): it turns the raster grid from
    O(tiles x all_chunks) into O(tiles x overlapping_chunks). Returns
    (bin_idx (n_tiles*B,) i32, counts (n_tiles,) i32, B). Chunks beyond
    capacity B are dropped (counts clip); pad slots repeat the last valid
    chunk so the pipelined fetch coalesces (same block index => no DMA).
    """
    T = setup.shape[1]
    n_chunks = T // CHUNK
    n_ty, n_tx = height // tile_h, width // tile_w
    # the bin table is a scalar-prefetch array in SMEM (1 MiB total);
    # budget ~0.85 MiB for it and clamp B accordingly
    smem_budget_entries = (850_000 // 4)
    b_fit = max(8, smem_budget_entries // (n_ty * n_tx))
    B = min(max_bins, b_fit, n_chunks)
    bbox = _chunk_bboxes(setup, n_chunks)                  # (4, Nc)
    zmin = _chunk_zmin(setup, n_chunks)                    # (Nc,)

    tx0 = jnp.arange(n_tx, dtype=jnp.float32) * tile_w     # (n_tx,)
    ty0 = jnp.arange(n_ty, dtype=jnp.float32) * tile_h
    ox = (bbox[0][None, :] < (tx0 + tile_w)[:, None]) & (bbox[2][None, :] > tx0[:, None])
    oy = (bbox[1][None, :] < (ty0 + tile_h)[:, None]) & (bbox[3][None, :] > ty0[:, None])
    overlap = oy[:, None, :] & ox[None, :, :]              # (n_ty, n_tx, Nc)
    overlap = overlap.reshape(n_ty * n_tx, n_chunks)

    counts = jnp.minimum(jnp.sum(overlap, axis=1), B).astype(jnp.int32)
    # near-first ordering: each tile's list is sorted by chunk z-min so the
    # kernel's hi-Z test can skip occluded chunks (and everything after
    # them). Ranks, not raw ids, keep the top_k integer-keyed.
    order = jnp.argsort(zmin)                              # rank -> chunk id
    rank = jnp.argsort(order).astype(jnp.int32)            # chunk id -> rank
    key = jnp.where(overlap, rank[None, :], n_chunks)      # nearest ranks first
    neg_top, _ = jax.lax.top_k(-key, B)                    # B smallest keys
    ranks_sel = -neg_top                                   # (n_tiles, B) ascending z
    bins = order[jnp.clip(ranks_sel, 0, n_chunks - 1)].astype(jnp.int32)
    # replace out-of-range pad slots with each row's last valid chunk
    valid_slot = ranks_sel < n_chunks
    last = jnp.take_along_axis(
        bins, jnp.maximum(counts - 1, 0)[:, None], axis=1)
    bins = jnp.where(valid_slot, bins, last)
    bins = jnp.where(counts[:, None] == 0, 0, bins)
    return bins.reshape(-1), counts, B, zmin


def _swizzle(img: jnp.ndarray, tile_h: int, tile_w: int) -> jnp.ndarray:
    """(H, W) image → (n_tiles, tile_h*tile_w) tile-major layout."""
    H, W = img.shape
    n_ty, n_tx = H // tile_h, W // tile_w
    return (img.reshape(n_ty, tile_h, n_tx, tile_w)
            .swapaxes(1, 2).reshape(n_ty * n_tx, tile_h * tile_w))


def _deswizzle(tiles: jnp.ndarray, H: int, W: int,
               tile_h: int, tile_w: int) -> jnp.ndarray:
    """(n_tiles, tile_h*tile_w) tile-major → (H, W) image."""
    n_ty, n_tx = H // tile_h, W // tile_w
    return (tiles.reshape(n_ty, n_tx, tile_h, tile_w)
            .swapaxes(1, 2).reshape(H, W))


def _make_binned_kernel(unroll: bool, peel: bool, n_tx: int, B: int,
                        attr_rows=_ATTR_ROWS, n_planes=N_PLANES,
                        slim: bool = False, analytic_derivs: bool = True,
                        tile_h: int = BT_H, tile_w: int = BT_W,
                        compact: bool = False):
    """Streamed binned kernel: grid = (n_tiles,), ONE step per tile.

    Each step walks the tile's bin list with a dynamic fori_loop and
    double-buffered async DMA of the setup chunks from HBM — the previous
    rectangular (n_tiles, B) grid paid ~0.5 µs of scalar pipeline overhead
    per PADDED slot (~60 ms/frame at B=64 on the 1080p stress scene);
    here the loop runs exactly counts[t] iterations and the grid shrinks
    ~64x. DMA of bin b+1 is kicked off before waiting on bin b, so the
    fetch rides under the merge math.

    Non-slim mode is TWO-PHASE: the merge loop tracks only (z, winner
    column id) per pixel — no (NSETUP, npx) field select per subgroup —
    then a second walk over the same bins resolves the winners' full
    setup rows with one exact bf16x3 one-hot MXU matmul per chunk that
    actually holds a winner (typically 1-3 per tile vs 16 select trees
    per merged chunk). Attribute interpolation still happens once per
    pixel at flush (_flush_planes).

    compact=True: grid step t handles LOGICAL tile tidx_ref[t] (a 4th
    scalar-prefetch array of covered-tile ids) — bins/counts/zmin index
    by the logical id while input/output blocks stay at the compacted
    grid position. This is the covered-tile compaction of the K-layer
    transparent peel: transparent geometry typically bins into a small
    fraction of the band's tiles, and the reference's forward pass has
    no fragments elsewhere (render.rs transparent draws)."""

    def _kernel(bin_ref, cnt_ref, zmin_ref, *krefs):
        if compact:
            tidx_ref, setup_ref, *refs = krefs
        else:
            setup_ref, *refs = krefs
        if peel:
            zlo_ref, zhi_ref = refs[0], refs[1]
            refs = refs[2:]
        outs = refs[:n_planes]
        buf, sem = refs[n_planes], refs[n_planes + 1]

        t = tidx_ref[pl.program_id(0)] if compact else pl.program_id(0)
        cnt = cnt_ref[t]
        ty0 = ((t // n_tx) * tile_h).astype(jnp.float32)
        tx0 = ((t % n_tx) * tile_w).astype(jnp.float32)
        npx = tile_h * tile_w
        flat = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        px = tx0 + (flat % tile_w).astype(jnp.float32) + 0.5
        py = ty0 + (flat // tile_w).astype(jnp.float32) + 0.5

        def start(b, slot):
            chunk = bin_ref[t * B + b]
            pltpu.make_async_copy(
                setup_ref.at[:, pl.ds(chunk * CHUNK, CHUNK)],
                buf.at[slot], sem.at[slot],
            ).start()

        def wait(slot):
            pltpu.make_async_copy(
                setup_ref.at[:, pl.ds(0, CHUNK)], buf.at[slot], sem.at[slot]
            ).wait()

        @pl.when(cnt > 0)
        def _prefetch_first():
            start(0, 0)

        zbounds = None
        if peel:
            zbounds = (zlo_ref[:].reshape(1, npx), zhi_ref[:].reshape(1, npx))
        # no per-subgroup bbox cond here: with the v4 plane-equation merge
        # the body is cheap enough that the lax.cond overhead (vreg
        # spills/reloads around 16 branches per chunk) costs more than the
        # skipped work (measured 38.9 -> 31.8 ms at 1080p). The dense
        # kernel keeps the cond — it visits every chunk.
        txy = None
        twh = (tile_w, tile_h)

        z0 = jnp.full((1, npx), 1.0, jnp.float32)    # depth clear, LESS
        colmode = not slim
        state0 = (z0, jnp.full((1, npx), -1, jnp.int32))

        def body(b, state):
            slot = jax.lax.rem(b, 2)

            @pl.when(b + 1 < cnt)
            def _prefetch_next():
                start(b + 1, jax.lax.rem(b + 1, 2))

            wait(slot)                               # always consume the DMA
            chunk = bin_ref[t * B + b]

            def do_merge(state):
                setup_t = buf[slot].T                # (CHUNK, NSETUP)
                if unroll:
                    for g in range(CHUNK // SUB):
                        Pg = setup_t[g * SUB : (g + 1) * SUB]
                        cb = chunk * CHUNK + g * SUB if colmode else None
                        state = _merge_subgroup(Pg, px, py, state,
                                                zbounds, txy, slim=slim,
                                                col_base=cb, tile_wh=twh)
                else:
                    def sub_body(g, st):
                        Pg = jax.lax.dynamic_slice_in_dim(setup_t, g * SUB, SUB, axis=0)
                        cb = chunk * CHUNK + g * SUB if colmode else None
                        return _merge_subgroup(Pg, px, py, st,
                                               zbounds, txy, slim=slim,
                                               col_base=cb, tile_wh=twh)

                    state = jax.lax.fori_loop(0, CHUNK // SUB, sub_body, state)
                return state

            # hi-Z: bins are z-min-ordered, so a chunk whose conservative
            # z-min can't beat the tile's worst current depth is fully
            # occluded (strict LESS test) and its merge is skipped.
            zmax = jnp.max(state[0])
            return jax.lax.cond(zmin_ref[chunk] < zmax, do_merge,
                                lambda st: st, state)

        state = jax.lax.fori_loop(0, cnt, body, state0)

        if slim:
            outs[0][:] = state[1].reshape(1, 8, npx // 8)
            outs[1][:] = state[0].reshape(1, 8, npx // 8)
        else:
            # ---- phase 2: resolve winners' setup rows ----------------------
            # Re-walk the bins (double-buffered DMA again — ~3 extra 32 KB
            # fetches per tile is trivial bandwidth) and, for each chunk
            # that holds at least one pixel's winning column, accumulate
            # fields += setup_chunk @ onehot(col) on the MXU. The bf16x3
            # split makes the matmul exact, so this path is bit-identical
            # to the old per-subgroup select tree.
            col = state[1]

            @pl.when(cnt > 0)
            def _prefetch_resolve():
                start(0, 0)

            def rbody(b, acc):
                slot = jax.lax.rem(b, 2)

                @pl.when(b + 1 < cnt)
                def _prefetch_next():
                    start(b + 1, jax.lax.rem(b + 1, 2))

                wait(slot)
                chunk = bin_ref[t * B + b]
                base = chunk * CHUNK
                hit = jnp.any((col >= base) & (col < base + CHUNK))

                def do_resolve(acc):
                    hi, mid, lo = _split_bf16x3(buf[slot])   # (NSETUP, CHUNK)
                    oh = ((col - base) == jax.lax.broadcasted_iota(
                        jnp.int32, (CHUNK, npx), 0))
                    ohb = oh.astype(jnp.float32).astype(jnp.bfloat16)
                    for part in (hi, mid, lo):
                        acc = acc + jnp.dot(part, ohb,
                                            preferred_element_type=jnp.float32)
                    return acc

                return jax.lax.cond(hit, do_resolve, lambda a: a, acc)

            fields = jax.lax.fori_loop(
                0, cnt, rbody, jnp.zeros((NSETUP, npx), jnp.float32))
            planes = _flush_planes(state[0], fields, px, py,
                                   attr_rows, analytic_derivs)
            # miss pixels resolve to all-zero fields; restore the -1 marker
            planes[0] = jnp.where(col >= 0, planes[0], -1)
            for o, p in zip(outs, planes):
                o[:] = p.reshape(1, 8, npx // 8)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("width", "height", "max_bins", "interpret",
                              "has_uv1", "has_color", "slim",
                              "analytic_derivs", "bins_B")
)
def rasterize_binned(setup, zlo=None, zhi=None, *, width: int, height: int,
                     max_bins: int = 128, interpret: bool | None = None,
                     has_uv1: bool = True, has_color: bool = True,
                     slim: bool = False, analytic_derivs: bool = True,
                     bins3=None, bins_B: int | None = None):
    """Binned rasterizer: per-tile chunk lists, square swizzled tiles.

    The scalar-prefetched bin table tells each (BT_H, BT_W) logical tile
    which triangle chunks overlap it, so a tile only ever DMAs those
    chunks — the production path for large scenes (the dense grid does
    O(tiles x chunks) DMA). Pass zlo/zhi planes for a depth-peel pass.
    Planes come out in true (height, width) layout; the tile swizzle is
    internal."""
    if interpret is None:
        interpret = _interpret_default()
    peel = zlo is not None
    names, attr_rows = plane_layout(has_uv1, has_color, slim, analytic_derivs)
    n_planes = len(names)
    T = setup.shape[1]
    assert T % CHUNK == 0
    # pad the viewport to square-tile multiples; de-swizzle crops back
    W32 = -(-width // BT_W) * BT_W
    H32 = -(-height // BT_H) * BT_H
    n_ty, n_tx = H32 // BT_H, W32 // BT_W
    n_tiles = n_ty * n_tx
    npx = BT_H * BT_W
    if bins3 is None:
        bins, counts, B, zmin = build_bins(
            setup, width=W32, height=H32, max_bins=max_bins,
            tile_w=BT_W, tile_h=BT_H)
    else:
        # prebuilt bins (the K-layer peel builds them once); B must ride
        # as a STATIC arg — an int inside a traced tuple would become a
        # tracer the Pallas kernel can't close over
        (bins, counts, zmin), B = bins3, bins_B

    def tile_map(t, bin_ref, cnt_ref, zmin_ref):
        return (t, 0, 0)

    # the whole setup pool stays in HBM; the kernel DMAs each tile's
    # binned chunks itself (double-buffered)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [setup]
    if peel:
        pad = ((0, H32 - zlo.shape[0]), (0, W32 - zlo.shape[1]))
        in_specs += [
            pl.BlockSpec((1, 8, npx // 8), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npx // 8), tile_map, memory_space=pltpu.VMEM),
        ]
        args += [
            _swizzle(jnp.pad(zlo, pad), BT_H, BT_W).reshape(-1, 8, npx // 8),
            _swizzle(jnp.pad(zhi, pad), BT_H, BT_W).reshape(-1, 8, npx // 8),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, 8, npx // 8), tile_map, memory_space=pltpu.VMEM)
            for _ in range(n_planes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NSETUP, CHUNK), jnp.float32),   # DMA double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((n_tiles, 8, npx // 8),
                             jnp.int32 if i == 0 else jnp.float32)
        for i in range(n_planes))
    outs = pl.pallas_call(
        _make_binned_kernel(unroll=not interpret, peel=peel, n_tx=n_tx, B=B,
                            attr_rows=attr_rows, n_planes=n_planes, slim=slim,
                            analytic_derivs=analytic_derivs),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bins, counts, zmin, *args)
    outs = [_deswizzle(o.reshape(n_tiles, npx), H32, W32,
                       BT_H, BT_W)[:height, :width] for o in outs]
    return dict(zip(names, outs))


def _chunk_zmin(setup: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    """Conservative per-chunk minimum NDC z (n_chunks,) for hi-Z skipping.

    Derived from the affine z-plane over the screen bbox: for an affine
    function the minimum over a rectangle sits at a corner, and the bbox
    contains the triangle, so this lower-bounds the true z-min."""
    za, zb, zc = setup[S_ZA], setup[S_ZB], setup[S_ZC]
    minx, maxx = setup[S_BB_MINX], setup[S_BB_MAXX]
    miny, maxy = setup[S_BB_MINY], setup[S_BB_MAXY]
    zx = jnp.minimum(za * minx, za * maxx)
    zy = jnp.minimum(zb * miny, zb * maxy)
    z = jnp.where(minx <= maxx, zc + zx + zy, _BIG)    # invalid → ignore
    return z.reshape(n_chunks, CHUNK).min(axis=1)


def _chunk_bboxes(setup: jnp.ndarray, n_chunks: int) -> jnp.ndarray:
    """Conservative per-chunk screen bboxes (4, n_chunks); invalid
    triangles carry empty boxes (finish_setup) and drop out naturally."""
    minx = setup[S_BB_MINX].reshape(n_chunks, CHUNK).min(axis=1)
    miny = setup[S_BB_MINY].reshape(n_chunks, CHUNK).min(axis=1)
    maxx = setup[S_BB_MAXX].reshape(n_chunks, CHUNK).max(axis=1)
    maxy = setup[S_BB_MAXY].reshape(n_chunks, CHUNK).max(axis=1)
    return jnp.stack([minx, miny, maxx, maxy], axis=0)


def _out_shapes(width: int, height: int, n_planes: int = N_PLANES):
    shapes = [jax.ShapeDtypeStruct((height, width), jnp.int32)]
    shapes += [jax.ShapeDtypeStruct((height, width), jnp.float32)] * (n_planes - 1)
    return tuple(shapes)


def _scratch(npx: int, slim: bool = False):
    if slim:
        return [
            pltpu.VMEM((1, npx), jnp.float32),        # z
            pltpu.VMEM((1, npx), jnp.int32),          # tid
        ]
    return [
        pltpu.VMEM((1, npx), jnp.float32),            # z
        pltpu.VMEM((NSETUP, npx), jnp.float32),       # winner fields
    ]


def rasterize(setup, *, width: int, height: int, interpret: bool | None = None,
              binned: bool | None = None, max_bins: int = 256,
              has_uv1: bool = True, has_color: bool = True,
              slim: bool = False, analytic_derivs: bool = True):
    """Rasterize packed triangle setup (NSETUP, T) into visibility planes.

    T must be a multiple of CHUNK; width/height multiples of (TILE_W,
    TILE_H) (the frame pipeline pads and crops). Returns a dict of
    (height, width) planes (see module docstring). Dispatches to the
    binned kernel on hardware (dense grid kept for interpret-mode tests).
    """
    if interpret is None:
        interpret = _interpret_default()
    if binned is None:
        binned = not interpret
    if binned:
        return rasterize_binned(setup, width=width, height=height,
                                max_bins=max_bins, interpret=interpret,
                                has_uv1=has_uv1, has_color=has_color, slim=slim,
                                analytic_derivs=analytic_derivs)
    return _rasterize_dense(setup, width=width, height=height,
                            interpret=interpret, slim=slim,
                            analytic_derivs=analytic_derivs)


@functools.partial(jax.jit, static_argnames=("width", "height", "interpret",
                                              "slim", "analytic_derivs"))
def _rasterize_dense(setup, *, width: int, height: int,
                     interpret: bool | None = None, slim: bool = False,
                     analytic_derivs: bool = True):
    if interpret is None:
        interpret = _interpret_default()
    names, attr_rows = plane_layout(slim=slim, analytic_derivs=analytic_derivs)
    n_planes = len(names)
    T = setup.shape[1]
    assert T % CHUNK == 0, f"triangle count {T} not a multiple of {CHUNK}"
    assert width % TILE_W == 0 and height % TILE_H == 0, (width, height)
    n_chunks = T // CHUNK
    chunk_bbox = _chunk_bboxes(setup, n_chunks)

    grid = (height // TILE_H, width // TILE_W, n_chunks)
    npx = TILE_H * TILE_W

    out_spec = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        # fori_loop body in interpret mode: grid programs are traced
        # individually there, so trace cost must stay small
        _make_kernel(unroll=not interpret, peel=False,
                     attr_rows=attr_rows, n_planes=n_planes, slim=slim,
                     analytic_derivs=analytic_derivs),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (4, n_chunks), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (NSETUP, CHUNK), lambda i, j, k: (0, k), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(out_spec,) * n_planes,
        out_shape=_out_shapes(width, height, n_planes),
        scratch_shapes=_scratch(npx, slim),
        interpret=interpret,
    )(chunk_bbox, setup)
    return dict(zip(names, outs))


def rasterize_peel(setup, zlo, zhi, *, width: int, height: int,
                   interpret: bool | None = None, binned: bool | None = None,
                   has_uv1: bool = True, has_color: bool = True,
                   slim: bool = False, analytic_derivs: bool = True):
    """One depth-peel pass: nearest fragment with zlo < z < zhi per pixel.

    zlo = previous layer's depth (or -inf plane); zhi = the opaque depth
    buffer (shared world depth, read-only — the reference's transparent
    pass binds the opaque depth the same way)."""
    if interpret is None:
        interpret = _interpret_default()
    if binned is None:
        binned = not interpret
    if binned:
        return rasterize_binned(setup, zlo, zhi, width=width, height=height,
                                interpret=interpret,
                                has_uv1=has_uv1, has_color=has_color, slim=slim,
                                analytic_derivs=analytic_derivs)
    return _rasterize_peel_dense(setup, zlo, zhi, width=width, height=height,
                                 interpret=interpret, slim=slim,
                                 analytic_derivs=analytic_derivs)


@functools.partial(jax.jit, static_argnames=("width", "height", "interpret",
                                              "slim", "analytic_derivs"))
def _rasterize_peel_dense(setup, zlo, zhi, *, width: int, height: int,
                          interpret: bool | None = None, slim: bool = False,
                          analytic_derivs: bool = True):
    if interpret is None:
        interpret = _interpret_default()
    names, attr_rows = plane_layout(slim=slim, analytic_derivs=analytic_derivs)
    n_planes = len(names)
    T = setup.shape[1]
    assert T % CHUNK == 0
    n_chunks = T // CHUNK
    chunk_bbox = _chunk_bboxes(setup, n_chunks)
    grid = (height // TILE_H, width // TILE_W, n_chunks)
    npx = TILE_H * TILE_W

    tile_spec = pl.BlockSpec(
        (TILE_H, TILE_W), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        _make_kernel(unroll=not interpret, peel=True,
                     attr_rows=attr_rows, n_planes=n_planes, slim=slim,
                     analytic_derivs=analytic_derivs),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (4, n_chunks), lambda i, j, k: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (NSETUP, CHUNK), lambda i, j, k: (0, k), memory_space=pltpu.VMEM
            ),
            tile_spec,
            tile_spec,
        ],
        out_specs=(tile_spec,) * n_planes,
        out_shape=_out_shapes(width, height, n_planes),
        scratch_shapes=_scratch(npx, slim),
        interpret=interpret,
    )(chunk_bbox, setup, zlo, zhi)
    return dict(zip(names, outs))


def rasterize_layers(setup, opaque_depth, *, width: int, height: int,
                     n_layers: int, interpret: bool | None = None,
                     has_uv1: bool = True, has_color: bool = True,
                     slim: bool = False, analytic_derivs: bool = True):
    """Depth-peel K transparent layers front-to-back.

    Returns dict of (K, H*W) flat arrays. Exact order-independent
    transparency for up to K overlapping fragments per pixel. The peel
    loop is UNROLLED (K is a static config) and the per-tile bin lists
    are built ONCE and reused across all K passes — the setup never
    changes between peels, only the zlo plane does. A lax.scan version
    of this loop measured ~23 ms of while-carry copies at 1080p/K=4
    (each iteration re-copied the (K, P) stacked output planes), plus a
    redundant build_bins top_k sort per layer (~1.5 ms each)."""
    if interpret is None:
        interpret = _interpret_default()
    binned = not interpret
    bins3, bins_B = None, None
    if binned:
        W32 = -(-width // BT_W) * BT_W
        H32 = -(-height // BT_H) * BT_H
        bins, counts, bins_B, zmin = build_bins(
            setup, width=W32, height=H32, max_bins=128,
            tile_w=BT_W, tile_h=BT_H)
        bins3 = (bins, counts, zmin)

    zlo = jnp.full((height, width), -1.0, jnp.float32)
    per_layer = []
    for _k in range(n_layers):
        def peel(zlo):
            if binned:
                return rasterize_binned(
                    setup, zlo, opaque_depth, width=width, height=height,
                    interpret=interpret, has_uv1=has_uv1,
                    has_color=has_color, slim=slim,
                    analytic_derivs=analytic_derivs, bins3=bins3,
                    bins_B=bins_B)
            return rasterize_peel(
                setup, zlo, opaque_depth, width=width, height=height,
                interpret=interpret, has_uv1=has_uv1, has_color=has_color,
                slim=slim, analytic_derivs=analytic_derivs)

        if _k == 0 or interpret:
            layer = peel(zlo)
            proto = {k: (v.shape, v.dtype) for k, v in layer.items()}
        else:
            # runtime peel skip: if layer k-1 found no fragments, every
            # deeper peel is empty too — skip the raster kernel (miss
            # defaults match the kernels' zero-init planes / tri_id=-1)
            prev = per_layer[-1]
            empty = {
                k: (jnp.full(shape, -1, jnp.int32) if k == "tri_id"
                    else jnp.zeros(shape, dt))
                for k, (shape, dt) in proto.items()
            }
            layer = jax.lax.cond(
                jnp.max(prev["tri_id"]) >= 0,
                peel, lambda _zlo: empty, zlo)
        zlo = jnp.where(layer["tri_id"] >= 0, layer["depth"], 2.0)
        per_layer.append({k: v.reshape(-1) for k, v in layer.items()})
    return {k: jnp.stack([lay[k] for lay in per_layer])
            for k in per_layer[0]}


def _rasterize_binned_compact(setup, zlo_c, zhi_c, *, bins3, B: int,
                              tile_idx, n_tx: int,
                              interpret: bool,
                              has_uv1: bool, has_color: bool,
                              analytic_derivs: bool = True):
    """One peel pass of the covered-tile-compacted K-layer raster.

    zlo_c/zhi_c: (C, 8, npx//8) pre-compacted swizzled depth blocks
    (block i = logical tile tile_idx[i]). Returns the plane dict as
    (C, 8, npx//8) compacted blocks — no deswizzle, callers stay in
    compact space across all K peels and the shade."""
    bins, counts, zmin = bins3
    C = tile_idx.shape[0]
    npx = BT_H * BT_W
    names, attr_rows = plane_layout(has_uv1, has_color, False,
                                    analytic_derivs)
    n_planes = len(names)

    def tile_map(t, bin_ref, cnt_ref, zmin_ref, tidx_ref):
        return (t, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(C,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, npx // 8), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, npx // 8), tile_map, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, 8, npx // 8), tile_map, memory_space=pltpu.VMEM)
            for _ in range(n_planes)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NSETUP, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((C, 8, npx // 8),
                             jnp.int32 if i == 0 else jnp.float32)
        for i in range(n_planes))
    outs = pl.pallas_call(
        _make_binned_kernel(unroll=not interpret, peel=True, n_tx=n_tx,
                            B=B, attr_rows=attr_rows, n_planes=n_planes,
                            analytic_derivs=analytic_derivs, compact=True),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(bins, counts, zmin, tile_idx, setup, zlo_c, zhi_c)
    return dict(zip(names, outs))


def rasterize_layers_compact(rows, opaque_depth, *, width: int, height: int,
                             n_layers: int, tile_cap32: int,
                             interpret: bool | None = None,
                             has_uv1: bool = True, has_color: bool = True):
    """Covered-tile-compacted depth peel: K fat peels over ONLY the 32x32
    band tiles transparent geometry bins into.

    The band-wide K-layer peel pays the full tile grid per peel (960
    tiles at 1080p x 512-row band) for geometry that typically covers a
    few dozen tiles; here build_bins' per-tile counts give exact
    coverage, an argsort compacts the tile list under a static host cap
    (renderer._bucket_tile_cap with 32x32 quantization — over-counting
    safe), and peels + zlo chaining + shading all stay in compact space.
    Emits ANALYTIC uv-derivative planes (plane-equation gradients) so
    the compacted shade needs no band-space screen differencing.

    Returns (layers dict of (K, C*1024) planes in 32x32-swizzled compact
    order, tile_idx (C,) i32 logical tile ids, n_tx)."""
    if interpret is None:
        interpret = _interpret_default()
    setup = rows.T
    W32 = -(-width // BT_W) * BT_W
    H32 = -(-height // BT_H) * BT_H
    n_ty, n_tx = H32 // BT_H, W32 // BT_W
    n_tiles = n_ty * n_tx
    npx = BT_H * BT_W
    C = min(tile_cap32, n_tiles)

    bins, counts, B, zmin = build_bins(
        setup, width=W32, height=H32, max_bins=128,
        tile_w=BT_W, tile_h=BT_H)
    # exact PER-TRIANGLE tile coverage (difference-grid popcount — the
    # device twin of renderer._bucket_tile_cap's host stamp). build_bins'
    # per-CHUNK counts over-merge: one chunk spanning two distant meshes
    # marks every tile between them, which can push "covered" past the
    # host cap and silently drop tiles that DO hold fragments. Triangle
    # bboxes are subsets of their mesh's projected AABB rect, so the
    # host cap provably bounds this count.
    minx, maxx = setup[S_BB_MINX], setup[S_BB_MAXX]
    miny, maxy = setup[S_BB_MINY], setup[S_BB_MAXY]
    live = ((minx <= maxx) & (maxx > 0.0) & (minx < W32)
            & (maxy > 0.0) & (miny < H32))
    w1 = live.astype(jnp.int32)
    txa = jnp.clip(jnp.floor(minx / BT_W), 0, n_tx - 1).astype(jnp.int32)
    txb = jnp.clip(jnp.ceil(maxx / BT_W) - 1, 0, n_tx - 1).astype(jnp.int32)
    tya = jnp.clip(jnp.floor(miny / BT_H), 0, n_ty - 1).astype(jnp.int32)
    tyb = jnp.clip(jnp.ceil(maxy / BT_H) - 1, 0, n_ty - 1).astype(jnp.int32)
    acc = jnp.zeros((n_ty + 1, n_tx + 1), jnp.int32)
    acc = acc.at[tya, txa].add(w1).at[tya, txb + 1].add(-w1)
    acc = acc.at[tyb + 1, txa].add(-w1).at[tyb + 1, txb + 1].add(w1)
    cov = (jnp.cumsum(jnp.cumsum(acc, axis=0), axis=1)[:-1, :-1]
           > 0).reshape(n_tiles)
    tile_idx = jnp.argsort(~cov)[:C].astype(jnp.int32)

    # opaque depth (zhi) compacted once; padding rows get depth 0.0 =
    # fully occluded, so no transparent fragment lands past the viewport
    pad = ((0, H32 - opaque_depth.shape[0]), (0, W32 - opaque_depth.shape[1]))
    zhi_c = jnp.take(
        _swizzle(jnp.pad(opaque_depth, pad), BT_H, BT_W)
        .reshape(n_tiles, 8, npx // 8),
        tile_idx, axis=0)
    zlo = jnp.full((C, 8, npx // 8), -1.0, jnp.float32)

    per_layer = []
    proto = None
    for _k in range(n_layers):
        def peel(zlo):
            return _rasterize_binned_compact(
                setup, zlo, zhi_c, bins3=(bins, counts, zmin), B=B,
                tile_idx=tile_idx, n_tx=n_tx, interpret=interpret,
                has_uv1=has_uv1, has_color=has_color)

        if _k == 0:
            layer = peel(zlo)
            proto = {k: (v.shape, v.dtype) for k, v in layer.items()}
        else:
            # runtime peel skip (same as rasterize_layers): an empty
            # peel k-1 makes every deeper peel empty
            prev = per_layer[-1]
            empty = {
                k: (jnp.full(shape, -1, jnp.int32) if k == "tri_id"
                    else jnp.zeros(shape, dt))
                for k, (shape, dt) in proto.items()
            }
            layer = jax.lax.cond(
                jnp.max(prev["tri_id"]) >= 0,
                peel, lambda _zlo: empty, zlo)
        zlo = jnp.where(layer["tri_id"] >= 0, layer["depth"], 2.0)
        per_layer.append({k: v.reshape(-1) for k, v in layer.items()})
    layers = {k: jnp.stack([lay[k] for lay in per_layer])
              for k in per_layer[0]}
    return layers, tile_idx, n_tx


def pad_setup(setup: jnp.ndarray) -> jnp.ndarray:
    """Pad triangle axis to a CHUNK multiple with invalid triangles
    (empty bboxes so bbox-based culling skips padding)."""
    T = setup.shape[1]
    pad = (-T) % CHUNK
    if pad == 0:
        return setup
    out = jnp.pad(setup, ((0, 0), (0, pad)))
    out = out.at[S_BB_MINX, T:].set(_BIG)
    out = out.at[S_BB_MINY, T:].set(_BIG)
    out = out.at[S_BB_MAXX, T:].set(-_BIG)
    out = out.at[S_BB_MAXY, T:].set(-_BIG)
    return out


def pad_setup_rows(rows: jnp.ndarray) -> jnp.ndarray:
    """Pad ROW-MAJOR setup (T, NSETUP) to a CHUNK multiple with invalid
    triangles (empty bboxes, never-covering edge constant)."""
    T = rows.shape[0]
    pad = (-T) % CHUNK
    if pad == 0:
        return rows
    out = jnp.pad(rows, ((0, pad), (0, 0)))
    out = out.at[T:, S_BB_MINX].set(_BIG)
    out = out.at[T:, S_BB_MINY].set(_BIG)
    out = out.at[T:, S_BB_MAXX].set(-_BIG)
    out = out.at[T:, S_BB_MAXY].set(-_BIG)
    return out


def rasterize_rows(rows, *, width: int, height: int,
                   interpret: bool | None = None, binned: bool | None = None,
                   has_uv1: bool = True, has_color: bool = True,
                   analytic_derivs: bool = True, **_compat):
    """Rasterize ROW-MAJOR setup (T, NSETUP) — the production entry point.

    Dispatches to the v5 group-binned kernel on hardware (row-major is
    its native layout: group g = rows[g*16:(g+1)*16] is one contiguous
    DMA burst); the dense kernel (interpret-mode tests) takes the
    transposed block."""
    if interpret is None:
        interpret = _interpret_default()
    if binned is None:
        binned = not interpret
    if binned:
        return rasterize16(rows, width=width, height=height,
                           interpret=interpret, has_uv1=has_uv1,
                           has_color=has_color,
                           analytic_derivs=analytic_derivs)
    return _rasterize_dense(rows.T, width=width, height=height,
                            interpret=interpret,
                            analytic_derivs=analytic_derivs)


def rasterize_slim_rows(rows, *, width: int, height: int,
                        interpret: bool | None = None,
                        binned: bool | None = None):
    """Coverage-only raster from row-major setup: (tri_id, depth) (H, W)
    planes, no attribute resolve. Ids are setup-row indices (== original
    pool ids in the unsorted prep_setup_rows layout), so they can gather
    setup rows directly. This is the MSAA sample pass (see
    rasterize16_slim)."""
    if interpret is None:
        interpret = _interpret_default()
    if binned is None:
        binned = not interpret
    if binned:
        col, depth = rasterize16_slim(rows, width=width, height=height,
                                      interpret=interpret)
        return col.reshape(height, width), depth.reshape(height, width)
    out = _rasterize_dense(rows.T, width=width, height=height,
                           interpret=interpret, slim=True,
                           analytic_derivs=False)
    return out["tri_id"], out["depth"]


def rasterize_layers_rows(rows, opaque_depth, *, width: int, height: int,
                          n_layers: int, interpret: bool | None = None,
                          binned: bool | None = None,
                          has_uv1: bool = True, has_color: bool = True,
                          analytic_derivs: bool = True):
    """Depth-peel K transparent layers front-to-back from row-major setup.

    Returns dict of (K, H*W) flat planes (same contract as
    rasterize_layers). Uses the v4 FAT peel kernel (one transpose of the
    transparent pool — resolving each peeled layer through the v5 slim
    path would cost one full-screen setup gather PER LAYER)."""
    return rasterize_layers(rows.T, opaque_depth, width=width, height=height,
                            n_layers=n_layers, interpret=interpret,
                            has_uv1=has_uv1, has_color=has_color,
                            analytic_derivs=analytic_derivs)


# ======================================================================
# v5 rasterizer: 16-triangle groups, sort-based pair binning, 16x16
# subtile merges.
#
# Measured on the 1080p stress scene (110k visible triangles, median
# screen bbox 5.6 px): the v4 streamed kernel's merge work is
# O(chunk-tile visits x CHUNK x tile pixels) = 8.5k x 128 x 1024
# ~ 1.1G triangle-pixel tests for ~2M useful ones. Finer granularity
# attacks exactly that product:
#   - triangles are fetched in GROUPs of 16 Morton-adjacent columns
#     (one contiguous (16, NSETUP) 4 KB DMA burst from the row-major
#     setup pool — no transpose anywhere),
#   - binning emits (coarse 32x32 tile, group) PAIRS with a 4-bit
#     16x16-subtile overlap mask, built with ONE device sort instead of
#     the O(tiles x chunks) overlap matrix + top_k,
#   - the merge runs per overlapped 16x16 SUBTILE (vector ops on
#     (8, 256)), cutting wasted pixels ~4x and wasted triangles ~8x.
# Giant triangles (group bbox spanning > K_SLOTS coarse tiles) would
# need unbounded pair slots; they go to a small global list that every
# tile scalar-tests (the reference's hardware rasterizer handles these
# in the fixed-function binner; CuRast-style software rasterizers use
# the same two-level split).
# ======================================================================

GROUP = 16            # triangles per fetch group (one 8 KB setup burst)
NSETUP_PAD = 128      # setup rows padded to the TPU lane width for DMA
SUB_TILE = 16         # merge granularity (16x16 pixel subtiles)
K_SLOTS = 32          # max coarse tiles a group may bin to before it is "big"
NBIG_STASH = 64       # big-group setups cached in VMEM by the MSAA kernel
# K_SLOTS was 8; at 8 the 1080p stress scene left ~70 "big" groups, and
# the kernels' big-group walk (every tile scalar-tests every big group,
# synchronous DMA per hit) cost ~16 ms/frame in the MSAA kernel alone
# (2040 tiles x 70 iterations). At 32 the walk shrinks to the truly
# giant geometry; the extra pair slots only grow the bin sort (~0.5 ms
# at 524k slots) — live pairs stay far under vis_cap.
NBIG_CAP = 512        # capacity of the global big-group list


def _ceil_log2(n: int) -> int:
    b = 0
    while (1 << b) < n:
        b += 1
    return b


def _group_zmin(setup_rows: jnp.ndarray, n_groups: int) -> jnp.ndarray:
    """Conservative per-group min NDC z (n_groups,) from row-major setup."""
    za, zb, zc = setup_rows[:, S_ZA], setup_rows[:, S_ZB], setup_rows[:, S_ZC]
    minx, maxx = setup_rows[:, S_BB_MINX], setup_rows[:, S_BB_MAXX]
    miny, maxy = setup_rows[:, S_BB_MINY], setup_rows[:, S_BB_MAXY]
    zx = jnp.minimum(za * minx, za * maxx)
    zy = jnp.minimum(zb * miny, zb * maxy)
    z = jnp.where(minx <= maxx, zc + zx + zy, _BIG)
    return z.reshape(n_groups, GROUP).min(axis=1)


def build_bins16(setup_rows: jnp.ndarray, *, width: int, height: int,
                 vis_cap: int = 65536, stash_cap: int = 128,
                 tile_h: int = BT_H, tile_w: int = BT_W,
                 pack_submask: bool = False):
    """Sort-based (tile, group) pair binning for the v5 kernel.

    setup_rows: (T, NSETUP) row-major, T a GROUP multiple. Coarse tiles
    are tile_h x tile_w (32x32 default; the MSAA kernel bins 64x64
    supersampled-space tiles = 32x32 display tiles). For every group
    whose bbox spans <= K_SLOTS coarse tiles, emit one pair per spanned
    tile, keyed (tile << rank_bits) | zmin_rank so each tile's list
    comes out near-to-far (hi-Z); the value packs the group id. ONE
    device-wide sort orders the pairs; searchsorted yields per-tile
    offsets/counts. Groups spanning more tiles go to the big list.

    pack_submask: entries become (group_id << 8) | (mask1 << 4) | mask0,
    where mask{h} bit q = qy*2+qx is set iff SUBGROUP h's own bbox (8
    consecutive triangles, not the whole 16-tri group) overlaps the
    tile's 2x2 quadrant q — the MSAA kernel merges per (subgroup,
    quadrant) and skips cleared bits. Morton-coherent subgroup bboxes
    are ~2x tighter than the group bbox, and slots where NEITHER
    subgroup touches the tile are dropped from the entry list entirely.

    Returns (entries (vis_cap,) i32, offsets (n_tiles,) i32,
             counts (n_tiles,) i32, zmin_g (G,) f32,
             big_packed (NBIG_CAP,) i32, big_ids (NBIG_CAP,) i32,
             n_big (1,) i32).
    """
    T = setup_rows.shape[0]
    assert T % GROUP == 0
    G = T // GROUP
    BT_H_, BT_W_ = tile_h, tile_w
    n_ty, n_tx = height // BT_H_, width // BT_W_
    n_tiles = n_ty * n_tx
    rank_bits = _ceil_log2(G)
    assert _ceil_log2(n_tiles) + rank_bits <= 30, (n_tiles, G)

    minx = setup_rows[:, S_BB_MINX].reshape(G, GROUP).min(axis=1)
    miny = setup_rows[:, S_BB_MINY].reshape(G, GROUP).min(axis=1)
    maxx = setup_rows[:, S_BB_MAXX].reshape(G, GROUP).max(axis=1)
    maxy = setup_rows[:, S_BB_MAXY].reshape(G, GROUP).max(axis=1)
    zmin_g = _group_zmin(setup_rows, G)
    nonempty = minx <= maxx

    tx0 = jnp.clip(jnp.floor(minx / BT_W_).astype(jnp.int32), 0, n_tx - 1)
    ty0 = jnp.clip(jnp.floor(miny / BT_H_).astype(jnp.int32), 0, n_ty - 1)
    # bbox max exactly on a tile boundary belongs to the lower tile only
    # (coverage test is px > maxx-exclusive at pixel centers)
    tx1 = jnp.clip(jnp.ceil(maxx / BT_W_).astype(jnp.int32) - 1, 0, n_tx - 1)
    ty1 = jnp.clip(jnp.ceil(maxy / BT_H_).astype(jnp.int32) - 1, 0, n_ty - 1)
    tx1 = jnp.maximum(tx1, tx0)
    ty1 = jnp.maximum(ty1, ty0)
    sw = tx1 - tx0 + 1
    sh = ty1 - ty0 + 1
    span = sw * sh
    small = nonempty & (span <= K_SLOTS)
    big = nonempty & (span > K_SLOTS)

    # near-first ranks (stable: equal zmin keeps index order for the
    # first-wins depth-tie rule)
    order = jnp.argsort(zmin_g)
    rank = jnp.argsort(order).astype(jnp.int32)

    # emit K_SLOTS pair slots per group
    j = jnp.arange(K_SLOTS, dtype=jnp.int32)[None, :]          # (1, K)
    sw_ = sw[:, None]
    tilex = tx0[:, None] + j % sw_                             # (G, K)
    tiley = ty0[:, None] + j // sw_
    slot_ok = small[:, None] & (j < span[:, None])
    tile = tiley * n_tx + tilex

    inval = jnp.int32(n_tiles << rank_bits)
    gids = jnp.arange(G, dtype=jnp.int32)[:, None]
    if pack_submask:
        assert _ceil_log2(G) + 8 <= 31, G
        n_sub = GROUP // SUB          # subgroups per group (= 2)
        # per-SUBGROUP bboxes: (G, n_sub)
        sminx = setup_rows[:, S_BB_MINX].reshape(G, n_sub, SUB).min(axis=2)
        sminy = setup_rows[:, S_BB_MINY].reshape(G, n_sub, SUB).min(axis=2)
        smaxx = setup_rows[:, S_BB_MAXX].reshape(G, n_sub, SUB).max(axis=2)
        smaxy = setup_rows[:, S_BB_MAXY].reshape(G, n_sub, SUB).max(axis=2)
        snonempty = sminx <= smaxx
        # quadrant overlap per subgroup: the tile pairing used the GROUP
        # bbox, so the subgroup must be tested against the whole tile
        # too (its own bbox may miss this tile entirely). Half-open
        # pixel-center convention as the tx0/tx1 span above: a bbox max
        # exactly on a boundary belongs to the lower side.
        tile_x0 = (tilex * BT_W_).astype(jnp.float32)[:, :, None]  # (G,K,1)
        tile_y0 = (tiley * BT_H_).astype(jnp.float32)[:, :, None]
        mid_x = tile_x0 + BT_W_ // 2
        mid_y = tile_y0 + BT_H_ // 2
        sx0 = sminx[:, None, :]                                    # (G,1,S)
        sx1 = smaxx[:, None, :]
        sy0 = sminy[:, None, :]
        sy1 = smaxy[:, None, :]
        lx = (sx0 < mid_x) & (sx1 > tile_x0)
        rx = (sx1 > mid_x) & (sx0 < tile_x0 + BT_W_)
        ty_ = (sy0 < mid_y) & (sy1 > tile_y0)
        by = (sy1 > mid_y) & (sy0 < tile_y0 + BT_H_)
        mask = ((lx & ty_) * 1 | (rx & ty_) * 2
                | (lx & by) * 4 | (rx & by) * 8).astype(jnp.int32)
        mask = jnp.where(snonempty[:, None, :], mask, 0)   # (G, K, n_sub)
        packed_mask = mask[:, :, 0]
        for h in range(1, n_sub):
            packed_mask = packed_mask | (mask[:, :, h] << (4 * h))
        # slots where no subgroup touches the tile carry no work: drop
        slot_ok = slot_ok & (packed_mask != 0)
        vals = jnp.broadcast_to(gids << 8, (G, K_SLOTS)) | packed_mask
    else:
        vals = jnp.broadcast_to(gids, (G, K_SLOTS))
    keys = jnp.where(slot_ok, (tile << rank_bits) | rank[:, None], inval)
    keys_s, vals_s = jax.lax.sort_key_val(keys.reshape(-1), vals.reshape(-1))

    bounds = (jnp.arange(n_tiles + 1, dtype=jnp.int32) << rank_bits)
    offs = jnp.searchsorted(keys_s, bounds).astype(jnp.int32)
    counts = offs[1:] - offs[:-1]
    offsets = jnp.minimum(offs[:-1], vis_cap)
    counts = jnp.minimum(jnp.minimum(counts, vis_cap - offsets), stash_cap - 1)
    entries = jax.lax.slice(jnp.pad(vals_s, (0, max(0, vis_cap - keys.size))),
                            (0,), (vis_cap,))

    # big list: compact near-first
    bigkey = jnp.where(big, rank, jnp.int32(0x7FFFFFFF))
    bk_s, bid_s = jax.lax.sort_key_val(bigkey, jnp.arange(G, dtype=jnp.int32))
    pad_b = max(0, NBIG_CAP - G)
    big_ids = jax.lax.slice(jnp.pad(bid_s, (0, pad_b)), (0,), (NBIG_CAP,))
    n_big = jnp.minimum(jnp.sum(big.astype(jnp.int32)), NBIG_CAP)[None]
    bp = (jnp.clip(tx0, 0, 255) | (jnp.clip(ty0, 0, 255) << 8)
          | (jnp.clip(tx1, 0, 255) << 16) | (jnp.clip(ty1, 0, 255) << 24))
    big_packed = jax.lax.slice(jnp.pad(bp[bid_s], (0, pad_b)), (0,), (NBIG_CAP,))
    return entries, offsets, counts, zmin_g, big_packed, big_ids, n_big


def _swizzle16(img: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(H, W) image -> (n_tiles, 8, 128) row-major 32x32 tile blocks."""
    n_ty, n_tx = height // BT_H, width // BT_W
    x = img.reshape(n_ty, BT_H, n_tx, BT_W).swapaxes(1, 2)
    return x.reshape(n_ty * n_tx, 8, 128)


def _deswizzle16(tiles: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(n_tiles, 8, 128) row-major tile blocks -> (H, W) image."""
    n_ty, n_tx = height // BT_H, width // BT_W
    x = tiles.reshape(n_ty, n_tx, BT_H, BT_W).swapaxes(1, 2)
    return x.reshape(height, width)


def _make_v5_kernel(peel: bool, n_tx: int, stash_cap: int = 128,
                    prefetch: int = 4):
    """grid = (n_tiles,); one step rasterizes one 32x32 tile, SLIM.

    Walks the tile's binned groups with depth-`prefetch` async DMA into a
    per-entry stash, merging (z, winner setup-column) over the whole
    1024-pixel tile. Measured verdicts behind this shape (1080p stress,
    110k visible triangles):
      - in-kernel winner-attribute resolution is out: select trees are
        the v4-dense cost, and per-entry vector-reduce -> lax.cond hit
        tests drain the VPU pipeline (~90k drains = 250+ ms). Attributes
        resolve OUTSIDE with one XLA gather (rasterize16).
      - per-16x16-subtile merges with 4-bit submask conds lose to
        unconditional whole-tile merges (9.5 vs 7.3 ms): a scalar cond
        costs ~28 ns, the skipped quarter-tile merge ~47 ns.
      - double-buffered DMA + merges alone run ~4.9 ms; the merge ALU
        matches the 176-cycle/subgroup model exactly.
    """
    npx = BT_H * BT_W

    def _kernel(entries_ref, off_ref, cnt_ref, zmin_ref,
                bigp_ref, bigid_ref, nbig_ref, setup_ref, *refs):
        if peel:
            zlo_ref, zhi_ref = refs[0], refs[1]
            refs = refs[2:]
        outs = refs[:2]
        stash, sem = refs[2], refs[3]

        t = pl.program_id(0)
        cnt = cnt_ref[t]
        off = off_ref[t]
        tile_x = t % n_tx
        tile_y = t // n_tx
        tx0 = (tile_x * BT_W).astype(jnp.float32)
        ty0 = (tile_y * BT_H).astype(jnp.float32)

        flat = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        px = tx0 + (flat % BT_W).astype(jnp.float32) + 0.5
        py = ty0 + (flat // BT_W).astype(jnp.float32) + 0.5
        zbounds = None
        if peel:
            zbounds = (zlo_ref[0].reshape(1, npx), zhi_ref[0].reshape(1, npx))

        def start(b):
            g = entries_ref[off + b]
            pltpu.make_async_copy(
                setup_ref.at[g], stash.at[b], sem.at[jax.lax.rem(b, prefetch)]
            ).start()

        def wait(b):
            pltpu.make_async_copy(
                setup_ref.at[0], stash.at[b], sem.at[jax.lax.rem(b, prefetch)]
            ).wait()

        for w in range(prefetch - 1):
            @pl.when(w < cnt)
            def _prefetch(w=w):
                start(w)

        state0 = (jnp.full((1, npx), 1.0, jnp.float32),
                  jnp.full((1, npx), -1, jnp.int32))

        def body(b, state):
            @pl.when(b + prefetch - 1 < cnt)
            def _next():
                start(b + prefetch - 1)

            wait(b)
            g = entries_ref[off + b]
            P16 = stash[b][:, :NSETUP]           # (GROUP, NSETUP)
            for h in range(GROUP // SUB):
                state = _merge_subgroup(
                    P16[h * SUB:(h + 1) * SUB], px, py, state,
                    zbounds, col_base=g * GROUP + h * SUB)
            return state

        state = jax.lax.fori_loop(0, cnt, body, state0)

        # ---- big-group walk (global list, scalar bbox test per tile) ------
        def bigbody(i, state):
            g = bigid_ref[i]
            bb = bigp_ref[i]
            gx0 = bb & 255
            gy0 = (bb >> 8) & 255
            gx1 = (bb >> 16) & 255
            gy1 = (bb >> 24) & 255
            hit = ((gx0 <= tile_x) & (tile_x <= gx1)
                   & (gy0 <= tile_y) & (tile_y <= gy1))

            def m(state, g=g):
                dma = pltpu.make_async_copy(
                    setup_ref.at[g], stash.at[stash_cap - 1], sem.at[0])
                dma.start()
                dma.wait()
                P16 = stash[stash_cap - 1][:, :NSETUP]
                for h in range(GROUP // SUB):
                    state = _merge_subgroup(
                        P16[h * SUB:(h + 1) * SUB], px, py, state,
                        zbounds, col_base=g * GROUP + h * SUB)
                return state

            return jax.lax.cond(hit, m, lambda st: st, state)

        state = jax.lax.fori_loop(0, nbig_ref[0], bigbody, state)

        z, col = state
        outs[0][0] = col.reshape(8, 128)
        outs[1][0] = z.reshape(8, 128)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("width", "height", "interpret", "has_uv1",
                              "has_color", "analytic_derivs", "vis_cap",
                              "stash_cap", "row_offset", "height_full")
)
def rasterize16(setup_rows, zlo=None, zhi=None, bins=None, *, width: int,
                height: int, interpret: bool | None = None,
                has_uv1: bool = True, has_color: bool = True,
                analytic_derivs: bool = True,
                vis_cap: int = 65536, stash_cap: int = 128,
                row_offset: int = 0, height_full: int | None = None):
    """v5 rasterizer over ROW-MAJOR setup (T, NSETUP) — see the v5 banner.

    The kernel emits a slim (winner column, depth) buffer; attribute
    planes are resolved here with ONE gather of the winners' setup rows
    plus pure ALU (shade.resolve_gbuffer — the same math the reference's
    deferred shade runs per pixel, material_opaque compute.wgsl).

    width/height must fit BT (32) padding; T a GROUP multiple. Pass
    zlo/zhi (H, W) planes for depth peeling; row_offset/height_full for
    band-sharded rendering. Returns the same plane dict as `rasterize`.
    """
    from .shade import resolve_planes_fused

    if interpret is None:
        interpret = _interpret_default()
    names, _attr_rows = plane_layout(has_uv1, has_color, False,
                                     analytic_derivs)
    col, depth = rasterize16_slim(
        setup_rows, zlo, zhi, bins, width=width, height=height,
        interpret=interpret, vis_cap=vis_cap, stash_cap=stash_cap)

    resolved = resolve_planes_fused(
        col, setup_rows, width=width, height_full=height_full or height,
        row_offset=row_offset, interpret=interpret)
    resolved["depth"] = depth
    return {k: resolved[k].reshape(height, width) for k in names}


def rasterize16_slim(setup_rows, zlo=None, zhi=None, bins=None, *,
                     width: int, height: int,
                     interpret: bool | None = None,
                     vis_cap: int = 65536, stash_cap: int = 128):
    """The v5 kernel's coverage stage alone: (winner column id, depth) as
    flat (H*W,) planes, no attribute resolve. This is also the MSAA
    sample pass — run at the supersampled resolution it gives per-sample
    coverage at a fraction of a full supersampled shade (hardware MSAA
    semantics: multi-sample depth/coverage, per-pixel shading —
    anti_alias.rs msaa_sample_count=4)."""
    if interpret is None:
        interpret = _interpret_default()
    peel = zlo is not None
    T = setup_rows.shape[0]
    assert T % GROUP == 0, T
    W32 = -(-width // BT_W) * BT_W
    H32 = -(-height // BT_H) * BT_H
    n_ty, n_tx = H32 // BT_H, W32 // BT_W
    n_tiles = n_ty * n_tx

    if bins is None:
        bins = build_bins16(setup_rows, width=W32, height=H32,
                            vis_cap=vis_cap, stash_cap=stash_cap)
    # Mosaic requires HBM DMA slices 128-aligned on the minor dim; pad the
    # 64 setup rows to 128 (the spare columns are headroom for future
    # per-sample coverage planes). One fused pad, ~0.3 ms at 524k tris.
    rows_p = jnp.pad(setup_rows, ((0, 0), (0, NSETUP_PAD - NSETUP)))
    setup_blocked = rows_p.reshape(T // GROUP, GROUP, NSETUP_PAD)

    def tile_map(t, *_refs):
        return (t, 0, 0)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [setup_blocked]
    if peel:
        pad = ((0, H32 - zlo.shape[0]), (0, W32 - zlo.shape[1]))
        in_specs += [
            pl.BlockSpec((1, 8, 128), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), tile_map, memory_space=pltpu.VMEM),
        ]
        args += [
            _swizzle16(jnp.pad(zlo, pad), H32, W32),
            _swizzle16(jnp.pad(zhi, pad, constant_values=1.0), H32, W32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(
            pl.BlockSpec((1, 8, 128), tile_map, memory_space=pltpu.VMEM)
            for _ in range(2)
        ),
        scratch_shapes=[
            pltpu.VMEM((stash_cap, GROUP, NSETUP_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out_shape = (
        jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
    )
    col, depth = pl.pallas_call(
        _make_v5_kernel(peel=peel, n_tx=n_tx, stash_cap=stash_cap),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*bins, *args)
    col = _deswizzle16(col, H32, W32)[:height, :width].reshape(-1)
    depth = _deswizzle16(depth, H32, W32)[:height, :width].reshape(-1)
    return col, depth


# ======================================================================
# MSAA-4x-native v5 kernel: one sweep over 32x32 DISPLAY tiles, four
# per-sample (z, winner) states per pixel.
#
# The naive MSAA path (rasterize16_slim at 2x2 the display resolution,
# then stride-2 slice out the 4 sample planes) measured 63 ms of raster
# + ~100 ms of de-interleave at 1080p on v5e: XLA lowers [i::2, j::2]
# lane-strided slices as 2M-row gathers (~24 ms EACH), and the 4x tile
# count quadruples binning pairs, DMA bursts and tile iterations. This
# kernel instead evaluates each triangle's plane equations at the 2x2
# supersampled sample positions INCREMENTALLY (sample spacing is 1.0 in
# supersampled coordinates, so E(s+1) = E(s) + A — one vector add per
# edge instead of two madds), keeps 4 winner states, and writes the 4
# sample-id planes + the min sample depth directly at display layout.
# Hardware-MSAA cost model (anti_alias.rs msaa_sample_count=4): 4x
# coverage/depth tests, 1x everything else.
# ======================================================================


def _merge_subgroup_msaa(P, px, py, states, col_base):
    """Merge SUB triangles into 4 per-sample winner states.

    px/py: (1, npx) SUPERSAMPLED coordinates of each display pixel's
    top-left sample center; sample (i, j) sits at (px + j, py + i).
    states: tuple of 4 (z (1,npx) f32, col (1,npx) i32), sample order
    [top-left, top-right, bottom-left, bottom-right] (matching the
    frame's `samp` list). Top-left fill rule + depth-tie column order
    identical to _merge_subgroup."""
    out = []
    for s, (zmin, win) in enumerate(_msaa_sample_winners(P, px, py)):
        zs, cs = states[s]
        take = zmin < zs
        out.append((jnp.where(take, zmin, zs),
                    jnp.where(take, col_base + win, cs)))
    return tuple(out)


def _msaa_sample_winners(P, px, py):
    """Per-sample (zmin, winner-local-index) for P.shape[0] triangles at
    the 4 MSAA sample positions. The far-plane test (z <= 1) is left out
    on purpose: winner states initialize at z = 1.0 and the take rule is
    a strict less-than, so a candidate with z >= 1 can never land — the
    min against _BIG-filled misses gives bit-identical states without
    the two extra vector ops per sample."""
    nsub = P.shape[0]
    npx = px.shape[1]

    def col(r):
        return P[:, r : r + 1]

    zero = jnp.float32(0.0)
    edges = []
    for ra, rb, rc in ((S_E0A, S_E0B, S_E0C), (S_E1A, S_E1B, S_E1C),
                       (S_E2A, S_E2B, S_E2C)):
        a, b, c = col(ra), col(rb), col(rc)
        e00 = a * px + (b * py + c)
        tl = (a > 0) | ((a == 0) & (b > 0))
        thr = jnp.where(tl, zero, jnp.float32(_FMIN))
        edges.append((e00, a, b, thr))
    za, zb = col(S_ZA), col(S_ZB)
    z00 = za * px + (zb * py + col(S_ZC))

    local = jax.lax.broadcasted_iota(jnp.int32, (nsub, npx), 0)
    out = []
    for s, (i, j) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        cover = None
        for (e00, a, b, thr) in edges:
            e = e00
            if j:
                e = e + a
            if i:
                e = e + b
            c_ = e >= thr
            cover = c_ if cover is None else (cover & c_)
        z = z00
        if j:
            z = z + za
        if i:
            z = z + zb
        zc = jnp.where(cover & (z >= 0.0), z, _BIG)
        zmin = jnp.min(zc, axis=0, keepdims=True)
        idx_m = jnp.where(zc == zmin, local, nsub)
        win = jnp.min(idx_m, axis=0, keepdims=True)
        out.append((zmin, win))
    return out


def _merge_subgroup_msaa_scratch(P, px, py, zs_ref, cs_ref, q, col_base):
    """Scratch-state MSAA merge: winner rows q*4+s of the (16, npx)
    VMEM scratch refs are updated in place. Side-effect form so the
    per-(subgroup, quadrant) gating can be a pl.when branch — the
    loop-carried-tuple form made every lax.cond marshal 8 KB of state,
    measured ~51 ns/cond vs ~65 ns for the merge it skipped
    (scripts/bench_msaa_isolate.py: nocond 10.79 ms beat the gated
    11.46 ms on the 1080p stress scene)."""
    for s, (zmin, win) in enumerate(_msaa_sample_winners(P, px, py)):
        r = q * 4 + s
        zs = zs_ref[r : r + 1, :]
        cs = cs_ref[r : r + 1, :]
        take = zmin < zs
        zs_ref[r : r + 1, :] = jnp.where(take, zmin, zs)
        cs_ref[r : r + 1, :] = jnp.where(take, col_base + win, cs)


def _make_v5_msaa_kernel(n_tx: int, prefetch: int = 4):
    """grid = (display tiles,); outputs 4 sample-id planes + min depth.

    The tile splits into 2x2 QUADRANTS of 16x16 display pixels; each
    binned entry carries a 4-bit quadrant-overlap mask (build_bins16
    pack_submask) and the merge runs per overlapped quadrant only — a
    ~6 px triangle touches 1-2 of the 4, so the whole-tile merge wasted
    >2x the lanes (measured: 29.5 -> ~20 ms on the 1080p stress scene).
    The lax.cond cost (~28 ns) is small against the MSAA merge's 4
    winner states per subgroup (~400 ns/quadrant). Output planes are
    quadrant-major (q*256 + fy*16 + fx) — _deswizzle_msaa undoes it.

    Stash is a PREFETCH-slot ring (the DMA pipeline only ever has
    `prefetch` copies in flight; slot b%prefetch was fully consumed at
    iteration b-prefetch), so per-tile entry counts are unbounded — no
    silent stash_cap clamp. Slot `prefetch` is the big-group scratch.

    Winner states live in VMEM scratch (zs/cs, row = q*4 + s), NOT in
    the fori carry: with carried state every per-(subgroup, quadrant)
    lax.cond marshalled 8 KB of state (~51 ns each, 8/entry — more
    than the ~65 ns merges they skipped at 28% mask density). As
    pl.when side effects the gate is a plain branch."""
    npx = (BT_H * BT_W) // 4      # pixels per quadrant

    def _kernel(entries_ref, off_ref, cnt_ref, zmin_ref,
                bigp_ref, bigid_ref, nbig_ref, setup_ref, *refs):
        outs = refs[:5]
        stash, sem, zs_ref, cs_ref = refs[5], refs[6], refs[7], refs[8]

        t = pl.program_id(0)
        cnt = cnt_ref[t]
        off = off_ref[t]
        tile_x = t % n_tx
        tile_y = t // n_tx

        flat = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
        fx = flat % (BT_W // 2)
        fy = flat // (BT_W // 2)
        pxq, pyq = [], []
        for q in range(4):
            qx, qy = q % 2, q // 2
            pxd = (tile_x * BT_W + qx * (BT_W // 2) + fx).astype(jnp.float32)
            pyd = (tile_y * BT_H + qy * (BT_H // 2) + fy).astype(jnp.float32)
            pxq.append(2.0 * pxd + 0.5)   # supersampled coords, sample (0,0)
            pyq.append(2.0 * pyd + 0.5)

        def start(b):
            g = entries_ref[off + b] >> 8
            pltpu.make_async_copy(
                setup_ref.at[g], stash.at[jax.lax.rem(b, prefetch)],
                sem.at[jax.lax.rem(b, prefetch)]
            ).start()

        def wait(b):
            pltpu.make_async_copy(
                setup_ref.at[0], stash.at[jax.lax.rem(b, prefetch)],
                sem.at[jax.lax.rem(b, prefetch)]
            ).wait()

        # big-group setup cache: filled ONCE at tile 0 (VMEM scratch
        # persists across grid steps), so the per-(tile, big-group) walk
        # below reads VMEM instead of paying a synchronous 8 KB HBM DMA
        # per hit — giant groups span hundreds of tiles and the per-hit
        # DMA latency dominated the walk
        cached = jnp.minimum(nbig_ref[0], NBIG_STASH)

        @pl.when(t == 0)
        def _fill_big_cache():
            def cp(i, c):
                d = pltpu.make_async_copy(
                    setup_ref.at[bigid_ref[i]], stash.at[prefetch + i],
                    sem.at[0])
                d.start()
                d.wait()
                return c
            jax.lax.fori_loop(0, cached, cp, 0)

        for w in range(prefetch - 1):
            @pl.when(w < cnt)
            def _prefetch(w=w):
                start(w)

        # winner-state scratch init (persists across grid steps)
        zs_ref[...] = jnp.ones((16, npx), jnp.float32)
        cs_ref[...] = jnp.full((16, npx), -1, jnp.int32)

        def merge_quad(P16, g, q):
            _merge_subgroup_msaa_scratch(
                P16, pxq[q], pyq[q], zs_ref, cs_ref, q,
                col_base=g * GROUP)

        def body(b, carry):
            @pl.when(b + prefetch - 1 < cnt)
            def _next():
                start(b + prefetch - 1)

            wait(b)
            e = entries_ref[off + b]
            g = e >> 8
            P16 = stash[jax.lax.rem(b, prefetch)][:, :NSETUP]
            # per-quadrant gating: bits 4*h + q of e say whether
            # subgroup h's bbox overlaps quadrant q (build_bins16
            # pack_submask). The merge runs 16-wide over the WHOLE
            # group whenever either subgroup's bit is set — triangles
            # whose bbox misses the quadrant cover no pixel there, so
            # the extra lanes can't take state (bit-exact), and one
            # 16-wide merge + 4 whens/entry beat two 8-wide merges + 8
            # whens (8.04 vs 8.89 ms, scripts/bench_msaa_isolate.py)
            for q in range(4):
                @pl.when(((e >> q) & 0x11) != 0)
                def _m(q=q):
                    _merge_subgroup_msaa_scratch(
                        P16, pxq[q], pyq[q], zs_ref, cs_ref, q,
                        col_base=g * GROUP)
            return carry

        jax.lax.fori_loop(0, cnt, body, 0)

        def bigbody(i, carry):
            g = bigid_ref[i]
            bb = bigp_ref[i]
            gx0 = bb & 255
            gy0 = (bb >> 8) & 255
            gx1 = (bb >> 16) & 255
            gy1 = (bb >> 24) & 255
            hit = ((gx0 <= tile_x) & (tile_x <= gx1)
                   & (gy0 <= tile_y) & (tile_y <= gy1))

            @pl.when(hit)
            def _m(g=g, i=i):
                def from_cache():
                    return stash[prefetch + i][:, :NSETUP]

                def from_dma():
                    dma = pltpu.make_async_copy(
                        setup_ref.at[g], stash.at[prefetch + NBIG_STASH],
                        sem.at[0])
                    dma.start()
                    dma.wait()
                    return stash[prefetch + NBIG_STASH][:, :NSETUP]

                P16 = jax.lax.cond(i < cached, from_cache, from_dma)
                for q in range(4):
                    merge_quad(P16, g, q)
            return carry

        jax.lax.fori_loop(0, nbig_ref[0], bigbody, 0)

        for s in range(4):
            cols = jnp.concatenate(
                [cs_ref[q * 4 + s : q * 4 + s + 1, :] for q in range(4)],
                axis=1)
            outs[s][0] = cols.reshape(8, 128)
        zmin = jnp.concatenate(
            [jnp.minimum(
                jnp.minimum(zs_ref[q * 4 : q * 4 + 1, :],
                            zs_ref[q * 4 + 1 : q * 4 + 2, :]),
                jnp.minimum(zs_ref[q * 4 + 2 : q * 4 + 3, :],
                            zs_ref[q * 4 + 3 : q * 4 + 4, :]))
             for q in range(4)], axis=1)
        outs[4][0] = zmin.reshape(8, 128)

    return _kernel


def _deswizzle_msaa(tiles: jnp.ndarray, height: int, width: int):
    """(n_tiles, 8, 128) quadrant-major 32x32 tile blocks -> (H, W):
    flat in-tile index = q*256 + fy*16 + fx, q = qy*2 + qx."""
    n_ty, n_tx = height // BT_H, width // BT_W
    x = tiles.reshape(n_ty, n_tx, 2, 2, BT_H // 2, BT_W // 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)     # [ty, qy, fy, tx, qx, fx]
    return x.reshape(height, width)


def rasterize16_msaa(setup_rows, *, width2: int, height2: int,
                     interpret: bool | None = None, vis_cap: int = 65536):
    """MSAA-4x coverage raster from row-major setup in SUPERSAMPLED
    coordinates (width2 = 2x display width, even).

    Returns (samp [4 x (H1, W1) i32 sample-winner planes, order
    tl/tr/bl/br], depth1 (H1, W1) f32 min-sample depth) at display
    resolution H1 = height2 // 2, W1 = width2 // 2. Ids are setup-row
    indices (== original pool ids in the unsorted prep_setup_rows
    layout), exactly like rasterize_slim_rows' tid plane."""
    if interpret is None:
        interpret = _interpret_default()
    H1, W1 = height2 // 2, width2 // 2
    if interpret:
        # interpret-mode fallback: dense slim raster at 2x + host-style
        # slicing (matches the kernel bit-for-bit; CPU tests only)
        out = _rasterize_dense(setup_rows.T, width=width2, height=height2,
                               interpret=True, slim=True,
                               analytic_derivs=False)
        tid2, depth2 = out["tri_id"], out["depth"]
        samp = [tid2[i::2, j::2] for i in (0, 1) for j in (0, 1)]
        depth1 = depth2.reshape(H1, 2, W1, 2).min(axis=(1, 3))
        return samp, depth1

    T = setup_rows.shape[0]
    assert T % GROUP == 0, T
    # pad supersampled space to 64-multiples = display 32x32 tiles
    W64 = -(-width2 // (2 * BT_W)) * (2 * BT_W)
    H64 = -(-height2 // (2 * BT_H)) * (2 * BT_H)
    n_ty, n_tx = H64 // (2 * BT_H), W64 // (2 * BT_W)
    n_tiles = n_ty * n_tx

    bins = build_bins16(setup_rows, width=W64, height=H64, vis_cap=vis_cap,
                        stash_cap=4096, tile_h=2 * BT_H, tile_w=2 * BT_W,
                        pack_submask=True)
    rows_p = jnp.pad(setup_rows, ((0, 0), (0, NSETUP_PAD - NSETUP)))
    setup_blocked = rows_p.reshape(T // GROUP, GROUP, NSETUP_PAD)

    prefetch = 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(5)
        ),
        scratch_shapes=[
            # ring slots + NBIG_STASH big-group cache + 1 overflow slot
            pltpu.VMEM((prefetch + NBIG_STASH + 1, GROUP, NSETUP_PAD),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((prefetch,)),
            # winner state: row q*4 + s = (quadrant, sample) z / col
            pltpu.VMEM((16, (2 * BT_H) * (2 * BT_W) // 16), jnp.float32),
            pltpu.VMEM((16, (2 * BT_H) * (2 * BT_W) // 16), jnp.int32),
        ],
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((n_tiles, 8, 128),
                             jnp.int32 if i < 4 else jnp.float32)
        for i in range(5))
    outs = pl.pallas_call(
        _make_v5_msaa_kernel(n_tx=n_tx, prefetch=prefetch),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*bins, setup_blocked)
    # NB: do NOT optimization_barrier these outputs — measured 24.5 ms
    # vs 12.0 ms without (the barrier forces a hostile materialization
    # between the kernel and the deswizzle transposes)
    Hd, Wd = H64 // 2, W64 // 2
    samp = [_deswizzle_msaa(outs[s], Hd, Wd)[:H1, :W1] for s in range(4)]
    depth1 = _deswizzle_msaa(outs[4], Hd, Wd)[:H1, :W1]
    return samp, depth1
