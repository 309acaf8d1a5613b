"""Temporal reuse (TAA) — reprojection, validity, and invalid-unit-only
shading support.

The reference carries the scaffolding for exactly this but never turns it
on: camera.rs:13 `APPLY_JITTER = false`, `get_halton_jitter` (camera.rs:257),
and the `frame_count` uniform field. This module is the TPU-native
realization: the camera jitters by a centered Halton(2,3) subpixel offset
each frame, the frame keeps a HISTORY of the shaded opaque HDR plus the
winner tri-id and depth planes, and each new frame

1. rasterizes ONLY ids + depth (the v5 slim kernel, ops/raster.py
   rasterize16_slim — the cheap half of the geometry pass),
2. reprojects every pixel into the previous frame with the UNJITTERED
   matrices (classic TAA practice: jitter must not appear in motion
   vectors),
3. validates per pixel — same winner triangle id at the reprojected
   location and consistent depth — and reduces validity to the shading
   layout's native (8, 128) units,
4. shades ONLY the invalid units (plus an age-based round-robin refresh
   so view-dependent shading never goes stale), reusing history
   everywhere else, and
5. blends reshaded pixels whose history is still valid (exponential
   accumulation = the anti-aliasing; jittered samples of a static scene
   converge to the pixel-footprint average).

TPU-native design notes (the reprojection kernel):
- History lives as CHANNEL PLANES packed into one (5, H, W) f32 array
  [r, g, b, tri_id(bitcast), depth] — never as (P, C) rows. A per-pixel
  gather of a 2M-row history table would cost ~4-6 ms at the measured
  promoted-gather floor and compete with the texel pool for the
  alternate-memory budget (BASELINE.md); instead each (8, 128) unit
  DMAs a (5, 24, 384) TILE-ALIGNED window of the history around its
  mean reprojection target (scalar prefetch picks the block origin).
  Mosaic only slices memrefs at tile granularity — (8, 128) for f32 —
  in every memory space, so the sub-tile part of the unit's offset is
  cancelled IN-KERNEL with one dynamic rotate (pltpu.roll, which takes
  traced shift amounts), after which the per-pixel ±RESID residual fan
  is all STATIC slices. A two-slot ring overlaps DMA with compute;
  traffic ~184 kB/unit ≈ 375 MB/frame at 1080p ≈ 0.5 ms of HBM
  bandwidth. Any offset MAGNITUDE works (the window lands anywhere in
  the image); only the ±RESID within-unit spread is bounded.
- Pixels whose residual falls outside the ±RESID fan, whose source
  falls off-screen, or whose unit mean is degenerate are simply
  INVALID — correctness never depends on the window; coverage does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6

# residual select fan half-width (pixels): candidates dy, dx ∈ [-R, R]
RESID = 2
# per-unit history window: 3x3 TILE-ALIGNED blocks of the (8, 128) unit
# grid — Mosaic only slices memrefs at tile granularity (8 rows / 128
# lanes), so the DMA fetches aligned blocks and a dynamic rotate
# (tpu.dynamic_rotate) cancels the sub-tile residue in-kernel
WIN_H = 24
WIN_W = 384
N_HIST = 5     # r, g, b, tid (bitcast f32), depth


def pack_history(r, g, b, tid, depth, H: int, W: int) -> jnp.ndarray:
    """Channel planes → (5, H, W) f32 history array. tid is bitcast, not
    cast: the kernel compares ids as integers (a float compare would
    break on the -2 'never matches' reset sentinel and NaN payloads)."""
    planes = [r.reshape(H, W), g.reshape(H, W), b.reshape(H, W),
              jax.lax.bitcast_convert_type(
                  tid.reshape(H, W), jnp.float32),
              depth.reshape(H, W)]
    return jnp.stack(planes, axis=0)


def reset_history(H: int, W: int) -> jnp.ndarray:
    """All-invalid history: tid plane = -2 (matches nothing, including
    the -1 miss id), colors/depth zero."""
    import numpy as np

    h = np.zeros((N_HIST, H, W), np.float32)
    h[3] = np.frombuffer(
        np.full((1,), -2, np.int32).tobytes(), np.float32)[0]
    return jnp.asarray(h)


def temporal_offsets(cam, depth, *, width: int, height: int):
    """Per-pixel reprojection offsets from camera motion (static scene).

    cam must carry 'inv_view_proj_nj' (current, unjittered) and
    'prev_view_proj' (previous frame, unjittered). Returns
    (off_x, off_y, exp_z): (H, W) f32 planes — offset = prev_pixel -
    cur_pixel in display pixels, exp_z = the NDC depth this pixel should
    find in the history depth plane. All-ALU on (H, W) planes; XLA fuses
    it into the consumers."""
    H, W = height, width
    d = depth.reshape(H, W)
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(H, dtype=jnp.float32) + 0.5) / H * 2.0
    nx = jnp.broadcast_to(xs[None, :], (H, W))
    ny = jnp.broadcast_to(ys[:, None], (H, W))
    ivp = cam["inv_view_proj_nj"]
    wp = [nx * ivp[j, 0] + ny * ivp[j, 1] + d * ivp[j, 2] + ivp[j, 3]
          for j in range(4)]
    pvp = cam["prev_view_proj"]
    # prev_clip = pvp @ (wp / wp.w) — the 1/wp.w cancels in the ndc
    # divide, so compose directly on homogeneous wp (saves a divide)
    pc = [wp[0] * pvp[j, 0] + wp[1] * pvp[j, 1] + wp[2] * pvp[j, 2]
          + wp[3] * pvp[j, 3] for j in range(4)]
    iw = 1.0 / jnp.where(jnp.abs(pc[3]) > _EPS, pc[3],
                         jnp.where(pc[3] >= 0, _EPS, -_EPS))
    pnx = pc[0] * iw
    pny = pc[1] * iw
    exp_z = pc[2] * iw
    # behind-the-camera reprojections get pushed far off-screen (invalid
    # via the in-bounds check) rather than wrapping through the divide
    behind = pc[3] <= _EPS
    px = (pnx + 1.0) * 0.5 * W - 0.5
    py = (1.0 - pny) * 0.5 * H - 0.5
    big = jnp.float32(1e6)
    off_x = jnp.where(behind, big, px - (nx + 1.0) * 0.5 * W + 0.5)
    off_y = jnp.where(behind, big, py - (1.0 - ny) * 0.5 * H + 0.5)
    return off_x, off_y, exp_z


def _unit_scalars(off_x, off_y, *, width: int, height: int,
                  win_h: int = WIN_H, win_w: int = WIN_W):
    """Per-unit window placement from the unit-mean offsets. Returns
    (n_units, 8) i32: [R0, C0, sy0, sx0, ok, 0, 0, 0]: (R0, C0) is the
    TILE-ALIGNED window origin (8-row / 128-lane multiples — the only
    offsets a memref slice may take), (sy0, sx0) the sub-window anchor
    residue the kernel cancels with a dynamic rotate. The desired
    anchor is (unit origin + rounded mean offset - RESID); interior
    units always fit, units clamped at an image border may carry an
    anchor mismatch which the per-pixel residual check absorbs up to
    ±RESID and invalidates beyond (border units reshade under outward
    motion — a cost, never a correctness loss). ok=0 marks degenerate
    means."""
    H, W = height, width
    n_ty, n_tx = H // 8, W // 128

    def unit_mean(p):
        m = p.reshape(n_ty, 8, n_tx, 128).mean(axis=(1, 3))
        return jnp.nan_to_num(m, nan=1e6, posinf=1e6, neginf=-1e6)

    my = unit_mean(off_y)
    mx = unit_mean(off_x)
    ay = jnp.round(my).astype(jnp.int32)                 # (n_ty, n_tx)
    ax = jnp.round(mx).astype(jnp.int32)
    uby = jnp.arange(n_ty, dtype=jnp.int32)[:, None]
    ubx = jnp.arange(n_tx, dtype=jnp.int32)[None, :]
    s_y = uby * 8 + ay - RESID          # desired subwindow start (rows)
    s_x = ubx * 128 + ax - RESID
    R0 = jnp.clip((s_y // 8) * 8, 0, H - win_h)
    C0 = jnp.clip((s_x // 128) * 128, 0, W - win_w)
    sy0 = jnp.clip(s_y - R0, 0, max(0, win_h - 8 - 2 * RESID))
    sx0 = jnp.clip(s_x - C0, 0, max(0, win_w - 128 - 2 * RESID))
    ok = jnp.isfinite(my) & jnp.isfinite(mx) & (jnp.abs(my) < 1e5) \
        & (jnp.abs(mx) < 1e5)
    zeros = jnp.zeros_like(R0)
    scal = jnp.stack(
        [R0, C0, sy0, sx0, ok.astype(jnp.int32), zeros, zeros, zeros],
        axis=-1)
    return scal.reshape(n_ty * n_tx, 8)


def _reproject_kernel(n_tx: int, win_h: int = WIN_H, win_w: int = WIN_W):
    R = RESID

    def kernel(scal_ref, hist_ref, offx_ref, offy_ref, expz_ref, ctid_ref,
               out_r, out_g, out_b, out_v, scratch, sems):
        u = pl.program_id(0)
        n_units = pl.num_programs(0)

        def dma(i, slot):
            # multiple_of: _unit_scalars constructs R0/C0 tile-aligned;
            # Mosaic needs the proof to slice a tiled memref
            r0 = pl.multiple_of(scal_ref[i, 0], 8)
            c0 = pl.multiple_of(scal_ref[i, 1], 128)
            return pltpu.make_async_copy(
                hist_ref.at[:, pl.ds(r0, win_h), pl.ds(c0, win_w)],
                scratch.at[slot], sems.at[slot])

        @pl.when(u == 0)
        def _():
            dma(0, 0).start()

        @pl.when(u + 1 < n_units)
        def _():
            dma(u + 1, (u + 1) % 2).start()

        dma(u, u % 2).wait()
        win = scratch[u % 2]                       # (5, win_h, win_w)

        R0 = scal_ref[u, 0]
        C0 = scal_ref[u, 1]
        sy0 = scal_ref[u, 2]
        sx0 = scal_ref[u, 3]
        ok = scal_ref[u, 4]

        # cancel the sub-tile anchor residue with dynamic rotates
        # (tpu.dynamic_rotate takes traced amounts; memref slicing does
        # not). After rotation the anchor sits at window origin, so the
        # ±R fan below is all static slices. Valid candidates never
        # touch wrapped entries: sy0 + R+dy+ly <= (win_h-12) + 11 <
        # win_h, and the x analog.
        win = pltpu.roll(win, (win_h - sy0) % win_h, axis=1)
        win = pltpu.roll(win, (win_w - sx0) % win_w, axis=2)

        oy = offy_ref[:]                            # (8, 128)
        ox = offx_ref[:]
        ly = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        uby = u // n_tx
        ubx = u % n_tx
        gy = uby * 8 + ly
        gx = ubx * 128 + lx
        # nearest source pixel; residual vs the unit anchor
        # (R0 + sy0 + R, C0 + sx0 + R)
        ry = jnp.floor(gy.astype(jnp.float32) + oy + 0.5).astype(jnp.int32)
        rx = jnp.floor(gx.astype(jnp.float32) + ox + 0.5).astype(jnp.int32)
        rdy = ry - (R0 + sy0 + R) - ly
        rdx = rx - (C0 + sx0 + R) - lx
        H_img = hist_ref.shape[1]
        W_img = hist_ref.shape[2]
        inr = ((jnp.abs(rdy) <= R) & (jnp.abs(rdx) <= R)
               & (ry >= 0) & (ry < H_img) & (rx >= 0) & (rx < W_img)
               & (ok > 0))

        # small images collapse the window to the whole image (residues
        # pinned 0, the rotates above are identities); a static roll
        # then indexes the same candidates, and wrapped entries only
        # reach pixels whose source is off-image, which the bounds
        # check invalidates
        roll_x = win_w < 128 + 2 * R
        roll_y = win_h < 8 + 2 * R
        acc = [jnp.zeros((8, 128), jnp.float32) for _ in range(N_HIST)]
        for dy in range(-R, R + 1):
            if roll_y:
                rows = jnp.roll(win, -(R + dy), axis=1)[:, :8, :]
            else:
                rows = jax.lax.slice_in_dim(win, R + dy, R + dy + 8,
                                            axis=1)
            my_ = rdy == dy
            for dx in range(-R, R + 1):
                m = my_ & (rdx == dx)
                if roll_x:
                    cand = jnp.roll(rows, -(R + dx), axis=2)[:, :, :128]
                else:
                    cand = jax.lax.slice_in_dim(rows, R + dx,
                                                R + dx + 128, axis=2)
                acc = [jnp.where(m, cand[c], acc[c])
                       for c in range(N_HIST)]

        cand_tid = jax.lax.bitcast_convert_type(acc[3], jnp.int32)
        ctid = ctid_ref[:]
        expz = expz_ref[:]
        # depth tolerance: loose absolute floor + a slice of the
        # remaining depth range (NDC z compresses the far field; near
        # the far plane small world motion moves z very little)
        tol = jnp.maximum(jnp.float32(2e-4),
                          0.05 * (1.0 - jnp.abs(expz)))
        # strict (bit 0): same winner id + consistent depth — REUSE the
        # history without reshading. blendable (bit 1): the reprojection
        # landed on a live history pixel at all — a freshly SHADED pixel
        # may still accumulate against it under the neighborhood clamp
        # (without this, jitter flips the winner at silhouette pixels
        # every frame, the id test never passes there, and edges would
        # neither converge their AA nor ever leave the invalid set)
        hist_live = cand_tid >= -1            # -2 = reset/ghost sentinel
        blendable = inr & hist_live
        valid = blendable & (cand_tid == ctid) \
            & (jnp.abs(acc[4] - expz) <= tol)
        out_r[:] = jnp.where(blendable, acc[0], 0.0)
        out_g[:] = jnp.where(blendable, acc[1], 0.0)
        out_b[:] = jnp.where(blendable, acc[2], 0.0)
        out_v[:] = valid.astype(jnp.int32) + 2 * blendable.astype(jnp.int32)

    return kernel


def select_units(valid, age, *, width: int, height: int,
                 shade_cap: int):
    """Pick the C units to re-shade this frame.

    valid: (H*W,) bool — history reuse is allowed at this pixel. (The
    bool unit-swizzle LOOKS like a ~3 ms pred relayout in the xplane,
    but that is an overlapped copy-start — replacing it with an int32
    per-unit reduce measured 25.2 vs 20.0 ms end-to-end. Keep the bool.)
    age: (n_units,) i32 — frames since each unit last shaded.
    Priority: units containing ANY invalid pixel first (disocclusions,
    screen entrants, first frames), then age-due refresh units oldest-
    first (view-dependent shading must not go stale), then everything
    else oldest-first (spare budget always refreshes SOMETHING, so a
    static camera still converges its jittered AA). Returns
    (idx (C,) i32 unit ids, shaded_unit (n_units,) bool)."""
    from ..ops.shade import _tile_swizzle

    H, W = height, width
    n_units = (H // 8) * (W // 128)
    C = min(shade_cap, n_units)
    inval = jnp.any(~_tile_swizzle(valid, H, W, 8), axis=-1)
    a = jnp.clip(age, 0, 1 << 20)
    # silhouette units are PERPETUALLY strict-invalid under jitter (the
    # winner id flips); gating urgency on age > 0 stops them from
    # monopolizing the budget every single frame while still repairing
    # any unit within a frame of going stale
    urgent = inval & (a > 0)
    key = jnp.where(urgent, (1 << 22) + a, a)
    idx = jnp.argsort(-key)[:C]
    shaded_unit = jnp.zeros((n_units,), bool).at[idx].set(True)
    return idx, shaded_unit


def temporal_merge(new_c, shaded_px, rep_c, valid, blendable, hist,
                   cur_tid, depth, *, width: int, height: int,
                   alpha: float):
    """Image-space temporal resolve: combine this frame's freshly shaded
    pixels with the reprojected history.

    new_c: 3 (H*W,) planes — shaded color, defined ONLY where shaded_px.
    rep_c: 3 (H*W,) planes — reprojected history color where `blendable`.
    Per pixel:
      shaded & blendable  → exponential blend: the history is CLAMPED to
                         the 3x3 min/max of this frame's shaded
                         neighborhood (classic TAA anti-ghosting; the
                         window ignores unshaded neighbors — the center
                         is always shaded so the range is never empty),
                         then lerped toward the new sample by `alpha`.
                         Jittered samples of a static scene converge to
                         the pixel-footprint average = the AA — including
                         at silhouettes, where the id test can never pass
                         but the clamp keeps the accumulation honest.
      shaded & ~blendable → the new sample (disocclusion: no history).
      ~shaded & valid  → the reprojected history (the reuse win; strict
                         id + depth validity — no clamp is available
                         without a fresh sample, so reuse stays strict).
      ~shaded & ~valid → the UNPROJECTED history at this pixel (best
                         available stand-in when the shade budget
                         overflowed); the pixel stays invalid in the new
                         history so next frame repairs it.
    Returns (out_c 3 planes, new_hist (5, H, W), cov (H*W,) f32)."""
    H, W = height, width
    big = jnp.float32(1e30)
    sm = shaded_px.reshape(H, W)
    hist_px = [hist[c].reshape(H * W) for c in range(3)]

    out_c = []
    for c in range(3):
        img = new_c[c].reshape(H, W)
        lo = jax.lax.reduce_window(
            jnp.where(sm, img, big), big, jax.lax.min,
            (3, 3), (1, 1), "SAME")
        hi = jax.lax.reduce_window(
            jnp.where(sm, img, -big), -big, jax.lax.max,
            (3, 3), (1, 1), "SAME")
        clamped = jnp.clip(rep_c[c].reshape(H, W), lo, hi)
        blended = img * jnp.float32(alpha) \
            + clamped * jnp.float32(1.0 - alpha)
        v = valid.reshape(H, W)
        b = blendable.reshape(H, W)
        out = jnp.where(
            sm, jnp.where(b, blended, img),
            jnp.where(v, rep_c[c].reshape(H, W),
                      hist_px[c].reshape(H, W)))
        out_c.append(out.reshape(H * W))

    keep = shaded_px | valid
    # pixels we could neither shade nor validate store the -2 sentinel so
    # they can never pass next frame's id test
    tid_store = jnp.where(keep, cur_tid, jnp.int32(-2))
    new_hist = pack_history(out_c[0], out_c[1], out_c[2], tid_store,
                            depth, H, W)
    cov = (cur_tid >= 0).astype(jnp.float32)
    return out_c, new_hist, cov


@functools.partial(jax.jit, static_argnames=("width", "height", "interpret"))
def reproject_history(hist, off_x, off_y, exp_z, cur_tid, *, width: int,
                      height: int, interpret: bool = False):
    """Reproject the (5, H, W) history through per-pixel offsets.

    Returns (rep_r, rep_g, rep_b, valid, blendable): flat (H*W,) planes —
    the history color each pixel would use, `valid` = reuse allowed
    without reshading (same winner id + consistent depth at the
    reprojected location), `blendable` = the reprojection landed on a
    live history pixel (a freshly shaded sample may accumulate against
    it under the neighborhood clamp even when ids differ)."""
    H, W = height, width
    assert H % 8 == 0 and W % 128 == 0
    win_h = min(WIN_H, H)
    win_w = min(WIN_W, W)
    n_ty, n_tx = H // 8, W // 128
    n_units = n_ty * n_tx
    scal = _unit_scalars(off_x, off_y, width=W, height=H,
                         win_h=win_h, win_w=win_w)

    def blk(u, *_refs):
        return (u // n_tx, u % n_tx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_units,),
        in_specs=[
            # HBM, not ANY: the per-unit DMA takes arbitrary unaligned
            # slices of the history, which is legal from (untiled) HBM
            # but not from a VMEM-resident memref (8-row tiling rule) —
            # small histories otherwise get promoted and fail to compile
            pl.BlockSpec(memory_space=pltpu.HBM),        # history planes
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM)
            for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((2, N_HIST, win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct((H, W), jnp.float32) for _ in range(3)]
        + [jax.ShapeDtypeStruct((H, W), jnp.int32)])
    r, g, b, v = pl.pallas_call(
        _reproject_kernel(n_tx, win_h, win_w),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, hist, off_x.reshape(H, W), off_y.reshape(H, W),
      exp_z.reshape(H, W), cur_tid.reshape(H, W))
    vf = v.reshape(H * W)
    return (r.reshape(H * W), g.reshape(H * W), b.reshape(H * W),
            (vf & 1) > 0, (vf & 2) > 0)
