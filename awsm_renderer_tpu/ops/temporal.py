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
  alternate-memory budget (BASELINE.md); instead the kernel DMAs one
  (5, 24, 384) WINDOW of the history per (8, 128) unit — the window
  location comes from the unit's mean reprojection offset (scalar
  prefetch), and per-pixel residuals are resolved with a small
  (±2 px) select fan. Window DMA traffic is ~370 MB/frame ≈ 0.5 ms of
  HBM bandwidth, with a two-slot ring overlapping DMA and compute.
- Pixels whose residual falls outside the ±2 window, whose source falls
  off-screen, or whose unit mean is degenerate (clamped window) are
  simply INVALID — correctness never depends on the window being big
  enough; coverage does.
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
# window geometry: 3 row-blocks x 3 col-blocks of the (8, 128) unit grid
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


def _unit_scalars(off_x, off_y, *, width: int, height: int):
    """Per-unit window placement from the unit-mean offsets. Returns
    (n_units, 8) i32: [R0, C0, sy0, sx0, ok, 0, 0, 0] where (R0, C0) is
    the 8/128-aligned window origin, (sy0, sx0) the anchor slack inside
    the window, ok=0 marks units whose window had to be clamped away
    from their anchor (the kernel then reports every pixel invalid)."""
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
    # window origin: block-aligned, clamped into the image. A clamped
    # window still serves every pixel it covers — the kernel's exact
    # per-pixel coverage checks invalidate the rest (no whole-unit
    # conservatism at the image borders).
    R0 = jnp.clip((s_y // 8) * 8, 0, H - WIN_H)
    C0 = jnp.clip((s_x // 128) * 128, 0, W - WIN_W)
    sy0 = jnp.clip(s_y - R0, 0, WIN_H - 8 - 2 * RESID)
    sx0 = jnp.clip(s_x - C0, 0, WIN_W - 128 - 2 * RESID)
    ok = jnp.isfinite(my) & jnp.isfinite(mx) & (jnp.abs(my) < 1e5) \
        & (jnp.abs(mx) < 1e5)
    zeros = jnp.zeros_like(R0)
    scal = jnp.stack(
        [R0, C0, sy0, sx0, ok.astype(jnp.int32), zeros, zeros, zeros],
        axis=-1)
    return scal.reshape(n_ty * n_tx, 8)


def _reproject_kernel(n_tx: int):
    R = RESID

    def kernel(scal_ref, hist_ref, offx_ref, offy_ref, expz_ref, ctid_ref,
               out_r, out_g, out_b, out_v, scratch, sems):
        u = pl.program_id(0)
        n_units = pl.num_programs(0)

        def dma(i, slot):
            return pltpu.make_async_copy(
                hist_ref.at[:, pl.ds(scal_ref[i, 0], WIN_H),
                            pl.ds(scal_ref[i, 1], WIN_W)],
                scratch.at[slot], sems.at[slot])

        @pl.when(u == 0)
        def _():
            dma(0, 0).start()

        @pl.when(u + 1 < n_units)
        def _():
            dma(u + 1, (u + 1) % 2).start()

        dma(u, u % 2).wait()
        win = scratch[u % 2]                       # (5, WIN_H, WIN_W)

        R0 = scal_ref[u, 0]
        C0 = scal_ref[u, 1]
        sy0 = scal_ref[u, 2]
        sx0 = scal_ref[u, 3]
        ok = scal_ref[u, 4]

        oy = offy_ref[:]                            # (8, 128)
        ox = offx_ref[:]
        ly = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        lx = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        uby = u // n_tx
        ubx = u % n_tx
        gy = uby * 8 + ly
        gx = ubx * 128 + lx
        # nearest source pixel and residual vs the unit anchor. The
        # anchor satisfies uby*8 + ay = R0 + sy0 + R (construction in
        # _unit_scalars), so dy = round(gy+oy) - (R0+sy0+R) - ly.
        ry = jnp.floor(gy.astype(jnp.float32) + oy + 0.5).astype(jnp.int32)
        rx = jnp.floor(gx.astype(jnp.float32) + ox + 0.5).astype(jnp.int32)
        rdy = ry - (R0 + sy0 + R) - ly
        rdx = rx - (C0 + sx0 + R) - lx
        H_img = hist_ref.shape[1]
        W_img = hist_ref.shape[2]
        inr = ((jnp.abs(rdy) <= R) & (jnp.abs(rdx) <= R)
               & (ry >= 0) & (ry < H_img) & (rx >= 0) & (rx < W_img)
               & (ok > 0))

        acc = [jnp.zeros((8, 128), jnp.float32) for _ in range(N_HIST)]
        for dx in range(-R, R + 1):
            mx = rdx == dx
            xs = jax.lax.dynamic_slice(                 # (5, WIN_H, 128)
                win, (0, 0, sx0 + R + dx), (N_HIST, WIN_H, 128))
            for dy in range(-R, R + 1):
                m = mx & (rdy == dy)
                cand = jax.lax.dynamic_slice(           # (5, 8, 128)
                    xs, (0, sy0 + R + dy, 0), (N_HIST, 8, 128))
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
        valid = inr & (cand_tid == ctid) & (jnp.abs(acc[4] - expz) <= tol)
        out_r[:] = jnp.where(valid, acc[0], 0.0)
        out_g[:] = jnp.where(valid, acc[1], 0.0)
        out_b[:] = jnp.where(valid, acc[2], 0.0)
        out_v[:] = valid.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("width", "height", "interpret"))
def reproject_history(hist, off_x, off_y, exp_z, cur_tid, *, width: int,
                      height: int, interpret: bool = False):
    """Reproject the (5, H, W) history through per-pixel offsets.

    Returns (rep_r, rep_g, rep_b, valid): flat (H*W,) planes — the
    history color each pixel would reuse, and whether it may (same
    winner id + consistent depth at the reprojected location)."""
    H, W = height, width
    assert H % 8 == 0 and W % 128 == 0 and W >= WIN_W and H >= WIN_H
    n_ty, n_tx = H // 8, W // 128
    n_units = n_ty * n_tx
    scal = _unit_scalars(off_x, off_y, width=W, height=H)

    def blk(u, *_refs):
        return (u // n_tx, u % n_tx)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_units,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),        # history planes
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((8, 128), blk, memory_space=pltpu.VMEM)
            for _ in range(4)),
        scratch_shapes=[
            pltpu.VMEM((2, N_HIST, WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = tuple(
        [jax.ShapeDtypeStruct((H, W), jnp.float32) for _ in range(3)]
        + [jax.ShapeDtypeStruct((H, W), jnp.int32)])
    r, g, b, v = pl.pallas_call(
        _reproject_kernel(n_tx),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, hist, off_x.reshape(H, W), off_y.reshape(H, W),
      exp_z.reshape(H, W), cur_tid.reshape(H, W))
    return (r.reshape(H * W), g.reshape(H * W), b.reshape(H * W),
            v.reshape(H * W) > 0)
