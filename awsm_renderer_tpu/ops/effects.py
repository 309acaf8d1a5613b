"""Post-processing effects: bloom, depth of field, SMAA.

Port of the reference's effects compute pass (render_passes/effects/:
bloom Extract → N blur ping-pong passes → Blend, effects/render_pass.rs:
36-63; physically-based DoF CoC from aperture/focus distance,
effects_wgsl/helpers/dof.wgsl:1-50; SMAA 1x single-pass,
helpers/smaa.wgsl:1-30). All stages are whole-image XLA stencils
(shift-accumulate + elementwise) that XLA fuses; ping-pong buffers
disappear into SSA values.

CHANNEL-PLANE layout: every stage runs on per-channel (H, W) f32 planes.
The original (H, W, C) AoS form ran the whole chain at C/128 lane
utilization — profiled ~25 ms of select/blur fusions on f32[8294400]
(= 1080*1920*4) at 1080p, vs ~3 ms for the same math on planes. The
`bloom`/`depth_of_field`/`smaa` AoS wrappers below delegate to the
channel kernels, so formula-parity tests cover the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOOM_BLUR_PASSES = 3   # reference: BLOOM_BLUR_PASSES const
BLOOM_THRESHOLD = 0.8   # bloom.wgsl BLOOM_THRESHOLD
BLOOM_INTENSITY = 0.5   # bloom.wgsl BLOOM_INTENSITY
BLOOM_RADIUS = 2.0      # bloom.wgsl BLOOM_RADIUS


def _gaussian_kernel(radius: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x * x) / (2 * sigma * sigma))
    return k / jnp.sum(k)


def _blur_axis_plane(x: jnp.ndarray, k, radius: int, axis: int) -> jnp.ndarray:
    """1-D shift-accumulate blur of one (H, W) plane (edge clamp)."""
    pad = [(0, 0), (0, 0)]
    pad[axis] = (radius, radius)
    xp = jnp.pad(x, pad, mode="edge")
    out = jnp.zeros_like(x)
    for i in range(2 * radius + 1):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + x.shape[axis])
        out = out + xp[tuple(sl)] * k[i]
    return out


def _blur_separable_c(planes, radius: int, sigma: float):
    """Separable gaussian blur of channel planes [(H, W), ...]."""
    k = _gaussian_kernel(radius, sigma)
    return [_blur_axis_plane(_blur_axis_plane(p, k, radius, 0), k, radius, 1)
            for p in planes]


def _luma(rgb_ch):
    return rgb_ch[0] * 0.2126 + rgb_ch[1] * 0.7152 + rgb_ch[2] * 0.0722


def _bloom_threshold_c(rgb_ch):
    """Soft-knee brightness extract (bloom.wgsl bloom_threshold)."""
    brightness = _luma(rgb_ch)
    contribution = jnp.maximum(brightness - BLOOM_THRESHOLD, 0.0)
    soft_threshold = BLOOM_THRESHOLD * 0.8
    knee = BLOOM_THRESHOLD - soft_threshold
    soft = jnp.clip((brightness - soft_threshold) / knee, 0.0, 1.0)
    factor = contribution / jnp.maximum(brightness, 1e-4) * soft
    return [c * factor for c in rgb_ch]


def _bloom_blur_c(planes):
    """Circular-masked gaussian stencil (bloom.wgsl blur_sample:
    5x5 neighborhood, corners beyond BLOOM_RADIUS skipped, edge clamp).
    Shift-accumulate on clamp-padded planes — XLA fuses the whole kernel
    into one stencil pass per plane."""
    sigma = BLOOM_RADIUS
    r = int(np.ceil(BLOOM_RADIUS))
    taps = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            dist_sq = float(dy * dy + dx * dx)
            if dist_sq > BLOOM_RADIUS * BLOOM_RADIUS + 0.5:
                continue
            taps.append((dy, dx, np.exp(-dist_sq / (2.0 * sigma * sigma))))
    total = sum(w for _, _, w in taps)
    outs = []
    for p in planes:
        H, W = p.shape
        xp = jnp.pad(p, ((r, r), (r, r)), mode="edge")
        out = jnp.zeros_like(p)
        for dy, dx, w in taps:
            out = out + xp[r + dy : r + dy + H, r + dx : r + dx + W] * (w / total)
        outs.append(out)
    return outs


def bloom_c(rgb_ch):
    """Reference bloom pipeline (effects pipeline.rs:25-27 — 1 extract +
    BLOOM_BLUR_PASSES ping-pong blurs + 1 blend, all full-resolution) on
    [r, g, b] (H, W) channel planes."""
    b = _bloom_blur_c(_bloom_threshold_c(rgb_ch))
    for _ in range(BLOOM_BLUR_PASSES):
        b = _bloom_blur_c(b)
    blurred = _bloom_blur_c(b)
    return [c + bb * BLOOM_INTENSITY for c, bb in zip(rgb_ch, blurred)]


def bloom(hdr: jnp.ndarray) -> jnp.ndarray:
    """AoS wrapper: (H, W, 4) in/out (tests + hook-compat surface)."""
    out = bloom_c([hdr[..., c] for c in range(3)])
    return jnp.concatenate([jnp.stack(out, axis=-1), hdr[..., 3:4]], axis=-1)


DOF_MAX_BLUR = 16.0         # dof.wgsl DOF_MAX_BLUR (pixels)
DOF_SENSOR_HEIGHT = 0.024   # dof.wgsl SENSOR_HEIGHT (24mm full frame)


def linearize_depth(depth: jnp.ndarray, proj: jnp.ndarray) -> jnp.ndarray:
    """[0,1] depth-buffer value → positive view-space distance, derived
    from the projection matrix (dof.wgsl linearize_depth — no hardcoded
    clip planes). Handles both perspective (math3d.perspective: z_clip =
    A·z_view + B, w_clip = -z_view) and orthographic projections."""
    A = proj[2, 2]
    B = proj[2, 3]
    persp = jnp.abs(proj[3, 2]) > 0.5
    d = jnp.clip(depth, 0.0, 1.0)
    z_p = B / jnp.where(jnp.abs(A + d) > 1e-8, A + d, 1e-8)
    z_o = (B - d) / jnp.where(jnp.abs(A) > 1e-12, A, 1e-12)
    return jnp.where(persp, z_p, z_o)


def depth_of_field_c(rgb_ch, depth: jnp.ndarray, camera: dict):
    """Physically-based DoF (dof.wgsl, Blender-compatible camera model) on
    [r, g, b] (H, W) channel planes: focal length from proj[1][1] against
    a 24mm sensor, aperture as the f-stop number, CoC = (f/N)·f·|D-S| /
    (D·S) converted to pixels and capped at DOF_MAX_BLUR. The reference's
    per-pixel 16-tap golden-angle disk gather is XLA-hostile (per-pixel
    dynamic offsets); two stacked separable gaussians stand in for the
    disk, blended by per-pixel CoC."""
    proj = camera["proj"]
    S = camera["dof"][0]                       # focus distance (world units)
    N = camera["dof"][1]                       # f-stop number
    Hpx = rgb_ch[0].shape[0]
    D = jnp.maximum(linearize_depth(depth, proj), 1e-4)
    f = (DOF_SENSOR_HEIGHT * 0.5) * proj[1, 1]  # get_focal_length
    A_ap = f / jnp.maximum(N, 0.1)              # aperture diameter
    coc_world = A_ap * f * jnp.abs(D - S) / (D * jnp.maximum(S, 1e-3))
    coc = jnp.clip(coc_world * Hpx / DOF_SENSOR_HEIGHT, 0.0, DOF_MAX_BLUR)

    b1 = _blur_separable_c(rgb_ch, radius=4, sigma=2.0)    # ≈ CoC 4 px
    b2 = _blur_separable_c(b1, radius=8, sigma=5.0)        # ≈ CoC 16 px
    w1 = jnp.clip(coc / 4.0, 0.0, 1.0)
    w2 = jnp.clip((coc - 4.0) / (DOF_MAX_BLUR - 4.0), 0.0, 1.0)
    # blend_factor = smoothstep(0, 2, coc) (dof.wgsl apply_dof tail)
    s = jnp.clip(coc / 2.0, 0.0, 1.0)
    blend = s * s * (3.0 - 2.0 * s)
    out = []
    for c, l1, l2 in zip(rgb_ch, b1, b2):
        level = c * (1.0 - w1) + l1 * w1
        level = level * (1.0 - w2) + l2 * w2
        out.append(c * (1.0 - blend) + level * blend)
    return out


def depth_of_field(hdr: jnp.ndarray, depth: jnp.ndarray, camera: dict) -> jnp.ndarray:
    """AoS wrapper: (H, W, 4) in/out."""
    out = depth_of_field_c([hdr[..., c] for c in range(3)], depth, camera)
    return jnp.concatenate([jnp.stack(out, axis=-1), hdr[..., 3:4]], axis=-1)


SMAA_THRESHOLD = 0.03       # smaa.wgsl SMAA_THRESHOLD
SMAA_BLEND_STRENGTH = 0.6   # smaa.wgsl SMAA_BLEND_STRENGTH


def smaa_c(rgb_ch):
    """Single-pass morphological AA, full smaa.wgsl apply_smaa parity, on
    [r, g, b] (H, W) channel planes: 8-neighbor luma deltas in perceptual
    space, edge-orientation classification (horizontal / vertical /
    diagonal), inverse-contrast weighted neighborhood blending. Runs on
    the display (LDR, sRGB-encoded) image — the perceptual space the
    reference converts into for its edge detection. Branches become
    masked selects; the textureLoads become 8 rolls that XLA fuses into
    one stencil."""
    luma = _luma(rgb_ch)

    def at_offset(x, dy, dx):
        """Value at pixel (y+dy, x+dx), wrap-around borders."""
        return jnp.roll(x, (-dy, -dx), axis=(0, 1))

    offs = {
        "w": (0, -1), "e": (0, 1), "n": (-1, 0), "s": (1, 0),
        "nw": (-1, -1), "ne": (-1, 1), "sw": (1, -1), "se": (1, 1),
    }
    l = {k: at_offset(luma, *o) for k, o in offs.items()}
    d = {k: jnp.abs(luma - v) for k, v in l.items()}

    max_h = jnp.maximum(d["w"], d["e"])
    max_v = jnp.maximum(d["n"], d["s"])
    max_diag = jnp.maximum(jnp.maximum(d["nw"], d["ne"]),
                           jnp.maximum(d["sw"], d["se"]))
    max_delta = jnp.maximum(jnp.maximum(max_h, max_v), max_diag)

    no_edge = max_delta < SMAA_THRESHOLD
    is_diag = max_diag > jnp.maximum(max_h, max_v)
    is_horiz = max_h > max_v            # horizontal edge → blend vertically

    c = {k: [at_offset(p, *o) for p in rgb_ch] for k, o in offs.items()}

    def inv_w(a, b):
        wa = 1.0 / (a + 1e-3)
        wb = 1.0 / (b + 1e-3)
        t = wa + wb
        return wa / t, wb / t

    # horizontal edge: sequential mixes toward top then bottom
    # (neighborhood_blending is_horizontal=true)
    wt, wb = inv_w(d["n"], d["s"])
    wt = wt * SMAA_BLEND_STRENGTH
    wb = wb * SMAA_BLEND_STRENGTH
    blended_h = [p * (1 - wt) + cn * wt for p, cn in zip(rgb_ch, c["n"])]
    blended_h = [p * (1 - wb) + cs * wb for p, cs in zip(blended_h, c["s"])]

    # vertical edge: mixes toward left then right
    wl, wr = inv_w(d["w"], d["e"])
    wl = wl * SMAA_BLEND_STRENGTH
    wr = wr * SMAA_BLEND_STRENGTH
    blended_v = [p * (1 - wl) + cw * wl for p, cw in zip(rgb_ch, c["w"])]
    blended_v = [p * (1 - wr) + ce * wr for p, ce in zip(blended_v, c["e"])]

    # diagonal edge: inverse-contrast weighted 4-diagonal average,
    # mixed at the global strength (diagonal_blending)
    ws = {k: 1.0 / (d[k] + 1e-3) for k in ("nw", "ne", "sw", "se")}
    wtot = ws["nw"] + ws["ne"] + ws["sw"] + ws["se"]
    out = []
    for ci in range(3):
        nb = sum(c[k][ci] * (ws[k] / wtot) for k in ("nw", "ne", "sw", "se"))
        blended_d = (rgb_ch[ci] * (1 - SMAA_BLEND_STRENGTH)
                     + nb * SMAA_BLEND_STRENGTH)
        o = jnp.where(is_horiz, blended_h[ci], blended_v[ci])
        o = jnp.where(is_diag, blended_d, o)
        out.append(jnp.where(no_edge, rgb_ch[ci], o))
    return out


def smaa(img: jnp.ndarray) -> jnp.ndarray:
    """AoS wrapper: (H, W, 4) in/out."""
    out = smaa_c([img[..., c] for c in range(3)])
    return jnp.concatenate([jnp.stack(out, axis=-1), img[..., 3:4]], axis=-1)
