"""Post-processing effects: bloom, depth of field, SMAA.

Port of the reference's effects compute pass (render_passes/effects/:
bloom Extract → N blur ping-pong passes → Blend, effects/render_pass.rs:
36-63; physically-based DoF CoC from aperture/focus distance,
effects_wgsl/helpers/dof.wgsl:1-50; SMAA 1x single-pass,
helpers/smaa.wgsl:1-30). All stages are whole-image XLA ops (separable
convolutions + elementwise) that XLA fuses; ping-pong buffers disappear
into SSA values.
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


def _blur_separable(img: jnp.ndarray, radius: int, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur on (H,W,C) via shift-accumulate (edge clamp)."""
    k = _gaussian_kernel(radius, sigma)

    def blur_axis(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (radius, radius)
        xp = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        for i in range(2 * radius + 1):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + xp[tuple(sl)] * k[i]
        return out

    return blur_axis(blur_axis(img, 0), 1)


def _bloom_threshold(rgb: jnp.ndarray) -> jnp.ndarray:
    """Soft-knee brightness extract (bloom.wgsl bloom_threshold)."""
    brightness = rgb @ jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
    contribution = jnp.maximum(brightness - BLOOM_THRESHOLD, 0.0)
    soft_threshold = BLOOM_THRESHOLD * 0.8
    knee = BLOOM_THRESHOLD - soft_threshold
    soft = jnp.clip((brightness - soft_threshold) / knee, 0.0, 1.0)
    factor = contribution / jnp.maximum(brightness, 1e-4) * soft
    return rgb * factor[..., None]


def _bloom_blur(img: jnp.ndarray) -> jnp.ndarray:
    """Circular-masked gaussian stencil (bloom.wgsl blur_sample:
    5x5 neighborhood, corners beyond BLOOM_RADIUS skipped, edge clamp).
    Shift-accumulate rolls on a clamp-padded image — XLA fuses the whole
    kernel into one stencil pass."""
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
    pad = [(r, r), (r, r)] + [(0, 0)] * (img.ndim - 2)
    xp = jnp.pad(img, pad, mode="edge")
    H, W = img.shape[:2]
    out = jnp.zeros_like(img)
    for dy, dx, w in taps:
        out = out + xp[r + dy : r + dy + H, r + dx : r + dx + W] * (w / total)
    return out


def bloom(hdr: jnp.ndarray) -> jnp.ndarray:
    """Reference bloom pipeline (effects pipeline.rs:25-27 — 1 extract +
    BLOOM_BLUR_PASSES ping-pong blurs + 1 blend, all full-resolution):
    soft-knee extract-with-blur, N circular-gaussian blur passes, then
    original + blurred * BLOOM_INTENSITY."""
    rgb = hdr[..., :3]
    # extract pass: blur of thresholded neighborhood (bloom_extract)
    b = _bloom_blur(_bloom_threshold(rgb))
    for _ in range(BLOOM_BLUR_PASSES):
        b = _bloom_blur(b)
    # blend pass blurs once more before adding (bloom_blend blur_sample)
    out = rgb + _bloom_blur(b) * BLOOM_INTENSITY
    return jnp.concatenate([out, hdr[..., 3:4]], axis=-1)


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


def depth_of_field(hdr: jnp.ndarray, depth: jnp.ndarray, camera: dict) -> jnp.ndarray:
    """Physically-based DoF (dof.wgsl, Blender-compatible camera model):
    focal length from proj[1][1] against a 24mm sensor, aperture as the
    f-stop number, CoC = (f/N)·f·|D-S| / (D·S) converted to pixels and
    capped at DOF_MAX_BLUR. The reference's per-pixel 16-tap golden-angle
    disk gather is XLA-hostile (per-pixel dynamic offsets); two stacked
    separable gaussians stand in for the disk, blended by per-pixel CoC."""
    proj = camera["proj"]
    S = camera["dof"][0]                       # focus distance (world units)
    N = camera["dof"][1]                       # f-stop number
    Hpx = hdr.shape[0]
    D = jnp.maximum(linearize_depth(depth, proj), 1e-4)
    f = (DOF_SENSOR_HEIGHT * 0.5) * proj[1, 1]  # get_focal_length
    A_ap = f / jnp.maximum(N, 0.1)              # aperture diameter
    coc_world = A_ap * f * jnp.abs(D - S) / (D * jnp.maximum(S, 1e-3))
    coc = jnp.clip(coc_world * Hpx / DOF_SENSOR_HEIGHT, 0.0, DOF_MAX_BLUR)

    rgb = hdr[..., :3]
    b1 = _blur_separable(rgb, radius=4, sigma=2.0)     # ≈ CoC 4 px
    b2 = _blur_separable(b1, radius=8, sigma=5.0)      # ≈ CoC 16 px
    w1 = jnp.clip(coc / 4.0, 0.0, 1.0)[..., None]
    w2 = jnp.clip((coc - 4.0) / (DOF_MAX_BLUR - 4.0), 0.0, 1.0)[..., None]
    level = rgb * (1.0 - w1) + b1 * w1
    level = level * (1.0 - w2) + b2 * w2
    # blend_factor = smoothstep(0, 2, coc) (dof.wgsl apply_dof tail)
    s = jnp.clip(coc / 2.0, 0.0, 1.0)[..., None]
    blend = s * s * (3.0 - 2.0 * s)
    out = rgb * (1.0 - blend) + level * blend
    return jnp.concatenate([out, hdr[..., 3:4]], axis=-1)


SMAA_THRESHOLD = 0.03       # smaa.wgsl SMAA_THRESHOLD
SMAA_BLEND_STRENGTH = 0.6   # smaa.wgsl SMAA_BLEND_STRENGTH


def smaa(img: jnp.ndarray) -> jnp.ndarray:
    """Single-pass morphological AA, full smaa.wgsl apply_smaa parity:
    8-neighbor luma deltas in perceptual space, edge-orientation
    classification (horizontal / vertical / diagonal), inverse-contrast
    weighted neighborhood blending. Runs on the display (LDR,
    sRGB-encoded) image — the perceptual space the reference converts
    into for its edge detection. Branches become masked selects; the
    textureLoads become 8 rolls that XLA fuses into one stencil."""
    rgb = img[..., :3]
    luma = rgb @ jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)

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

    c = {k: at_offset(rgb, *o) for k, o in offs.items()}

    def inv_w(a, b):
        wa = 1.0 / (a + 1e-3)
        wb = 1.0 / (b + 1e-3)
        t = wa + wb
        return wa / t, wb / t

    # horizontal edge: sequential mixes toward top then bottom
    # (neighborhood_blending is_horizontal=true)
    wt, wb = inv_w(d["n"], d["s"])
    wt = (wt * SMAA_BLEND_STRENGTH)[..., None]
    wb = (wb * SMAA_BLEND_STRENGTH)[..., None]
    blended_h = rgb * (1 - wt) + c["n"] * wt
    blended_h = blended_h * (1 - wb) + c["s"] * wb

    # vertical edge: mixes toward left then right
    wl, wr = inv_w(d["w"], d["e"])
    wl = (wl * SMAA_BLEND_STRENGTH)[..., None]
    wr = (wr * SMAA_BLEND_STRENGTH)[..., None]
    blended_v = rgb * (1 - wl) + c["w"] * wl
    blended_v = blended_v * (1 - wr) + c["e"] * wr

    # diagonal edge: inverse-contrast weighted 4-diagonal average,
    # mixed at the global strength (diagonal_blending)
    ws = {k: 1.0 / (d[k] + 1e-3) for k in ("nw", "ne", "sw", "se")}
    wtot = ws["nw"] + ws["ne"] + ws["sw"] + ws["se"]
    nb = sum(c[k] * (ws[k] / wtot)[..., None]
             for k in ("nw", "ne", "sw", "se"))
    blended_d = rgb * (1 - SMAA_BLEND_STRENGTH) + nb * SMAA_BLEND_STRENGTH

    out = jnp.where(is_horiz[..., None], blended_h, blended_v)
    out = jnp.where(is_diag[..., None], blended_d, out)
    out = jnp.where(no_edge[..., None], rgb, out)
    return jnp.concatenate([out, img[..., 3:4]], axis=-1)
