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

BLOOM_BLUR_PASSES = 3   # reference: BLOOM_BLUR_PASSES const
BLOOM_THRESHOLD = 1.0
BLOOM_INTENSITY = 0.35


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


def bloom(hdr: jnp.ndarray) -> jnp.ndarray:
    """Extract → blur xN at half resolution → blend (effects pass phases)."""
    rgb = hdr[..., :3]
    lum = jnp.max(rgb, axis=-1, keepdims=True)
    bright = jnp.where(lum > BLOOM_THRESHOLD, rgb * (lum - BLOOM_THRESHOLD) / jnp.maximum(lum, 1e-5), 0.0)
    H, W = bright.shape[:2]
    half = bright[: H // 2 * 2, : W // 2 * 2].reshape(H // 2, 2, W // 2, 2, 3).mean(axis=(1, 3))
    for _ in range(BLOOM_BLUR_PASSES):
        half = _blur_separable(half, radius=4, sigma=2.5)
    up = jnp.repeat(jnp.repeat(half, 2, axis=0), 2, axis=1)
    up = jnp.pad(up, ((0, H - up.shape[0]), (0, W - up.shape[1]), (0, 0)), mode="edge")
    out = rgb + BLOOM_INTENSITY * up
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


def smaa(img: jnp.ndarray) -> jnp.ndarray:
    """Single-pass morphological AA (smaa.wgsl '~15-25 ALU ops per pixel'):
    luma edge detection + directional neighborhood blend."""
    rgb = img[..., :3]
    luma = rgb @ jnp.array([0.299, 0.587, 0.114], jnp.float32)

    def shift(x, dy, dx):
        return jnp.roll(x, (dy, dx), axis=(0, 1))

    l_n = shift(luma, -1, 0)
    l_s = shift(luma, 1, 0)
    l_w = shift(luma, 0, -1)
    l_e = shift(luma, 0, 1)

    grad_h = jnp.abs(l_w - l_e)
    grad_v = jnp.abs(l_n - l_s)
    edge = jnp.maximum(grad_h, grad_v)
    threshold = 0.05
    strength = jnp.clip((edge - threshold) * 4.0, 0.0, 0.75)

    # blend perpendicular to the dominant gradient direction
    horiz = grad_v >= grad_h  # horizontal edge -> blend vertically
    c_n = shift(rgb, -1, 0)
    c_s = shift(rgb, 1, 0)
    c_w = shift(rgb, 0, -1)
    c_e = shift(rgb, 0, 1)
    blend_v = (c_n + c_s) * 0.5
    blend_h = (c_w + c_e) * 0.5
    neighbor = jnp.where(horiz[..., None], blend_v, blend_h)
    out = rgb * (1.0 - strength[..., None]) + neighbor * strength[..., None]
    return jnp.concatenate([out, img[..., 3:4]], axis=-1)
