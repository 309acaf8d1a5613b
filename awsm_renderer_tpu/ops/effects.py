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


def depth_of_field(hdr: jnp.ndarray, depth: jnp.ndarray, camera: dict,
                   near: float = 0.1, far: float = 100.0) -> jnp.ndarray:
    """Physically-based circle of confusion from aperture + focus distance
    (dof.wgsl): CoC = aperture * |1 - focus/z_view|, blended between sharp
    and blurred images."""
    focus = camera["dof"][0]
    aperture = camera["dof"][1]
    # view-space depth from [0,1] ndc z (reversed perspective, depth 0..1)
    z_ndc = jnp.clip(depth, 1e-6, 1.0)
    z_view = near * far / jnp.maximum(far - z_ndc * (far - near), 1e-6)
    coc = jnp.clip(aperture * jnp.abs(z_view - focus) / jnp.maximum(z_view, 1e-6) * 20.0, 0.0, 1.0)
    rgb = hdr[..., :3]
    blurred = _blur_separable(rgb, radius=6, sigma=3.0)
    out = rgb * (1.0 - coc[..., None]) + blurred * coc[..., None]
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
