"""Tone mapping + display transfer.

Port of the reference display pass (render_passes/display/shader/
display_wgsl/helpers/tonemap.wgsl: KhronosPbrNeutral | Aces; fragment.wgsl
linear→sRGB encode). Runs as a fused XLA stage on the whole HDR image.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import ToneMapping


def _khronos_pbr_neutral(color: jnp.ndarray) -> jnp.ndarray:
    """Clean implementation of Khronos PBR Neutral tone mapper."""
    f90 = 0.04
    start_compression = 0.8 - f90
    desaturation = 0.15
    x = jnp.min(color, axis=-1, keepdims=True)
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, f90)
    c = color - offset
    peak = jnp.max(c, axis=-1, keepdims=True)
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / jnp.maximum(peak + d - start_compression, 1e-6)
    g = 1.0 / (desaturation * (peak - new_peak) + 1.0)
    compressed = jnp.where(
        peak > start_compression,
        new_peak * (g * c / jnp.maximum(peak, 1e-6) + (1.0 - g)),
        c,
    )
    return compressed + offset


def tonemap_aces(color: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic fit (Narkowicz 2015) — matches the reference's Aces mode."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    x = color
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(
        c <= 0.0031308, c * 12.92, 1.055 * jnp.power(jnp.maximum(c, 1e-12), 1.0 / 2.4) - 0.055
    )


def _khronos_pbr_neutral_c(rgb):
    """Channel-plane form of _khronos_pbr_neutral ([r,g,b] arrays)."""
    f90 = 0.04
    start_compression = 0.8 - f90
    desaturation = 0.15
    x = jnp.minimum(jnp.minimum(rgb[0], rgb[1]), rgb[2])
    offset = jnp.where(x < 0.08, x - 6.25 * x * x, f90)
    c = [ch - offset for ch in rgb]
    peak = jnp.maximum(jnp.maximum(c[0], c[1]), c[2])
    d = 1.0 - start_compression
    new_peak = 1.0 - d * d / jnp.maximum(peak + d - start_compression, 1e-6)
    g = 1.0 / (desaturation * (peak - new_peak) + 1.0)
    inv_peak = 1.0 / jnp.maximum(peak, 1e-6)
    hit = peak > start_compression
    return [jnp.where(hit, new_peak * (g * ch * inv_peak + (1.0 - g)), ch)
            + offset for ch in c]


def display_pass_c(hdr_ch, mode: ToneMapping):
    """Channel-plane display pass: [r,g,b,a] → [r,g,b,a] sRGB in [0,1].

    Reference: display_wgsl/fragment.wgsl:14-31 (tonemap + sRGB encode).
    """
    rgb = hdr_ch[:3]
    if mode == ToneMapping.ACES:
        rgb = [tonemap_aces(ch) for ch in rgb]
    elif mode == ToneMapping.KHRONOS_PBR_NEUTRAL:
        rgb = _khronos_pbr_neutral_c(rgb)
    rgb = [jnp.clip(linear_to_srgb(ch), 0.0, 1.0) for ch in rgb]
    return rgb + [jnp.clip(hdr_ch[3], 0.0, 1.0)]


def display_pass(hdr: jnp.ndarray, mode: ToneMapping) -> jnp.ndarray:
    """HDR linear (H,W,4) → display sRGB (H,W,4) in [0,1].

    Reference: display_wgsl/fragment.wgsl:14-31 (tonemap + sRGB encode).
    """
    rgb = hdr[..., :3]
    if mode == ToneMapping.ACES:
        rgb = tonemap_aces(rgb)
    elif mode == ToneMapping.KHRONOS_PBR_NEUTRAL:
        rgb = _khronos_pbr_neutral(rgb)
    rgb = jnp.clip(linear_to_srgb(rgb), 0.0, 1.0)
    return jnp.concatenate([rgb, jnp.clip(hdr[..., 3:4], 0.0, 1.0)], axis=-1)
