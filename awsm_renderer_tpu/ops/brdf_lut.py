"""Split-sum BRDF lookup table generated on device.

Port of the reference's GPU-generated BRDF LUT
(crates/renderer-core/src/brdf_lut/generate.rs:24-60 + brdf_lut/shader.wgsl:
1024x1024 split-sum integration). Here the integration is a single jitted
einsum-style batch over importance samples — MXU/VPU friendly, runs once at
renderer init and is cached.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("size", "samples"))
def generate_brdf_lut(size: int = 256, samples: int = 512) -> jnp.ndarray:
    """Returns (size, size, 2) f32: scale (A) and bias (B) for F0.

    Grid: x = NdotV in (0,1], y = roughness in (0,1].
    Standard Karis split-sum integration with GGX importance sampling.
    """
    n_dot_v = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size          # (S,)
    rough = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size            # (S,)
    alpha = rough * rough

    v = jnp.stack(
        [jnp.sqrt(jnp.maximum(1.0 - n_dot_v * n_dot_v, 0.0)),
         jnp.zeros_like(n_dot_v),
         n_dot_v], axis=-1)                                                # (S,3)

    # Hammersley sequence (radical inverse via bit reversal)
    import numpy as np

    u32 = lambda v: jnp.uint32(np.uint32(v))
    i = jnp.arange(samples, dtype=jnp.uint32)
    bits = i
    bits = (bits << 16) | (bits >> 16)
    bits = ((bits & u32(0x55555555)) << 1) | ((bits & u32(0xAAAAAAAA)) >> 1)
    bits = ((bits & u32(0x33333333)) << 2) | ((bits & u32(0xCCCCCCCC)) >> 2)
    bits = ((bits & u32(0x0F0F0F0F)) << 4) | ((bits & u32(0xF0F0F0F0)) >> 4)
    bits = ((bits & u32(0x00FF00FF)) << 8) | ((bits & u32(0xFF00FF00)) >> 8)
    xi1 = i.astype(jnp.float32) / samples                                  # (N,)
    xi2 = bits.astype(jnp.float32) * 2.3283064365386963e-10

    phi = 2.0 * jnp.pi * xi1

    # scan over samples, accumulating the (S_rough, S_ndv) grid per step —
    # keeps peak memory at O(S^2), not O(S^2 * samples)
    a = alpha[:, None]                  # (S,1) roughness rows
    vv = v[None, :, :]                  # (1,S,3) NdotV cols
    ndv = n_dot_v[None, :]              # (1,S)
    k = a * a / 2.0                     # Karis IBL k

    def step(acc, xi):
        x1, x2 = xi
        ph = 2.0 * jnp.pi * x1
        cos_th = jnp.sqrt((1.0 - x2) / (1.0 + (a * a - 1.0) * x2))   # (S,1)
        sin_th = jnp.sqrt(jnp.maximum(1.0 - cos_th * cos_th, 0.0))
        hx = sin_th * jnp.cos(ph)
        hy = sin_th * jnp.sin(ph)
        hz = cos_th
        v_dot_h = vv[..., 0] * hx + vv[..., 2] * hz                   # (S,S)
        lz = 2.0 * v_dot_h * hz - vv[..., 2]
        n_dot_l = jnp.maximum(lz, 0.0)
        n_dot_h = jnp.maximum(hz, 0.0)
        v_dot_h = jnp.maximum(v_dot_h, 0.0)
        g_v = ndv / (ndv * (1.0 - k) + k)
        g_l = n_dot_l / jnp.maximum(n_dot_l * (1.0 - k) + k, 1e-6)
        g_vis = jnp.where(
            n_dot_l > 0, g_v * g_l * v_dot_h / jnp.maximum(n_dot_h * ndv, 1e-6), 0.0
        )
        fc = jnp.power(1.0 - v_dot_h, 5.0)
        return (acc[0] + (1.0 - fc) * g_vis, acc[1] + fc * g_vis), None

    init = (jnp.zeros((size, size)), jnp.zeros((size, size)))
    (acc_a, acc_b), _ = jax.lax.scan(step, init, (xi1, xi2))
    return jnp.stack([acc_a, acc_b], axis=-1) / samples


def sample_brdf_lut(lut: jnp.ndarray, n_dot_v: jnp.ndarray, roughness: jnp.ndarray):
    """Bilinear LUT fetch → (A (P,), B (P,))."""
    S = lut.shape[0]
    x = jnp.clip(n_dot_v, 0.0, 1.0) * S - 0.5
    y = jnp.clip(roughness, 0.0, 1.0) * S - 0.5
    x0 = jnp.clip(jnp.floor(x), 0, S - 1)
    y0 = jnp.clip(jnp.floor(y), 0, S - 1)
    x1 = jnp.clip(x0 + 1, 0, S - 1)
    y1 = jnp.clip(y0 + 1, 0, S - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[:, None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[:, None]
    flat = lut.reshape(S * S, 2)

    def tap(yi, xi):
        return flat[(yi * S + xi).astype(jnp.int32)]

    out = (
        tap(y0, x0) * (1 - fx) * (1 - fy)
        + tap(y0, x1) * fx * (1 - fy)
        + tap(y1, x0) * (1 - fx) * fy
        + tap(y1, x1) * fx * fy
    )
    return out[:, 0], out[:, 1]
