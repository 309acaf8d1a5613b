"""Cubemap sampling (skybox, IBL prefiltered/irradiance).

Port of the cubemap sampling used by the reference's lighting WGSL
(shared_wgsl/lighting/lights.wgsl IBL path, material_opaque skybox miss
path). Faces follow the WebGPU/GL order +X,-X,+Y,-Y,+Z,-Z with standard
uv orientation. Bilinear filtering with edge clamp (no seam blending).
"""

from __future__ import annotations

import jax.numpy as jnp


def cubemap_face_uv(dirs: jnp.ndarray):
    """dirs (P,3) → (face (P,) i32, uv (P,2) in [0,1])."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(
        is_x, jnp.where(x > 0, 0, 1), jnp.where(is_y, jnp.where(y > 0, 2, 3), jnp.where(z > 0, 4, 5))
    ).astype(jnp.int32)

    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-12)
    # GL convention per face: (sc, tc)
    sc = jnp.where(
        is_x, jnp.where(x > 0, -z, z), jnp.where(is_y, x, jnp.where(z > 0, x, -x))
    )
    tc = jnp.where(is_y, jnp.where(y > 0, z, -z), -y)
    u = (sc / ma + 1.0) * 0.5
    v = (tc / ma + 1.0) * 0.5
    return face, jnp.stack([u, v], axis=-1)


def sample_cubemap(faces: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """faces (6,S,S,4), dirs (P,3) → (P,4), bilinear, clamped."""
    S = faces.shape[1]
    face, uv = cubemap_face_uv(dirs)
    x = uv[:, 0] * S - 0.5
    y = uv[:, 1] * S - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    flat = faces.reshape(6 * S * S, faces.shape[-1])

    def tap(xi, yi):
        xi = jnp.clip(xi, 0, S - 1)
        yi = jnp.clip(yi, 0, S - 1)
        return flat[face * S * S + yi * S + xi]

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    t00 = tap(x0i, y0i)
    t10 = tap(x0i + 1, y0i)
    t01 = tap(x0i, y0i + 1)
    t11 = tap(x0i + 1, y0i + 1)
    return (
        t00 * (1 - fx) * (1 - fy)
        + t10 * fx * (1 - fy)
        + t01 * (1 - fx) * fy
        + t11 * fx * fy
    )


def sample_prefiltered(prefiltered: jnp.ndarray, dirs: jnp.ndarray, roughness: jnp.ndarray):
    """prefiltered (N_MIPS,6,S,S,4); roughness (P,) selects mip, lerped."""
    n = prefiltered.shape[0]
    level = jnp.clip(roughness, 0.0, 1.0) * (n - 1)
    l0 = jnp.floor(level).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n - 1)
    frac = (level - l0.astype(jnp.float32))[:, None]

    S = prefiltered.shape[2]
    face, uv = cubemap_face_uv(dirs)
    x = jnp.clip((uv[:, 0] * S - 0.5), 0, S - 1)
    y = jnp.clip((uv[:, 1] * S - 0.5), 0, S - 1)
    x0 = x.astype(jnp.int32)
    y0 = y.astype(jnp.int32)
    flat = prefiltered.reshape(n * 6 * S * S, prefiltered.shape[-1])

    def tap(l):
        return flat[((l * 6) + face) * S * S + y0 * S + x0]

    return tap(l0) * (1 - frac) + tap(l1) * frac
