"""Cubemap sampling (skybox, IBL prefiltered/irradiance).

Port of the cubemap sampling used by the reference's lighting WGSL
(shared_wgsl/lighting/lights.wgsl IBL path, material_opaque skybox miss
path). Faces follow the WebGPU/GL order +X,-X,+Y,-Y,+Z,-Z with standard
uv orientation. Bilinear filtering with edge clamp (no seam blending).

Device layout is quad-packed, same trick as ops/texsample.py: each texel
row carries its edge-clamped right/down/diag neighbors (16 channels), so
one bilinear tap = ONE latency-bound TPU gather instead of four.
`pack_cubemap` builds the packed buffer host-side at scene flush.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def pack_cubemap(faces: np.ndarray) -> np.ndarray:
    """(..., 6, S, S, 4) f32 → (..., 6*S*S, 16) quad-packed, clamp wrap.

    Leading dims (e.g. the prefiltered roughness-mip axis) are preserved.
    """
    from ..core.textures import WRAP_CLAMP, _pack_quads

    faces = np.asarray(faces, dtype=np.float32)
    lead = faces.shape[:-4]
    S = faces.shape[-2]
    flat_faces = faces.reshape(-1, S, S, 4)
    packed = np.stack([_pack_quads(f, WRAP_CLAMP, WRAP_CLAMP) for f in flat_faces])
    return packed.reshape(*lead, 6 * S * S, 16)


def cubemap_face_uv(dirs: jnp.ndarray):
    """dirs (P,3) → (face (P,) i32, uv (P,2) in [0,1])."""
    face, u, v = cubemap_face_uv_c((dirs[:, 0], dirs[:, 1], dirs[:, 2]))
    return face, jnp.stack([u, v], axis=-1)


def cubemap_face_uv_c(d3):
    """Channel form: (x, y, z) (P,) → (face (P,) i32, u (P,), v (P,))."""
    x, y, z = d3
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
    return face, u, v


def _bilinear_setup_c(d3, S: int):
    """Shared footprint math: flat base index within one cubemap + (P,)
    fractional weights (channel-column form — see ops/cvec.py)."""
    face, u, v = cubemap_face_uv_c(d3)
    x = jnp.clip(u * S - 0.5, 0.0, S - 1.0)
    y = jnp.clip(v * S - 0.5, 0.0, S - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    idx = face * (S * S) + y0.astype(jnp.int32) * S + x0.astype(jnp.int32)
    return idx, fx, fy


def _bilinear_setup(dirs: jnp.ndarray, S: int):
    idx, fx, fy = _bilinear_setup_c((dirs[:, 0], dirs[:, 1], dirs[:, 2]), S)
    return idx, fx[:, None], fy[:, None]


def _blend_quads(q: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray) -> jnp.ndarray:
    return (
        q[:, 0:4] * (1 - fx) * (1 - fy)
        + q[:, 4:8] * fx * (1 - fy)
        + q[:, 8:12] * (1 - fx) * fy
        + q[:, 12:16] * fx * fy
    )


def _blend_quads_c(cols, fx, fy):
    """16 (P,) texel columns + (P,) weights → [r,g,b,a] channels."""
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    return [cols[c] * w00 + cols[4 + c] * w10 + cols[8 + c] * w01
            + cols[12 + c] * w11 for c in range(4)]


def sample_cubemap(packed: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """packed (6*S*S,16) quad rows, dirs (P,3) → (P,4), bilinear, clamped."""
    S = math.isqrt(packed.shape[0] // 6)
    idx, fx, fy = _bilinear_setup(dirs, S)
    return _blend_quads(packed[idx], fx, fy)


def sample_env_batch_c(skybox_p, irradiance_p, prefiltered_p, irr_dirs,
                       pref_reqs, sky_dirs=None, texq=None, env_base=None):
    """All of a pass's environment taps through ONE gather (channel form).

    skybox_p (A,16) / irradiance_p (B,16) / prefiltered_p (n, C, 16) are
    quad-packed; irr_dirs: (x,y,z) channel triple; pref_reqs: list of
    (dir-triple, roughness (P,)); sky_dirs: optional view-ray triple for
    the miss-path skybox color. Returns (irr [r,g,b,a], [pref_i ...],
    sky|None) as channel lists. Separate gathers fused into one XLA
    computation anti-fuse catastrophically on TPU (see ops/texsample.py),
    so the three maps are concatenated (cheap bandwidth) and every tap
    rides one gather.

    texq/env_base: when given, gather from the frame's TEXEL POOL table
    instead — renderer._flush appends the same [skybox | irradiance |
    prefiltered] quad rows (bf16, texel-row width) at row `env_base`
    (a traced i32 is fine; gather indices are dynamic anyway). One big
    promoted table for BOTH the material taps and the env taps is what
    keeps every gather at the promoted-memory floor: two separate large
    tables bust XLA's alternate-memory budget and one gather silently
    runs ~8x slower from HBM (ARCHITECTURE.md gather economics). The
    skybox_p/irradiance_p/prefiltered_p args are then shape-only."""
    A = skybox_p.shape[0]
    B = irradiance_p.shape[0]
    n = prefiltered_p.shape[0]
    C = prefiltered_p.shape[1]
    S_sky = math.isqrt(A // 6)
    S_irr = math.isqrt(B // 6)
    S_pref = math.isqrt(C // 6)
    if texq is None:
        env = jnp.concatenate(
            [skybox_p, irradiance_p, prefiltered_p.reshape(n * C, 16)])
        base = 0
    else:
        env = texq
        base = env_base

    parts = []      # index arrays
    plans = []      # per output: (kind, part0, fx, fy, part1, frac)

    idx, fx, fy = _bilinear_setup_c(irr_dirs, S_irr)
    plans.append(("irr", len(parts), fx, fy, None, None))
    parts.append(base + idx + A)

    if sky_dirs is not None:
        idx, fx, fy = _bilinear_setup_c(sky_dirs, S_sky)
        plans.append(("sky", len(parts), fx, fy, None, None))
        parts.append(base + idx)

    for dirs, roughness in pref_reqs:
        level = jnp.clip(roughness, 0.0, 1.0) * (n - 1)
        l0 = jnp.floor(level).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, n - 1)
        frac = level - l0.astype(jnp.float32)
        idx, fx, fy = _bilinear_setup_c(dirs, S_pref)
        plans.append(("pref", len(parts), fx, fy, len(parts) + 1, frac))
        parts.append(base + A + B + l0 * C + idx)
        parts.append(base + A + B + l1 * C + idx)

    P = irr_dirs[0].shape[0]
    q_all = env[jnp.clip(jnp.concatenate(parts), 0, env.shape[0] - 1)]
    if texq is not None:
        q_all = q_all[:, :16]     # texel rows are 64-wide; quad is [0:16]
    # ONE physical Pallas pass → each channel born as its own rank-1
    # array with the canonical layout (see ops/relayout.py)
    from .relayout import split_channels
    cols_all = split_channels(q_all)

    def cols(i):
        return [c[i * P : (i + 1) * P] for c in cols_all]

    irr_out = None
    sky_out = None
    pref_outs = []
    for kind, p0, fx, fy, p1, frac in plans:
        s0 = _blend_quads_c(cols(p0), fx, fy)
        if kind == "pref":
            s1 = _blend_quads_c(cols(p1), fx, fy)
            pref_outs.append([a * (1 - frac) + b * frac
                              for a, b in zip(s0, s1)])
        elif kind == "sky":
            sky_out = s0
        else:
            irr_out = s0
    return irr_out, pref_outs, sky_out


def sample_skybox_pool_c(texq, env_base, sky_rows: int, d3):
    """Skybox-only bilinear taps from the texel-pool env block.

    texq (N,64) bf16 texel table with the env rows appended at env_base
    (renderer._flush); sky_rows = static skybox row count (6*S*S); d3 =
    (x,y,z) direction channel triple. One small gather into the SAME
    promoted table — used for the sky fill of compaction-skipped tiles
    (shade_deferred_compact_c image-env path), so the gather row count
    is O(sky pixels), not O(frame)."""
    from .relayout import split_channels

    S = math.isqrt(sky_rows // 6)
    idx, fx, fy = _bilinear_setup_c(d3, S)
    q = texq[jnp.clip(env_base + idx, 0, texq.shape[0] - 1)][:, :16]
    return _blend_quads_c(split_channels(q), fx, fy)


def sample_env_batch(skybox_p, irradiance_p, prefiltered_p, irr_dirs, pref_reqs,
                     sky_dirs=None):
    """AoS-compat wrapper over sample_env_batch_c ((P,3) dirs, (P,4) outs)."""

    def c3(d):
        return (d[:, 0], d[:, 1], d[:, 2])

    irr, prefs, sky = sample_env_batch_c(
        skybox_p, irradiance_p, prefiltered_p, c3(irr_dirs),
        [(c3(d), r) for d, r in pref_reqs],
        None if sky_dirs is None else c3(sky_dirs))
    st = lambda ch: None if ch is None else jnp.stack(ch, axis=-1)
    return st(irr), [st(p) for p in prefs], st(sky)


def sample_prefiltered(packed: jnp.ndarray, dirs: jnp.ndarray, roughness: jnp.ndarray):
    """packed (N_MIPS, 6*S*S, 16); roughness (P,) selects mip, lerped.

    Bilinear within each roughness level (one packed gather per level;
    the pre-packing point-sampled to keep gather count down)."""
    n = packed.shape[0]
    S = math.isqrt(packed.shape[1] // 6)
    level = jnp.clip(roughness, 0.0, 1.0) * (n - 1)
    l0 = jnp.floor(level).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n - 1)
    frac = (level - l0.astype(jnp.float32))[:, None]

    idx, fx, fy = _bilinear_setup(dirs, S)
    flat = packed.reshape(n * packed.shape[1], 16)
    stride = packed.shape[1]
    s0 = _blend_quads(flat[l0 * stride + idx], fx, fy)
    s1 = _blend_quads(flat[l1 * stride + idx], fx, fy)
    return s0 * (1 - frac) + s1 * frac
