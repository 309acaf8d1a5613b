"""Texture sampling from the flat texel buffer.

TPU-native port of the reference's texture-pool array sampling with
gradient-based mip selection (render_passes/shared/shared_wgsl/textures.wgsl
+ material_opaque_wgsl helpers/mipmap math). All sampling is explicit
gathers: descriptor row → mip offsets → wrapped bilinear taps → trilinear
blend. One code path for every texture regardless of size (see
core/textures.py for the layout rationale).

Shapes: pixel-batched — `tex_id (P,) i32`, `uv (P,2) f32` → `(P,4) f32`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.textures import (
    MAX_MIPS,
    TD_FILTER_LINEAR,
    TD_HEIGHT,
    TD_MIP_FILTER_LINEAR,
    TD_MIP_OFFSETS,
    TD_N_MIPS,
    TD_WIDTH,
    TD_WRAP_S,
    TD_WRAP_T,
    WRAP_CLAMP,
    WRAP_MIRROR,
    WRAP_REPEAT,
)


def _wrap_coord(i: jnp.ndarray, n: jnp.ndarray, mode: jnp.ndarray) -> jnp.ndarray:
    """Wrap integer texel coord i into [0, n) per-pixel by sampler mode."""
    rep = jnp.remainder(i, n)
    clm = jnp.clip(i, 0, n - 1)
    # mirror: period 2n, reflect the second half
    m = jnp.remainder(i, 2 * n)
    mir = jnp.where(m >= n, 2 * n - 1 - m, m)
    out = jnp.where(mode == WRAP_REPEAT, rep, jnp.where(mode == WRAP_CLAMP, clm, mir))
    return out


def _prep_coord(u: jnp.ndarray, n_f: jnp.ndarray, mode: jnp.ndarray) -> jnp.ndarray:
    """Continuous texel-space coord with wrap baked into its range.

    MIRROR folds u into [0,1] (triangle wave, period 2) — after which the
    correct integer-level behavior is CLAMP. CLAMP (and folded MIRROR)
    pre-clamps the continuous coord to [0, n-1] so the bilinear footprint
    [x0, x0+1] never leaves the texture: at the edge fx→0 so the baked
    edge-clamped neighbor contributes nothing — identical results to
    per-tap clamping. REPEAT stays unbounded; modular wrap of x0 composes
    with the modular baked neighbor ((a mod n)+1 mod n == (a+1) mod n)."""
    u_mir = 1.0 - jnp.abs(2.0 * (u * 0.5 - jnp.floor(u * 0.5)) - 1.0)
    u_p = jnp.where(mode == WRAP_MIRROR, u_mir, u)
    x = u_p * n_f - 0.5
    return jnp.where(mode == WRAP_REPEAT, x, jnp.clip(x, 0.0, n_f - 1.0))


def _level_idx(desc, uv, level):
    """Footprint math for one mip level: texel-row indices + weights.

    Returns (idx (P,), fx, fy). The actual texel
    fetch is deferred so a whole pass's taps can ride ONE gather —
    XLA's TPU lowering runs a lone 2M-row gather ~30x faster than two
    gathers fused into the same computation (measured: 1 gather of 4M
    concatenated rows ≈ 2 ms; 2 separate 2M gathers in one jit ≈ 45-67
    ms), so batching indices and splitting the result is the difference
    between HBM-speed sampling and latency-bound sampling."""
    w0 = desc[:, TD_WIDTH]
    h0 = desc[:, TD_HEIGHT]
    wm = jnp.maximum(w0 >> level, 1)
    hm = jnp.maximum(h0 >> level, 1)
    lv = jnp.clip(level, 0, MAX_MIPS - 1)
    # select the mip offset with a one-hot sum (row-wise dynamic column
    # extraction lowers to a slow gather otherwise)
    offset = sum(
        jnp.where(lv == m, desc[:, TD_MIP_OFFSETS + m], 0) for m in range(MAX_MIPS)
    )
    wrap_s = desc[:, TD_WRAP_S]
    wrap_t = desc[:, TD_WRAP_T]

    wf = wm.astype(jnp.float32)
    hf = hm.astype(jnp.float32)
    x = _prep_coord(uv[:, 0], wf, wrap_s)
    y = _prep_coord(uv[:, 1], hf, wrap_t)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0i = _wrap_coord(x0.astype(jnp.int32), wm, wrap_s)
    y0i = _wrap_coord(y0.astype(jnp.int32), hm, wrap_t)
    idx = offset + y0i * wm + x0i
    return idx, fx, fy


def _blend_bilinear(q, fx, fy):
    """q: (P,16) quad-packed rows → (P,4) bilinear blend."""
    return (
        q[:, 0:4] * (1 - fx) * (1 - fy)
        + q[:, 4:8] * fx * (1 - fy)
        + q[:, 8:12] * (1 - fx) * fy
        + q[:, 12:16] * fx * fy
    )


def _pick_nearest(q, fx, fy):
    """Nearest-filter texel from a quad-packed row — no extra gather.

    The nearest texel floor(u*n) is always one of the quad's 4 corners:
    the continuous coord is x = u*n - 0.5 with x0 = floor(x), so
    floor(x + 0.5) is x0 when the fraction is < 0.5 and x0+1 otherwise
    (quad neighbors are pre-wrapped, core/textures.py::_pack_quads)."""
    right = fx >= 0.5
    down = fy >= 0.5
    top = jnp.where(right, q[:, 4:8], q[:, 0:4])
    bot = jnp.where(right, q[:, 12:16], q[:, 8:12])
    return jnp.where(down, bot, top)


def _mip_level(desc, duv_dx, duv_dy):
    """Isotropic LOD from screen-space uv gradients (per-pixel, given the
    already-fetched descriptor rows)."""
    w = desc[:, TD_WIDTH].astype(jnp.float32)
    h = desc[:, TD_HEIGHT].astype(jnp.float32)
    gx = jnp.stack([duv_dx[:, 0] * w, duv_dx[:, 1] * h], axis=-1)
    gy = jnp.stack([duv_dy[:, 0] * w, duv_dy[:, 1] * h], axis=-1)
    rho2 = jnp.maximum(jnp.sum(gx * gx, axis=-1), jnp.sum(gy * gy, axis=-1))
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))


def sample_texture_batch(texq, descriptors, taps, has_nearest: bool = True):
    """Sample many texture taps through ONE texel gather (and one
    descriptor one-hot matmul).

    taps: list of (tex_id (P,) i32, uv (P,2) f32, duv or None) where duv =
    (duv_dx, duv_dy) enables gradient mip selection + trilinear. Returns a
    list of (P,4) colors aligned with taps; tex_id < 0 → white. This is
    the TPU shape of the reference's texture-pool sampling loop
    (material_opaque_wgsl/compute.wgsl): all slots sample together.
    """
    from .vertex import onehot_gather

    if not taps:
        return []
    P = taps[0][0].shape[0]
    nt = len(taps)

    # one descriptor fetch for all taps
    ids_all = jnp.concatenate([jnp.clip(t[0], 0, descriptors.shape[0] - 1)
                               for t in taps])
    desc_all = onehot_gather(ids_all, descriptors.astype(jnp.float32)).astype(jnp.int32)
    descs = [desc_all[i * P : (i + 1) * P] for i in range(nt)]

    # per-tap, per-level index/weight computation (pure ALU)
    plans = []
    idx_parts = []
    for (tex_id, uv, duv), desc in zip(taps, descs):
        n_mips = desc[:, TD_N_MIPS]
        if duv is not None:
            level = jnp.clip(_mip_level(desc, duv[0], duv[1]), 0.0,
                             (n_mips - 1).astype(jnp.float32))
            l0 = jnp.floor(level).astype(jnp.int32)
            l1 = jnp.minimum(l0 + 1, n_mips - 1)
            frac = (level - l0.astype(jnp.float32))[:, None]
        else:
            l0 = jnp.zeros(P, jnp.int32)
            l1 = None
            frac = None
        sub = []
        for lv in (l0, l1):
            if lv is None:
                continue
            idx, fx, fy = _level_idx(desc, uv, lv)
            sub.append((len(idx_parts), fx, fy))
            idx_parts.append(idx)
        plans.append((tex_id, desc, frac, sub))

    # THE gather: every tap, level, and nearest probe in one op
    idx_all = jnp.clip(jnp.concatenate(idx_parts), 0, texq.shape[0] - 1)
    q_all = texq[idx_all]                                  # (n_parts*P, 16)

    def part(i):
        return q_all[i * P : (i + 1) * P]

    outs = []
    for (tex_id, desc, frac, sub) in plans:
        linear = desc[:, TD_FILTER_LINEAR] > 0
        levels = []
        for (part_i, fx, fy) in sub:
            q = part(part_i)
            bil = _blend_bilinear(q, fx, fy)
            if has_nearest:
                # nearest filtering selects a quad corner — same gather
                bil = jnp.where(linear[:, None], bil, _pick_nearest(q, fx, fy))
            levels.append(bil)
        if frac is not None and len(levels) == 2:
            tri = desc[:, TD_MIP_FILTER_LINEAR] > 0
            out = jnp.where(tri[:, None],
                            levels[0] * (1 - frac) + levels[1] * frac, levels[0])
        else:
            out = levels[0]
        outs.append(jnp.where((tex_id >= 0)[:, None], out, jnp.ones_like(out)))
    return outs


def _sample_level(texq, desc, uv, level, has_nearest: bool = True):
    """Bilinear sample at integer mip `level` (P,). desc: (P, DESC_I32).

    texq is the quad-packed texel buffer (N, 16): each row carries the
    texel plus its pre-wrapped right/down/diag neighbors
    (core/textures.py::_pack_quads), so one bilinear tap = ONE gather.
    has_nearest=False compiles out the nearest-filter select."""
    idx, fx, fy = _level_idx(desc, uv, level)
    q = texq[jnp.clip(idx, 0, texq.shape[0] - 1)]
    bil = _blend_bilinear(q, fx, fy)
    if not has_nearest:
        return bil
    linear = desc[:, TD_FILTER_LINEAR] > 0
    return jnp.where(linear[:, None], bil, _pick_nearest(q, fx, fy))


def sample_texture(texq, descriptors, tex_id, uv, mip_level=None,
                   has_nearest: bool = True):
    """Sample textures per pixel. tex_id < 0 → white (1,1,1,1).
    texq: quad-packed texel buffer (N, 16) — see core/textures.py.

    mip_level: (P,) f32 or None (base level). Trilinear when the sampler's
    mip filter is linear, else nearest-mip. The descriptor fetch rides the
    MXU (one-hot matmul — the descriptor table is tiny and XLA's TPU
    gather lowering is slow).
    """
    from .vertex import onehot_gather

    P = tex_id.shape[0]
    safe_id = jnp.clip(tex_id, 0, descriptors.shape[0] - 1)
    desc = onehot_gather(safe_id, descriptors.astype(jnp.float32)).astype(jnp.int32)
    n_mips = desc[:, TD_N_MIPS]

    if mip_level is None:
        out = _sample_level(texq, desc, uv, jnp.zeros(P, jnp.int32), has_nearest)
    else:
        level = jnp.clip(mip_level, 0.0, (n_mips - 1).astype(jnp.float32))
        l0 = jnp.floor(level).astype(jnp.int32)
        l1 = jnp.minimum(l0 + 1, n_mips - 1)
        frac = (level - l0.astype(jnp.float32))[:, None]
        s0 = _sample_level(texq, desc, uv, l0, has_nearest)
        tri = desc[:, TD_MIP_FILTER_LINEAR] > 0
        s1 = _sample_level(texq, desc, uv, l1, has_nearest)
        out = jnp.where(tri[:, None], s0 * (1 - frac) + s1 * frac, s0)

    return jnp.where((tex_id >= 0)[:, None], out, jnp.ones_like(out))


def mip_level_from_grads(descriptors, tex_id, duv_dx, duv_dy):
    """Standard isotropic LOD: log2(max gradient length in texel space).

    Ports the reference's gradient-based mip selection in the opaque
    shading kernel (material_opaque_wgsl/compute.wgsl texture sampling).
    """
    from .vertex import onehot_gather

    safe_id = jnp.clip(tex_id, 0, descriptors.shape[0] - 1)
    desc = onehot_gather(safe_id, descriptors.astype(jnp.float32)).astype(jnp.int32)
    w = desc[:, TD_WIDTH].astype(jnp.float32)
    h = desc[:, TD_HEIGHT].astype(jnp.float32)
    gx = jnp.stack([duv_dx[:, 0] * w, duv_dx[:, 1] * h], axis=-1)
    gy = jnp.stack([duv_dy[:, 0] * w, duv_dy[:, 1] * h], axis=-1)
    rho2 = jnp.maximum(jnp.sum(gx * gx, axis=-1), jnp.sum(gy * gy, axis=-1))
    return 0.5 * jnp.log2(jnp.maximum(rho2, 1e-12))


def apply_texture_transform(tex_transforms, transform_id, uv):
    """KHR_texture_transform: uv' = M @ uv + offset; id < 0 → identity.

    Row slot 6 is a mode flag: 1 = wrap (fract) uv BEFORE the affine map —
    used by MegaTexture atlas entries so REPEAT sampling stays inside the
    entry's sub-rectangle (reference mega_texture per-entry uv offset/scale
    behaves the same way)."""
    safe = jnp.clip(transform_id, 0, tex_transforms.shape[0] - 1)
    t = tex_transforms[safe]                            # (P, 8)
    wrap_first = t[:, 6] > 0.5
    uvw = jnp.where(wrap_first[:, None], uv - jnp.floor(uv), uv)
    u = t[:, 0] * uvw[:, 0] + t[:, 1] * uvw[:, 1] + t[:, 4]
    v = t[:, 2] * uvw[:, 0] + t[:, 3] * uvw[:, 1] + t[:, 5]
    out = jnp.stack([u, v], axis=-1)
    return jnp.where((transform_id >= 0)[:, None], out, uv)
