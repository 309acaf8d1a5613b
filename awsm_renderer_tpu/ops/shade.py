"""Surface shading: deferred opaque pass + forward transparent layers.

TPU-native port of the reference's material passes:
- material_opaque compute pass (render_passes/material_opaque/
  material_opaque_wgsl/compute.wgsl:100-322): consume the G-buffer,
  gradient-mip texture sampling, unlit-vs-PBR branch by material kind,
  punctual + IBL lighting, skybox on miss.
- material_transparent forward pass (material_transparent_wgsl/
  fragment.wgsl): full PBR per transparent fragment incl. transmission of
  the opaque color buffer (KHR_materials_transmission/volume).

TPU-first v2: the rasterizer already interpolated every vertex attribute
into G-buffer planes (ops/raster.py), so shading does NO per-triangle
gathers. The only remaining indexed reads are texture taps (unavoidable)
and the per-pixel material fetch, which goes through a one-hot matmul on
the MXU (ops/vertex.py onehot_gather). With a solid-color environment
(static `solid_env` flag) the IBL/skybox reads compile to constants, and
the split-sum BRDF LUT is replaced by Lazarov's analytic fit.

Static args mirror the reference's shader-template variables
(material_opaque/shader/template.rs): `slot_mask`, `use_mips`,
`solid_env`, `debug_normals`.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core import materials as M
from ..core.lights import (
    L_COLOR, L_DIRECTION, L_INNER_COS, L_KIND, L_OUTER_COS, L_POSITION, L_RANGE,
)
from . import brdf
from .cubemap import sample_env_batch_c
from .texsample import (
    apply_texture_transform_c,
    apply_texture_transform_with_grads_c,
    sample_texture_batch_c,
)
from .vertex import onehot_gather, onehot_gather_t

_EPS = 1e-6
ALL_SLOTS = tuple([True] * M.NUM_TEX_SLOTS)
# extension-enable flags: (clearcoat, sheen, iridescence, anisotropy,
# transmission, volume) — static per scene, like the reference's cargo
# features / template variables gating extension WGSL. VOLUME gates the
# screen-space refraction gather of the opaque buffer (a thickness > 0
# material exists); TRANSMISSION alone samples the background at the
# fragment's own pixel (fragment.wgsl sample_transmission_background).
(EXT_CLEARCOAT, EXT_SHEEN, EXT_IRIDESCENCE, EXT_ANISOTROPY,
 EXT_TRANSMISSION, EXT_VOLUME) = range(6)
ALL_EXT = (True, True, True, True, True, True)


def _normalize(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), _EPS)


# channel-column vector helpers: ALL shading math runs on flat (P,)
# channel arrays — a (P,4)-shaped elementwise op on TPU runs at 4/128
# lane efficiency (~0.26 ms each at 1080p; the AoS form of this pass
# measured ~16 ms of pure ALU before any texture work). See ops/cvec.py.
from .cvec import (  # noqa: E402
    add as v_add, cross3, dot3, lerp as v_lerp, mul as v_mul, norm3,
    scale as v_scale, where as v_where,
)


def env_brdf_approx(n_dot_v, roughness):
    """Analytic split-sum environment BRDF (Lazarov 2013 fit) — replaces
    the LUT texture fetch (renderer-core brdf_lut) with pure ALU."""
    c0 = jnp.array([-1.0, -0.0275, -0.572, 0.022])
    c1 = jnp.array([1.0, 0.0425, 1.04, -0.04])
    rx = roughness * c0[0] + c1[0]
    ry = roughness * c0[1] + c1[1]
    rz = roughness * c0[2] + c1[2]
    rw = roughness * c0[3] + c1[3]
    a004 = jnp.minimum(rx * rx, jnp.exp2(-9.28 * n_dot_v)) * rx + ry
    return a004 * -1.04 + rz, a004 * 1.04 + rw  # (A, B)


def _one_light(row, active, n_pos, n, v, base_diffuse, f0, alpha_rough,
               n_dot_v, total):
    """Shade ONE light into `total` (reference: lighting/lights.wgsl
    per-light body). `row` is indexable by light-field constant and may
    yield scalars (the dense capacity loop) or (n_units, 1) columns
    broadcasting against (n_units, 128) pixel planes (the tiled-list
    loop); `active` likewise."""
    kind = row[L_KIND]
    intensity = row[4]
    lrange = row[L_RANGE]
    is_dir = kind == 0.0

    tl = [jnp.where(is_dir, -row[L_DIRECTION + k],
                    row[L_POSITION + k] - n_pos[k]) for k in range(3)]
    dist = jnp.sqrt(dot3(tl, tl))
    inv_d = 1.0 / jnp.maximum(dist, _EPS)
    l = v_scale(tl, inv_d)

    atten = jnp.where(is_dir, 1.0, 1.0 / jnp.maximum(dist * dist, _EPS))
    window = jnp.where(
        (lrange > 0.0) & ~is_dir,
        jnp.clip(1.0 - (dist / jnp.maximum(lrange, _EPS)) ** 4, 0.0, 1.0) ** 2,
        1.0,
    )
    cd = -(l[0] * row[L_DIRECTION] + l[1] * row[L_DIRECTION + 1]
           + l[2] * row[L_DIRECTION + 2])
    spot = jnp.where(
        kind == 2.0,
        jnp.clip(
            (cd - row[L_OUTER_COS]) / jnp.maximum(row[L_INNER_COS] - row[L_OUTER_COS], 1e-4),
            0.0, 1.0,
        ),
        1.0,
    )

    n_dot_l = jnp.maximum(dot3(n, l), 0.0)
    h = norm3(v_add(l, v))
    n_dot_h = jnp.maximum(dot3(n, h), 0.0)
    v_dot_h = jnp.maximum(dot3(v, h), 0.0)

    f = brdf.f_schlick3(v_dot_h, f0)
    spec_s = brdf.specular_ggx(n_dot_l, n_dot_v, n_dot_h, alpha_rough)
    rad = atten * window * spot * n_dot_l * intensity
    gated = jnp.where(active, rad, 0.0)
    inv_pi = 1.0 / jnp.pi
    for c in range(3):
        lobe = base_diffuse[c] * inv_pi * (1.0 - f[c]) + spec_s * f[c]
        total[c] = total[c] + (row[L_COLOR + c] * gated) * lobe
    return total


def _punctual_lights(ds, n_pos, n, v, base_diffuse, f0, alpha_rough,
                     light_tiles: bool = False, valid=None):
    """Accumulate punctual lighting (reference: lighting/lights.wgsl loop).

    Channel-column form: n_pos/n/v/base_diffuse/f0 are channel lists.
    Default: loops the static light capacity; rows >= n_lights are
    masked. light_tiles=True dispatches to the tiled-light-list path
    (passes/light_culling.py design — the pass the reference stubbed)."""
    if light_tiles:
        return _punctual_lights_tiled(
            ds, n_pos, n, v, base_diffuse, f0, alpha_rough, valid=valid)
    lights = ds["lights"]
    n_lights = ds["n_lights"]
    n_dot_v = jnp.maximum(dot3(n, v), _EPS)

    total = [jnp.zeros_like(alpha_rough) for _ in range(3)]
    for li in range(lights.shape[0]):
        total = _one_light(lights[li], li < n_lights, n_pos, n, v,
                           base_diffuse, f0, alpha_rough, n_dot_v, total)
    return total


def _punctual_lights_tiled(ds, n_pos, n, v, base_diffuse, f0, alpha_rough,
                           valid=None):
    """Tiled-light-list punctual accumulation — the real implementation
    of the pass the reference left as a stub (light_culling/
    render_pass.rs:30-34 `// TODO!`; docs/ROADMAP.md:24-33 sketches
    tiled lists). TPU-native shape (passes/light_culling.py design):

    - units are the shading layout's native 128-pixel lanes groups:
      every (P,) plane reshapes to (n_units, 128) for free, in band
      space AND in the strip/tile-compacted space
    - per unit: world AABB of its pixels' positions (two reduces per
      axis; miss pixels only inflate the box — conservative)
    - overlap + priority via passes/light_culling.py
      `light_lists_from_bounds` (shared with the standalone pass
      interface): sphere-vs-AABB geometric test; priority = estimated
      contribution (intensity / (1 + d²) for positional lights), so
      overflow drops the FAINTEST lights per unit, not the
      latest-inserted
    - the shading loop runs the LIST length with per-unit (n_units, 1)
      light params broadcasting against (n_units, 128) pixels —
      O(pixels x K) ALU instead of O(pixels x light capacity).

    Exact vs the dense loop whenever <= MAX_LIGHTS_PER_TILE lights
    genuinely reach any one unit (tests/test_hooks_lightcull.py);
    beyond that the estimated-faintest lights drop per unit, the
    standard tiled-deferred contract. Force the dense loop with
    RendererConfig.light_tiles = False."""
    from ..passes.light_culling import (
        MAX_LIGHTS_PER_TILE, light_lists_from_bounds,
    )

    lights = ds["lights"]           # (L, 16)
    n_lights = ds["n_lights"]
    L = lights.shape[0]
    K = min(MAX_LIGHTS_PER_TILE, L)
    P = alpha_rough.shape[0]
    U = 128
    n_units = P // U

    pos_u = [p.reshape(n_units, U) for p in n_pos]
    if valid is not None:
        # miss pixels carry far-plane/zero positions that inflate the
        # unit AABB to the whole frustum depth — with them included the
        # 64-light probe listed nearly every light per unit (r4 measured
        # only a 1.11x win over the dense loop). Covered-only bounds
        # stay exact: every shaded pixel is still inside its unit's box.
        v_u = valid.reshape(n_units, U)
        big = jnp.float32(3e38)
        mn = [jnp.min(jnp.where(v_u, p, big), axis=1) for p in pos_u]
        mx = [jnp.max(jnp.where(v_u, p, -big), axis=1) for p in pos_u]
    else:
        mn = [jnp.min(p, axis=1) for p in pos_u]      # (n_units,)
        mx = [jnp.max(p, axis=1) for p in pos_u]

    lidx, valid = light_lists_from_bounds(mn, mx, lights, n_lights, K)

    n_dot_v = jnp.maximum(dot3(n, v), _EPS)
    shp = [x.reshape(n_units, U) for x in (n_dot_v, alpha_rough)]
    n_u = [x.reshape(n_units, U) for x in n]
    v_u = [x.reshape(n_units, U) for x in v]
    bd_u = [x.reshape(n_units, U) for x in base_diffuse]
    f0_u = [jnp.broadcast_to(x, alpha_rough.shape).reshape(n_units, U)
            for x in f0]

    total = [jnp.zeros((n_units, U), jnp.float32) for _ in range(3)]
    for k in range(K):
        params = lights[lidx[:, k]]                   # (n_units, 16) tiny

        class _Row:
            def __getitem__(self, j):
                return params[:, j : j + 1]           # (n_units, 1)

        total = _one_light(
            _Row(), valid[:, k : k + 1], pos_u, n_u, v_u, bd_u, f0_u,
            shp[1], shp[0], total)
    return [t.reshape(P) for t in total]


def _material_table(ds):
    """Fused material table (cap, NUM_F32 + slots*3 + NUM_I32) f32 — ONE
    one-hot matmul fetches everything per pixel."""
    cap = ds["mat_float"].shape[0]
    return jnp.concatenate([
        ds["mat_float"],
        ds["mat_tex"].reshape(cap, -1).astype(jnp.float32),
        ds["mat_flags"].astype(jnp.float32),
    ], axis=1)


def _screen_gradient(ch, W, H, vertical: bool = False, layers: int = 1):
    """min-magnitude forward/backward screen difference of one (P,) plane.

    layers > 1: ch holds `layers` stacked images of H//layers rows each
    (the batched transparent-layer shade); differences never cross a
    layer boundary. The layers == 1 path stays strictly 2-D (H, W): a
    (1, H, W)/(H, W, 1) shape here cost ~4 ms PER select fusion at 1080p
    (degenerate-dim layouts again)."""
    if layers == 1:
        g = ch.reshape(H, W)
        ax = 0 if vertical else 1
        d = jnp.diff(g, axis=ax)
        if vertical:
            fwd = jnp.concatenate([d, d[-1:]], 0)
            bwd = jnp.concatenate([d[:1], d], 0)
        else:
            fwd = jnp.concatenate([d, d[:, -1:]], 1)
            bwd = jnp.concatenate([d[:, :1], d], 1)
        pick = jnp.where(jnp.abs(fwd) <= jnp.abs(bwd), fwd, bwd)
        return pick.reshape(-1)
    g = ch.reshape(layers, H // layers, W)
    axis = 1 if vertical else 2
    d = jnp.diff(g, axis=axis)                           # size-1 along axis
    last = jnp.take(d, jnp.array([-1]), axis=axis)
    first = jnp.take(d, jnp.array([0]), axis=axis)
    fwd = jnp.concatenate([d, last], axis=axis)          # edge-replicated
    bwd = jnp.concatenate([first, d], axis=axis)
    pick = jnp.where(jnp.abs(fwd) <= jnp.abs(bwd), fwd, bwd)
    return pick.reshape(-1)


#: resolved-plane names the resolve kernel emits, in output order
# global channel-isolation debug views ("channel:<name>" debug mode);
# indices match the per-material bitmask bit order (materials/pbr.rs:54-79)
DEBUG_CHANNELS = {
    "basecolor": 0,
    "metallicroughness": 1,
    "normals": 2,
    "occlusion": 3,
    "emissive": 4,
    "specular": 5,
}

RESOLVE_NAMES = (
    "tri_id", "mat_row", "uv0_u", "uv0_v", "uv1_u", "uv1_v",
    "color_r", "color_g", "color_b", "color_a",
    "normal_x", "normal_y", "normal_z",
    "tangent_x", "tangent_y", "tangent_z", "tangent_w",
    "du0_dx", "dv0_dx", "du0_dy", "dv0_dy",
)


def _resolve_math(ch, px, py):
    """The per-pixel attribute reconstruction ALU, shared by the XLA
    resolve path (resolve_gbuffer) and the fused Pallas kernel
    (resolve_planes_fused). `ch` is indexable by setup-channel constant
    and yields one vector per channel; px/py are pixel centers. Returns
    {name: vector} for every RESOLVE_NAMES entry except tri_id, plus
    "tri_id_f" (the original-id channel, still float, unmasked) — the
    same math the reference's deferred shade runs per pixel
    (material_opaque compute.wgsl)."""
    from .vertex import (
        S_COLOR, S_E0A, S_E0B, S_E0C, S_E1A, S_E1B, S_E1C, S_E2A, S_E2B,
        S_E2C, S_IW0, S_MAT_ROW, S_NORMAL, S_ORIG_ID, S_TANGENT,
        S_TANGENT_W, S_UV0, S_UV1,
    )

    # v4 plane-equation rows (ops/vertex.py): raw edge values; the area
    # factor cancels in the perspective-normalized weights
    e0 = ch[S_E0A] * px + (ch[S_E0B] * py + ch[S_E0C])
    e1 = ch[S_E1A] * px + (ch[S_E1B] * py + ch[S_E1C])
    e2 = ch[S_E2A] * px + (ch[S_E2B] * py + ch[S_E2C])
    iw0, iw1, iw2 = ch[S_IW0], ch[S_IW0 + 1], ch[S_IW0 + 2]

    pb0 = e0 * iw0
    pb1 = e1 * iw1
    pb2 = e2 * iw2
    denom = pb0 + pb1 + pb2
    inv_denom = 1.0 / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
    pn0 = pb0 * inv_denom
    pn1 = pb1 * inv_denom
    pn2 = pb2 * inv_denom

    def interp(row):
        return pn0 * ch[row] + pn1 * ch[row + 1] + pn2 * ch[row + 2]

    out = {}
    out["tri_id_f"] = ch[S_ORIG_ID]
    out["mat_row"] = ch[S_MAT_ROW]
    out["uv0_u"] = interp(S_UV0)
    out["uv0_v"] = interp(S_UV0 + 3)
    out["uv1_u"] = interp(S_UV1)
    out["uv1_v"] = interp(S_UV1 + 3)
    for i, name in enumerate(("color_r", "color_g", "color_b", "color_a")):
        out[name] = interp(S_COLOR + 3 * i)
    for i, name in enumerate(("normal_x", "normal_y", "normal_z")):
        out[name] = interp(S_NORMAL + 3 * i)
    for i, name in enumerate(("tangent_x", "tangent_y", "tangent_z")):
        out[name] = interp(S_TANGENT + 3 * i)
    out["tangent_w"] = ch[S_TANGENT_W]

    # uv0 screen derivatives (same formulas as the fat-G-buffer merge)
    a0, a1, a2 = ch[S_E0A], ch[S_E1A], ch[S_E2A]
    b0_, b1_, b2_ = ch[S_E0B], ch[S_E1B], ch[S_E2B]
    dD_dx = a0 * iw0 + a1 * iw1 + a2 * iw2
    dD_dy = b0_ * iw0 + b1_ * iw1 + b2_ * iw2
    dpn0_dx = inv_denom * (a0 * iw0 - pn0 * dD_dx)
    dpn1_dx = inv_denom * (a1 * iw1 - pn1 * dD_dx)
    dpn2_dx = inv_denom * (a2 * iw2 - pn2 * dD_dx)
    dpn0_dy = inv_denom * (b0_ * iw0 - pn0 * dD_dy)
    dpn1_dy = inv_denom * (b1_ * iw1 - pn1 * dD_dy)
    dpn2_dy = inv_denom * (b2_ * iw2 - pn2 * dD_dy)
    u0a, u0b, u0c = ch[S_UV0], ch[S_UV0 + 1], ch[S_UV0 + 2]
    v0a, v0b, v0c = ch[S_UV0 + 3], ch[S_UV0 + 4], ch[S_UV0 + 5]
    out["du0_dx"] = dpn0_dx * u0a + dpn1_dx * u0b + dpn2_dx * u0c
    out["dv0_dx"] = dpn0_dx * v0a + dpn1_dx * v0b + dpn2_dx * v0c
    out["du0_dy"] = dpn0_dy * u0a + dpn1_dy * u0b + dpn2_dy * u0c
    out["dv0_dy"] = dpn0_dy * v0a + dpn1_dy * v0b + dpn2_dy * v0c
    return out


def split_bf16_tables(setup_rows):
    """f32 (T, C) -> three bf16 (T, C) tables with b0+b1+b2 == f32
    exactly. XLA's TPU gather runs ~6x faster per row from bf16
    tables with <=128-byte rows than from the straight f32 table
    (measured in-frame at 1080p: one f32 gather 30.9 ms; three bf16
    gathers ~15 ms; rejected variants: f32 half-width x2 = 70 ms,
    f32->bf16-pair bitcast single gather = 26 ms, hi/lo bf16-half
    tables x2 = 43 ms)."""
    # NB: the obvious `x - bf16(x).astype(f32)` collapses under jit — XLA's
    # excess-precision pass elides the f32->bf16->f32 round-trip, making the
    # residuals exactly zero (verified on v5e: jit'd b1.max()==0). lax.reduce_
    # precision survives optimization and its RN rounding makes the 3-way
    # split reconstruct f32 EXACTLY (measured max err 0.0).
    b0f = jax.lax.reduce_precision(setup_rows, 8, 7)
    r = setup_rows - b0f
    b1f = jax.lax.reduce_precision(r, 8, 7)
    b2 = (r - b1f).astype(jnp.bfloat16)
    return b0f.astype(jnp.bfloat16), b1f.astype(jnp.bfloat16), b2


@functools.partial(
    jax.jit,
    static_argnames=("width", "height_full", "row_offset", "interpret",
                     "coord_scale"))
def resolve_planes_fused(tid, setup_rows, *, width: int, height_full: int,
                         row_offset=0, interpret: bool = False,
                         coord_scale: int = 1, px=None, py=None):
    """Slim (tri_id) buffer -> full attribute planes, production path.

    TWO fast bf16-split gathers fetch each pixel's winner setup row at
    b0+b1 ≈ 2^-16 relative precision (a third residual gather costs
    ~3.9 ms at 1080p and only ids needed it — but v5 rows are unsorted
    with rows[j].S_ORIG_ID == j, so tri_id comes exact from the raster's
    own int32 tid, and mat_row — an integer < 2^16 — reconstructs
    EXACTLY from two RN bf16 parts). ONE Pallas pass then fuses the f32
    reconstruction, the per-block transpose to channel rows, the whole
    interpolation ALU and the miss masking, emitting every plane
    rank-1 — the XLA equivalent spread this over a convert+add fusion,
    a splitter pass and select fusions (~12 ms extra at 1080p).
    Returns {name: (P,) plane} for RESOLVE_NAMES.

    px/py (optional, (P,) f32): explicit RASTER-SPACE pixel centers for
    plane evaluation — used by the covered-tile-compacted opaque shade
    (frame.py), where the flat index no longer encodes screen position;
    coord_scale/row_offset are ignored for the coordinate math then."""
    from jax.experimental import pallas as pl

    from .relayout import _padded, _pick_blk

    assert (px is None) == (py is None)
    if interpret:
        planes = {"tri_id": tid}
        out = resolve_gbuffer(planes, setup_rows, width=width,
                              height_full=height_full, row_offset=row_offset,
                              coord_scale=coord_scale, px=px, py=py)
        return {k: out[k] for k in RESOLVE_NAMES}

    P = tid.shape[0]
    C = setup_rows.shape[1]
    T = setup_rows.shape[0]
    b0, b1, _b2 = split_bf16_tables(setup_rows)
    # ONE gather fetches BOTH bf16 parts from a column-concatenated
    # (T, 2C) table. Gather speed on this TPU is set by whether XLA's
    # memory-space assignment promotes the TABLE into alternate memory
    # (S(1)): promoted ~1.9-4.5 ns/row, HBM ~15 ns/row. bf16 [T, 64]
    # tables tile as T(8,128)(2,1) — the minor dim pads to 128 lanes, so
    # each "32 MB" table occupies 64 MB and TWO of them bust the budget:
    # in-frame one of the pair ran 31.4 ms vs its twin's 3.85 ms
    # (profiled). The wide table packs the same bytes at full lane
    # utilization (one 64 MB buffer, promoted) — measured 9.3 ms for the
    # 2M-row gather vs 27.6 ms for the two-table split
    # (scripts/bench_gather_variants.py).
    tab = jnp.concatenate([b0, b1], axis=1)     # (T, 2C) bf16

    blk = _pick_blk(P)
    tid_p, Pp = _padded(tid, blk, 0)
    if Pp != P:   # pads are misses; gathered rows pad with zeros
        tid_p = tid_p.at[P:].set(-1)
    i = jnp.clip(tid_p, 0, T - 1)
    tab, i = jax.lax.optimization_barrier((tab, i))
    g = tab[i]                                  # (Pp, 2C) bf16, one gather

    explicit_xy = px is not None
    if explicit_xy:
        px_p, _ = _padded(px, blk, 0)
        py_p, _ = _padded(py, blk, 0)

    def kernel(tid_ref, g_ref, *rest):
        if explicit_xy:
            px_ref, py_ref, *o_refs = rest
        else:
            o_refs = rest
        pid = pl.program_id(0)
        gb = g_ref[:]                                    # (blk, 2C) bf16
        S = (gb[:, :C].astype(jnp.float32)
             + gb[:, C:].astype(jnp.float32)).T          # (C, blk)
        if explicit_xy:
            px = px_ref[:]
            py = py_ref[:]
        else:
            idx = (pid * blk
                   + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)[0])
            # coord_scale > 1: ids were taken at every scale-th sample of
            # a supersampled raster whose plane equations live in that
            # space — evaluate at the representative supersampled center
            px = (idx % width).astype(jnp.float32) * coord_scale + 0.5
            py = (((idx // width) + row_offset).astype(jnp.float32)
                  * coord_scale + 0.5)
        class _Rows:
            def __getitem__(self, k):
                return S[k]

        res = _resolve_math(_Rows(), px, py)
        t = tid_ref[:]
        miss = t < 0
        for name, o in zip(RESOLVE_NAMES, o_refs):
            if name == "tri_id":
                # v5 invariant: unsorted rows, rows[j].S_ORIG_ID == j —
                # the raster's own winner index IS the original id, so
                # ids stay exact without the residual table
                o[:] = jnp.where(miss, -1, t)
            else:
                o[:] = jnp.where(miss, 0.0, res[name])

    plane_spec = pl.BlockSpec((blk,), lambda n: (n,))
    in_specs = [plane_spec, pl.BlockSpec((blk, 2 * C), lambda n: (n, 0))]
    ins = [tid_p, g]
    if explicit_xy:
        in_specs += [plane_spec, plane_spec]
        ins += [px_p, py_p]
    outs = pl.pallas_call(
        kernel,
        grid=(Pp // blk,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec((blk,), lambda n: (n,))
                        for _ in RESOLVE_NAMES),
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (Pp,), jnp.int32 if n == "tri_id" else jnp.float32)
            for n in RESOLVE_NAMES),
        interpret=interpret,
    )(*ins)
    if Pp != P:
        outs = tuple(o[:P] for o in outs)
    return dict(zip(RESOLVE_NAMES, outs))


def resolve_gbuffer(planes, setup_rows, *, width: int, height_full: int,
                    row_offset=0, coord_scale: int = 1, px=None, py=None):
    """Expand a slim (tri_id, depth) G-buffer into full attribute planes.

    setup_rows: (T2, NSETUP) row-major (ids in the slim buffer are
    setup-row indices; original ids ride the S_ORIG_ID field, so passing
    either sorted or unsorted rows works). ONE gather fetches each
    pixel's whole triangle setup row; the (P, NSETUP) block is split
    into rank-1 channel planes by the Pallas splitter (column slices of
    a gathered table are the T(1,128)-layout relayout hazard — a sliced
    version of this resolve measured 103 ms at 1080p, the split version
    ~8 ms). Barycentrics, perspective weights, attributes and uv0 screen
    derivatives are then pure (P,) ALU — the same math the reference's
    deferred shade runs per pixel (material_opaque compute.wgsl)."""
    from .relayout import split_channels

    tid = planes["tri_id"]
    P = tid.shape[0]
    i = jnp.clip(tid, 0, setup_rows.shape[0] - 1)
    S = setup_rows[i]                                       # (P, NSETUP)
    ch = split_channels(S)

    if px is None:
        px = (jnp.arange(P, dtype=jnp.float32) % width) * coord_scale + 0.5
        py = (jnp.arange(P, dtype=jnp.float32) // width
              + jnp.float32(row_offset)) * coord_scale + 0.5

    res = _resolve_math(ch, px, py)
    out = dict(planes)
    # ids in = setup-row indices (v5 winner columns, or original ids with
    # unsorted rows — rows[orig].S_ORIG_ID == orig makes this idempotent);
    # ids out = original triangle-pool ids, what picking/shading expect
    out["tri_id"] = jnp.where(
        tid >= 0, (res["tri_id_f"] + 0.5).astype(jnp.int32), -1)
    # miss pixels: zero every resolved plane (the raster kernels' fields
    # init) — screen-space uv differencing reads neighbors, so garbage
    # from the clipped row-0 gather must not leak across silhouettes
    miss = tid < 0
    for k, v in res.items():
        if k != "tri_id_f":
            out[k] = jnp.where(miss, jnp.zeros((), v.dtype), v)
    return out


def shade_surface(
    planes,            # dict of (P,) flat G-buffer planes (ops/raster.py)
    ds,
    *,
    width: int, height: int, height_full: int, row_offset,
    use_mips: bool, slot_mask: Tuple[bool, ...],
    width_full: Optional[int] = None,   # full viewport width (2-D shards)
    col_offset=0,                       # this shard's first column
    solid_env: bool = False,
    has_nearest: bool = True,
    ext: Tuple[bool, ...] = ALL_EXT,
    debug_mode: str = "none",   # none | ibl | punctual (template.rs:46-65)
                                # | material (per-material bitmask,
                                #   pbr.rs:54-79)
    transparent_pass: bool = False,
    background: Optional[jnp.ndarray] = None,   # (P,3) opaque color behind
    setup_rows: Optional[jnp.ndarray] = None,   # (T2, NSETUP) for slim planes
    want_sky: bool = False,     # also return the miss-path skybox color
    want_transmission_factor: bool = False,  # return the background factor
    n_layer_tiles: int = 1,     # planes hold this many stacked layer images
    light_tiles: bool = False,  # per-128-px-unit tiled light lists
):
    """Shared fragment shading → (rgb (P,3), alpha (P,), valid, normal).

    alpha: coverage for the opaque pass; blend alpha for the transparent
    pass (base alpha with KHR transmission mixing against `background`).

    want_transmission_factor: instead of mixing `background` into the
    color, return the per-pixel (P,3) factor the compositor should apply
    to whatever ends up behind this fragment — lets K transparent layers
    shade in ONE batched call (one tap gather) and composite later in
    pure ALU. n_layer_tiles > 1 marks the planes as that many stacked
    layer images (screen coordinates wrap per layer)."""
    P = width * height
    W, H, H_full = width, height, height_full
    if setup_rows is not None and "uv0_u" not in planes:
        # slim G-buffer: rebuild attribute planes from the setup pool
        # (raster pixel coords are local to the planes, so row offset 0)
        assert n_layer_tiles == 1, "slim planes not supported layer-batched"
        planes = resolve_gbuffer(planes, setup_rows, width=W,
                                 height_full=H, row_offset=0)
    miss = planes["tri_id"] < 0
    depth = planes["depth"]

    uv0 = (planes["uv0_u"], planes["uv0_v"])
    # slimmed G-buffers omit uv1 / vertex-color planes (raster plane_layout)
    uv1 = (planes["uv1_u"], planes["uv1_v"]) if "uv1_u" in planes else uv0
    if "color_r" in planes:
        vcolor = [planes["color_r"], planes["color_g"],
                  planes["color_b"], planes["color_a"]]
    else:
        vcolor = [1.0, 1.0, 1.0, 1.0]
    n = norm3([planes["normal_x"], planes["normal_y"], planes["normal_z"]])
    tang = [planes["tangent_x"], planes["tangent_y"], planes["tangent_z"]]
    tang_w = planes["tangent_w"]
    if "du0_dx" in planes:
        duv = (planes["du0_dx"], planes["dv0_dx"],
               planes["du0_dy"], planes["dv0_dy"])
    else:
        # screen-space uv gradients (GPU quad-derivative model): forward /
        # backward differences of the interpolated uv0 planes; the
        # min-|magnitude| pick stays on the surface at silhouettes
        duv = (_screen_gradient(uv0[0], W, H, layers=n_layer_tiles),
               _screen_gradient(uv0[1], W, H, layers=n_layer_tiles),
               _screen_gradient(uv0[0], W, H, vertical=True,
                                layers=n_layer_tiles),
               _screen_gradient(uv0[1], W, H, vertical=True,
                                layers=n_layer_tiles))

    # ---- world position + view ray ------------------------------------------
    if "ndc_x" in planes:
        # tile-compacted planes (shade_transparent_layers_c tile_cap path):
        # pixel NDC coords travel as planes because the flat index no
        # longer encodes screen position
        xs, ys = planes["ndc_x"], planes["ndc_y"]
    else:
        W_full = W if width_full is None else width_full
        xs = ((jnp.arange(P, dtype=jnp.float32) % W
               + jnp.float32(col_offset) + 0.5) / W_full * 2.0 - 1.0)
        rows = jnp.arange(P, dtype=jnp.float32) // W
        if n_layer_tiles > 1:   # stacked layers: screen rows wrap per layer
            rows = rows % jnp.float32(H // n_layer_tiles)
        rows = rows + jnp.float32(row_offset)
        ys = 1.0 - (rows + 0.5) / H_full * 2.0
    ivp = ds["camera"]["inv_view_proj"]
    wp = [xs * ivp[j, 0] + ys * ivp[j, 1] + depth * ivp[j, 2] + ivp[j, 3]
          for j in range(4)]
    inv_w = 1.0 / jnp.where(jnp.abs(wp[3]) > _EPS, wp[3], _EPS)
    world_pos = [wp[0] * inv_w, wp[1] * inv_w, wp[2] * inv_w]
    cam_pos = ds["camera"]["position"]
    v = norm3([cam_pos[k] - world_pos[k] for k in range(3)])

    # ---- material fetch: ONE one-hot matmul, CHANNEL-MAJOR result ------------
    # (onehot_gather_t: a (P, 116) result's extracted columns get T(1,128)
    # layouts at 1/8 vector utilization + multi-ms relayout copies)
    mat_row = jnp.clip(planes["mat_row"].astype(jnp.int32), 0,
                       ds["mat_float"].shape[0] - 1)
    table = _material_table(ds)
    from .relayout import onehot_split_rows

    # fetch + split ONLY the columns this configuration reads: float
    # params, the 3 slot columns of ACTIVE texture slots, and the two
    # flag columns — the full 116-column split measured 4.1 ms at 1080p
    # (it is write-bandwidth bound), and inactive slots are dead rows
    needed = list(range(M.NUM_F32))
    needed += [M.NUM_F32 + s * 3 + c
               for s in range(M.NUM_TEX_SLOTS) if slot_mask[s]
               for c in range(3)]
    needed += [M.NUM_F32 + M.NUM_TEX_SLOTS * 3 + M.MI_KIND,
               M.NUM_F32 + M.NUM_TEX_SLOTS * 3 + M.MI_ALPHA_MODE]
    if debug_mode == "material":
        needed.append(M.NUM_F32 + M.NUM_TEX_SLOTS * 3 + M.MI_DEBUG_MASK)
    pos = {idx: p for p, idx in enumerate(needed)}
    cols = onehot_split_rows(mat_row, table[:, jnp.array(needed, jnp.int32)])
    fused = {idx: cols[p] for idx, p in pos.items()}

    def mf(i, k=1):
        return (fused[i] if k == 1
                else [fused[i + c] for c in range(k)])

    def slot_col(slot, c):
        return fused[M.NUM_F32 + slot * 3 + c]

    def mflag(i):
        return fused[M.NUM_F32 + M.NUM_TEX_SLOTS * 3 + i]

    is_unlit = mflag(M.MI_KIND) == float(M.KIND_UNLIT)
    is_grid = mflag(M.MI_KIND) == float(M.KIND_GRID)

    # ---- texture taps: ALL slots sample through ONE gather -------------------
    # (a lone TPU gather is ~30x faster than several fused into the same
    # computation — see sample_texture_batch_c)
    active_slots = [s for s in range(M.NUM_TEX_SLOTS) if slot_mask[s]]
    taps = []
    for slot in active_slots:
        tex_id = slot_col(slot, 0).astype(jnp.int32)
        uv_set = slot_col(slot, 1)
        tform = slot_col(slot, 2).astype(jnp.int32)
        use1 = uv_set == 1.0
        u = jnp.where(use1, uv1[0], uv0[0])
        vv = jnp.where(use1, uv1[1], uv0[1])
        # KHR_texture_transform rides INTO the batched sampler (the
        # fused tap planner applies it in-kernel; the fallback path
        # applies apply_texture_transform_with_grads_c)
        taps.append((tex_id, (u, vv), duv if use_mips else None, tform))
    tex_cache = dict(zip(active_slots, sample_texture_batch_c(
        ds["texels"], ds["tex_desc"], taps, has_nearest=has_nearest,
        tex_transforms=ds["tex_transforms"])))

    def tex(slot):
        """Batched sample of a material texture slot; compiles to a constant
        when no scene material binds it (template-variable specialization)."""
        return tex_cache.get(slot, [1.0, 1.0, 1.0, 1.0])

    base_tex = tex(M.TS_BASE_COLOR)
    base_f = mf(M.MF_BASE_COLOR, 4)
    base = [base_f[c] * base_tex[c] * vcolor[c] for c in range(4)]

    mr = tex(M.TS_METALLIC_ROUGHNESS)
    metallic = jnp.clip(mf(M.MF_METALLIC) * mr[2], 0.0, 1.0)
    roughness = jnp.clip(mf(M.MF_ROUGHNESS) * mr[1], 0.04, 1.0)
    alpha_rough = roughness * roughness

    occlusion = 1.0 + mf(M.MF_OCCLUSION_STRENGTH) * (tex(M.TS_OCCLUSION)[0] - 1.0)

    emis_tex = tex(M.TS_EMISSIVE)
    emis_f = mf(M.MF_EMISSIVE, 3)
    emis_s = mf(M.MF_EMISSIVE_STRENGTH)
    emissive = [emis_f[c] * emis_tex[c] * emis_s for c in range(3)]

    # ---- normal mapping ------------------------------------------------------
    n_dot_t = dot3(n, tang)
    t_w = norm3([tang[k] - n[k] * n_dot_t for k in range(3)])
    b_w = v_scale(cross3(n, t_w), tang_w)
    if slot_mask[M.TS_NORMAL]:
        nrm_tex = tex(M.TS_NORMAL)
        has_nrm_tex = slot_col(M.TS_NORMAL, 0) >= 0
        nscale = mf(M.MF_NORMAL_SCALE)
        tsx = (nrm_tex[0] * 2.0 - 1.0) * nscale
        tsy = (nrm_tex[1] * 2.0 - 1.0) * nscale
        tsz = nrm_tex[2] * 2.0 - 1.0
        n_mapped = norm3([tsx * t_w[k] + tsy * b_w[k] + tsz * n[k]
                          for k in range(3)])
        n_final = v_where(has_nrm_tex, n_mapped, n)
    else:
        n_final = n
    facing = dot3(n_final, v) < 0.0
    n_final = v_where(facing, [-c for c in n_final], n_final)

    # ---- BRDF inputs (glTF spec) ---------------------------------------------
    ior = mf(M.MF_IOR)
    f0_scalar = ((ior - 1.0) / jnp.maximum(ior + 1.0, _EPS)) ** 2
    spec_color = mf(M.MF_SPECULAR_COLOR, 3)
    spec_w = mf(M.MF_SPECULAR)
    spec_tex = tex(M.TS_SPECULAR)
    spec_color_tex = tex(M.TS_SPECULAR_COLOR)
    spec_amt = spec_w * spec_tex[3]
    f0 = [jnp.minimum(f0_scalar * spec_color[c] * spec_color_tex[c], 1.0)
          * spec_amt * (1.0 - metallic) + base[c] * metallic
          for c in range(3)]

    # KHR_materials_iridescence: thin-film fresnel replaces F0, weighted by
    # the iridescence factor (brdf.wgsl iridescence path)
    if ext[EXT_IRIDESCENCE]:
        irid = mf(M.MF_IRIDESCENCE) * tex(M.TS_IRIDESCENCE)[0]
        irid_thick = (
            mf(M.MF_IRIDESCENCE_THICKNESS_MIN)
            + (mf(M.MF_IRIDESCENCE_THICKNESS_MAX)
               - mf(M.MF_IRIDESCENCE_THICKNESS_MIN))
            * tex(M.TS_IRIDESCENCE_THICKNESS)[1]
        )
        n_dot_v_pre = jnp.maximum(dot3(n_final, v), _EPS)
        f_irid = brdf.iridescent_fresnel_c(
            jnp.ones_like(irid), mf(M.MF_IRIDESCENCE_IOR), f0,
            irid_thick, n_dot_v_pre)
        f0 = v_lerp(f0, f_irid, irid)

    c_diff = v_scale(base[:3], 1.0 - metallic)

    if ext[EXT_TRANSMISSION]:
        transmission = mf(M.MF_TRANSMISSION) * tex(M.TS_TRANSMISSION)[0]
    else:
        transmission = jnp.zeros_like(metallic)
    if transparent_pass and ext[EXT_TRANSMISSION]:
        c_diff = v_scale(c_diff, 1.0 - transmission)

    # ---- punctual + IBL -------------------------------------------------------
    direct = _punctual_lights(ds, world_pos, n_final, v, c_diff, f0,
                              alpha_rough, light_tiles=light_tiles,
                              valid=~miss)

    n_dot_v = jnp.maximum(dot3(n_final, v), _EPS)

    # KHR_materials_anisotropy: bend the reflection lobe along the
    # tangent/bitangent (Filament-style bent-normal approximation for IBL;
    # reference brdf.wgsl anisotropic GGX)
    n_ibl = n_final
    if ext[EXT_ANISOTROPY]:
        aniso = mf(M.MF_ANISOTROPY_STRENGTH) * (
            2.0 * tex(M.TS_ANISOTROPY)[2] - 1.0
            if slot_mask[M.TS_ANISOTROPY] else 1.0)
        rot = mf(M.MF_ANISOTROPY_ROTATION)
        cr, sr = jnp.cos(rot), jnp.sin(rot)
        t_dir = [t_w[k] * cr + b_w[k] * sr for k in range(3)]
        b_dir = [-t_w[k] * sr + b_w[k] * cr for k in range(3)]
        a_dir = v_where(aniso >= 0, b_dir, t_dir)
        bent = norm3(cross3(cross3(a_dir, v), a_dir))
        mixw = jnp.clip(jnp.abs(aniso), 0.0, 1.0)
        n_ibl = norm3(v_lerp(n_final, bent, mixw))
    n_dot_v_ibl = jnp.maximum(dot3(n_ibl, v), _EPS)
    r = norm3([2.0 * n_dot_v_ibl * n_ibl[k] - v[k] for k in range(3)])

    # ---- screen-space refraction direction (KHR_materials_volume) ------------
    # Snell refraction of the view ray at the shaded normal, the exact math
    # of brdf.wgsl refract_direction (TIR → inactive); the exit-point
    # projection happens in the transmission block below, and the offscreen
    # IBL fallback tap rides the same batched env gather as every other
    # cubemap tap (fragment.wgsl sample_transmission_background).
    want_refr = (transparent_pass and want_transmission_factor
                 and ext[EXT_TRANSMISSION])
    if want_refr:
        thickness_r = mf(M.MF_THICKNESS)
        eta = 1.0 / jnp.where(ior > _EPS, ior, 1.0)
        cos_i = jnp.maximum(dot3(n_final, v), 0.0)   # = -dot(incident, n)
        sin_t2 = eta * eta * (1.0 - cos_i * cos_i)
        cos_t = jnp.sqrt(jnp.clip(1.0 - sin_t2, 0.0, 1.0))
        refr = [eta * (-v[k]) + (eta * cos_i - cos_t) * n_final[k]
                for k in range(3)]
        refr_ok = ((sin_t2 <= 1.0) & (jnp.abs(eta - 1.0) > 1e-3)
                   & (thickness_r > 0.0))
        refr_dir = v_where(refr_ok, norm3(refr), [-v[k] for k in range(3)])

    # sheen / clearcoat parameters first (material taps are already
    # batched), so every IBL cubemap tap can ride ONE gather below
    if ext[EXT_SHEEN]:
        sheen_f = mf(M.MF_SHEEN_COLOR, 3)
        sheen_tex = tex(M.TS_SHEEN_COLOR)
        sheen_color = [sheen_f[c] * sheen_tex[c] for c in range(3)]
        sheen_rough = jnp.clip(
            mf(M.MF_SHEEN_ROUGHNESS) * tex(M.TS_SHEEN_ROUGHNESS)[3], 0.04, 1.0)
    if ext[EXT_CLEARCOAT]:
        cc = mf(M.MF_CLEARCOAT) * tex(M.TS_CLEARCOAT)[0]
        cc_rough = jnp.clip(
            mf(M.MF_CLEARCOAT_ROUGHNESS) * tex(M.TS_CLEARCOAT_ROUGHNESS)[1], 0.04, 1.0)

    sky = None
    if solid_env:
        irr = [ds["irradiance"][0, c] for c in range(3)]
        pref_c = [ds["prefiltered"][0, 0, c] for c in range(3)]
        pref = pref_c
        sheen_pref = pref_c
        cc_pref = pref_c
        refr_pref = pref_c
    else:
        reqs = [(r, roughness)]
        if ext[EXT_SHEEN]:
            reqs.append((r, sheen_rough))
        if ext[EXT_CLEARCOAT]:
            reqs.append((r, cc_rough))
        if want_refr:
            reqs.append((refr_dir, roughness))
        # miss pixels reconstruct world_pos at the far plane, so -v is
        # exactly the per-pixel view ray: the skybox miss color rides the
        # same gather (want_sky gates it so transparent/HUD passes skip it)
        # env rows live INSIDE the texel pool when the flush appended them
        # (ds["env_pool_base"]): one promoted table for material + env
        # taps keeps both gathers at the promoted-memory floor
        # (sample_env_batch_c docstring; ARCHITECTURE.md gather economics)
        env_texq = ds["texels"] if "env_pool_base" in ds else None
        irr4, prefs, sky4 = sample_env_batch_c(
            ds["skybox"], ds["irradiance"], ds["prefiltered"], n_final, reqs,
            sky_dirs=[-c for c in v] if want_sky else None,
            texq=env_texq, env_base=ds.get("env_pool_base"))
        irr = irr4[:3]
        pref = prefs[0][:3]
        if ext[EXT_SHEEN]:
            sheen_pref = prefs[1][:3]
        if ext[EXT_CLEARCOAT]:
            cc_pref = prefs[2 if ext[EXT_SHEEN] else 1][:3]
        if want_refr:
            refr_pref = prefs[1 + ext[EXT_SHEEN] + ext[EXT_CLEARCOAT]][:3]
        if want_sky:
            sky = sky4[:3]

    lut_a, lut_b = env_brdf_approx(n_dot_v, roughness)
    fresnel_scale = [f0[c] * lut_a + lut_b for c in range(3)]
    ambient = [(irr[c] * c_diff[c] + pref[c] * fresnel_scale[c]) * occlusion
               for c in range(3)]

    # ---- sheen (KHR_materials_sheen) ------------------------------------------
    if ext[EXT_SHEEN]:
        sheen_scale = brdf.sheen_albedo_scaling_c(n_dot_v, sheen_color, sheen_rough)
        sheen_ibl = v_mul(sheen_pref, sheen_color)
    else:
        sheen_scale = 1.0
        sheen_ibl = [0.0, 0.0, 0.0]

    # ---- clearcoat (KHR_materials_clearcoat) -----------------------------------
    if ext[EXT_CLEARCOAT]:
        cc_a, cc_b = env_brdf_approx(n_dot_v, cc_rough)
        cc_amt = cc * (0.04 * cc_a + cc_b)
        cc_spec = [cc_pref[c] * cc_amt for c in range(3)]
        cc_fresnel = 0.04 + 0.96 * jnp.power(1.0 - n_dot_v, 5.0)
        cc_scale = 1.0 - cc * cc_fresnel
    else:
        cc_spec = [0.0, 0.0, 0.0]
        cc_scale = 1.0

    pbr_color = [
        ((direct[c] + ambient[c]) * sheen_scale + sheen_ibl[c]) * cc_scale
        + cc_spec[c] + emissive[c]
        for c in range(3)
    ]
    # lighting-isolation debug variants (reference:
    # material_opaque/shader/template.rs ShaderTemplateMaterialOpaqueDebug)
    if debug_mode == "ibl":
        pbr_color = ambient
    elif debug_mode == "punctual":
        pbr_color = direct
    elif debug_mode == "material" or debug_mode.startswith("channel:"):
        spec_vis = [spec_color[c] * spec_color_tex[c] * spec_amt
                    for c in range(3)]
        views = (
            base[:3],                                         # BaseColor
            [metallic, roughness, jnp.zeros_like(metallic)],  # Metal/Rough
            [n_final[c] * 0.5 + 0.5 for c in range(3)],       # Normals
            [occlusion] * 3,                                  # Occlusion
            emissive,                                         # Emissive
            spec_vis,                                         # Specular
        )
        if debug_mode == "material":
            # per-MATERIAL debug bitmask (reference materials/pbr.rs:54-79
            # + pbr_material_color.wgsl:30-51): replace the PBR output
            # with the selected channel; lowest set bit wins, mirroring
            # the reference's early-return chain (selects applied
            # high→low so bit 0 lands last)
            dbg = mflag(M.MI_DEBUG_MASK).astype(jnp.int32)
            for b in range(5, -1, -1):
                hit = ((dbg >> b) & 1) == 1
                pbr_color = v_where(hit, views[b], pbr_color)
        else:
            # GLOBAL channel isolation ("channel:<name>"): every surface
            # shows the named channel regardless of material bitmask —
            # the frontend sidebar's whole-scene material debug view
            pbr_color = views[DEBUG_CHANNELS[debug_mode.split(":", 1)[1]]]

    # ---- alpha per mode (OPAQUE=1, MASK=cutoff test, BLEND=base.a) ------------
    alpha_mode = mflag(M.MI_ALPHA_MODE)
    cutoff = mf(M.MF_ALPHA_CUTOFF)
    alpha = jnp.where(
        alpha_mode == 0.0, 1.0,
        jnp.where(alpha_mode == 1.0,
                  (base[3] >= cutoff).astype(jnp.float32), base[3]))

    # ---- editor grid (KIND_GRID: procedural world-space lines; parity with
    # editor/src/grid/shaders/grid.wgsl) ----------------------------------------
    if transparent_pass:
        spacing = jnp.maximum(mf(M.MF_GRID_SPACING), 1e-3)
        major_every = jnp.maximum(mf(M.MF_GRID_MAJOR_EVERY), 1.0)
        fade_dist = jnp.maximum(mf(M.MF_GRID_FADE_DISTANCE), 1e-3)
        cam_delta = [world_pos[k] - cam_pos[k] for k in range(3)]
        cam_dist = jnp.sqrt(dot3(cam_delta, cam_delta))
        aa = jnp.maximum(cam_dist * 2e-3, 1e-4)

        def line_alpha(p, s, wdt):
            d = jnp.abs(jnp.mod(p / s + 0.5, 1.0) - 0.5) * s
            return jnp.clip(1.0 - (d - wdt) / jnp.maximum(wdt, 1e-6), 0.0, 1.0)

        gx = world_pos[0]
        gz = world_pos[2]
        minor = jnp.maximum(line_alpha(gx, spacing, aa), line_alpha(gz, spacing, aa))
        major = jnp.maximum(line_alpha(gx, spacing * major_every, aa * 1.5),
                            line_alpha(gz, spacing * major_every, aa * 1.5))
        grid_a = jnp.maximum(minor * 0.5, major) * jnp.clip(1.0 - cam_dist / fade_dist, 0.0, 1.0)
        alpha = jnp.where(is_grid, grid_a * base[3], alpha)

    # ---- transmission of the background (transparent pass only) ---------------
    trans_factor = None
    refr_info = None
    if transparent_pass and (background is not None or want_transmission_factor):
        att_dist = mf(M.MF_ATTENUATION_DISTANCE)
        att_color = mf(M.MF_ATTENUATION_COLOR, 3)
        thickness = mf(M.MF_THICKNESS)
        has_att = att_dist > 0.0
        inv_att = thickness / jnp.maximum(att_dist, 1e-4)
        att = [jnp.where(has_att,
                         jnp.exp(jnp.log(jnp.maximum(att_color[c], 1e-4)) * inv_att),
                         1.0) for c in range(3)]
        # transmission only applies to the PBR branch; zero it elsewhere so
        # the deferred compositor can apply it unconditionally
        t_gate = jnp.where(is_unlit | is_grid, 0.0, transmission)
        trans_factor = [base[c] * att[c] * (1.0 - fresnel_scale[c]) * t_gate
                        for c in range(3)]
        if background is not None and not want_transmission_factor:
            pbr_color = [pbr_color[c] + background[c] * trans_factor[c]
                         for c in range(3)]

        # ---- refracted exit-point projection (fragment.wgsl:50-66): march
        # `thickness` along the refracted ray, project through view_proj,
        # and hand the compositor a per-pixel background index into the
        # band-local opaque image + the offscreen IBL fallback color -------
        if want_refr:
            H_band = H // n_layer_tiles
            vp = ds["camera"]["view_proj"]
            ex = [world_pos[k] + refr_dir[k] * thickness for k in range(3)]
            cxw = ex[0] * vp[0, 0] + ex[1] * vp[0, 1] + ex[2] * vp[0, 2] + vp[0, 3]
            cyw = ex[0] * vp[1, 0] + ex[1] * vp[1, 1] + ex[2] * vp[1, 2] + vp[1, 3]
            cw = ex[0] * vp[3, 0] + ex[1] * vp[3, 1] + ex[2] * vp[3, 2] + vp[3, 3]
            inv_cw = 1.0 / jnp.where(jnp.abs(cw) > _EPS, cw, _EPS)
            gx = (cxw * inv_cw + 1.0) * 0.5 * W - 0.5      # global pixel x
            gy = (1.0 - cyw * inv_cw) * 0.5 * H_full - 0.5  # global pixel y
            ly = gy - row_offset                            # band-local y
            on_screen = ((cw > 0.0) & (gx >= 0.0) & (gx <= W - 1.0)
                         & (gy >= 0.0) & (gy <= H_full - 1.0)
                         & (ly >= 0.0) & (ly <= H_band - 1.0))
            own_idx = (jnp.arange(P, dtype=jnp.int32)
                       % jnp.int32(H_band * W))             # same-pixel default
            do_refr = refr_ok & (t_gate > 0.0)
            refr_idx = jnp.where(
                do_refr & on_screen,
                jnp.round(ly).astype(jnp.int32) * W
                + jnp.round(gx).astype(jnp.int32),
                own_idx)
            refr_info = (refr_idx, do_refr & ~on_screen, refr_pref)

    color = v_where(is_unlit, base[:3], pbr_color)
    if transparent_pass:
        color = v_where(is_grid, base[:3], color)
    valid = ~miss
    if want_transmission_factor:
        return color, alpha, valid, n_final, trans_factor, refr_info
    if want_sky:
        return color, alpha, valid, n_final, sky
    return color, alpha, valid, n_final


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "height_full", "width_full",
                     "use_mips", "slot_mask", "solid_env", "has_nearest",
                     "ext", "debug_mode", "light_tiles"),
)
def shade_deferred_c(
    vis, ds,
    *,
    width: int,
    height: int,
    height_full: int | None = None,
    row_offset=0,
    width_full: int | None = None,
    col_offset=0,
    use_mips: bool = True,
    slot_mask: Tuple[bool, ...] = ALL_SLOTS,
    solid_env: bool = False,
    has_nearest: bool = True,
    ext: Tuple[bool, ...] = ALL_EXT,
    debug_mode: str = "none",   # none | normals | ibl | punctual
    setup_rows=None,
    light_tiles: bool = False,
):
    """Deferred opaque shading → HDR linear [r, g, b, a] channel planes
    (P,). The frame pipeline keeps HDR as channel planes end-to-end —
    every (H,W,4) stack/re-slice round-trip costs a multi-ms relayout
    (ops/cvec.py / ops/relayout.py notes)."""
    H, W = height, width
    H_full = height_full if height_full is not None else height
    P = H * W
    planes = {k: v.reshape(P) for k, v in vis.items()}

    color, _alpha, valid, n_final, sky = shade_surface(
        planes, ds,
        width=W, height=H, height_full=H_full, row_offset=row_offset,
        width_full=width_full, col_offset=col_offset,
        use_mips=use_mips, slot_mask=slot_mask, solid_env=solid_env,
        has_nearest=has_nearest, ext=ext,
        debug_mode=(debug_mode
                    if debug_mode in ("ibl", "punctual", "material")
                    or debug_mode.startswith("channel:")
                    else "none"),
        setup_rows=setup_rows, want_sky=True, light_tiles=light_tiles,
    )

    if sky is None:   # solid environment: a broadcast constant
        sky = [jnp.broadcast_to(ds["skybox"][0, c], (P,)) for c in range(3)]
    if debug_mode == "normals":
        color = [n_final[c] * 0.5 + 0.5 for c in range(3)]
    out = [jnp.where(valid, color[c], sky[c]) for c in range(3)]
    alpha = valid.astype(jnp.float32)
    return out + [alpha]


def shade_deferred(vis, ds, *, width: int, height: int, **kw):
    """AoS-compat wrapper: HDR linear (height, width, 4) f32."""
    ch = shade_deferred_c(vis, ds, width=width, height=height, **kw)
    return jnp.stack(ch, axis=-1).reshape(height, width, 4)


def _tile_swizzle(p: jnp.ndarray, H: int, W: int, th: int = 8) -> jnp.ndarray:
    """(..., H*W) row-major plane → (..., n_units, th*128) of (th, 128)
    units.

    th=8 is the native f32 memory tile, so that transpose is a cheap
    tile relabeling for XLA (the raster kernels use the same blocking);
    th=1 degenerates to a plain reshape (strip granularity — no
    transpose at all)."""
    lead = p.shape[:-1]
    if th == 1:
        return p.reshape(*lead, H * (W // 128), 128)
    t = p.reshape(*lead, H // th, th, W // 128, 128)
    t = jnp.swapaxes(t, -3, -2)
    return t.reshape(*lead, (H // th) * (W // 128), th * 128)


def _tile_unswizzle(t: jnp.ndarray, H: int, W: int, th: int = 8) -> jnp.ndarray:
    """(n_units, th*128) of (th, 128) units → (H*W,) row-major plane."""
    if th == 1:
        return t.reshape(H * W)
    return (t.reshape(H // th, W // 128, th, 128)
            .swapaxes(1, 2).reshape(H * W))


def shade_units_c(
    tid_c, dep_c, idx, setup_rows, ds, *,
    width: int, height_full: int, row_offset,
    resolve_row_offset, coord_scale: int, th: int,
    use_mips: bool, slot_mask, solid_env: bool, has_nearest: bool,
    ext, debug_mode: str, interpret: bool = False,
    light_tiles: bool = False,
):
    """Shade an explicit set of C compacted (th, 128) units.

    The core of the covered-tile compaction (shade_deferred_compact_c)
    with the unit CHOICE externalized: `idx` (C,) i32 names the units in
    the band's (H//th, W//128) grid, `tid_c`/`dep_c` are their gathered
    (C*U,) tri-id/depth planes. The temporal path (ops/temporal.py,
    passes/frame.py render_frame_temporal) picks its units by history
    INVALIDITY + refresh age instead of coverage; both callers share
    this resolve + shade + sky machinery. Returns
    ([r, g, b] compact planes, valid) — miss pixels carry the sky."""
    W = width
    C = idx.shape[0]
    U = th * 128
    ntx = W // 128
    tx = (idx % ntx).astype(jnp.float32)
    ty = (idx // ntx).astype(jnp.float32)
    q = jnp.arange(U, dtype=jnp.float32)
    gx = tx[:, None] * 128.0 + (q % 128)[None, :]        # (C, U) display
    gy = ty[:, None] * float(th) + (q // 128)[None, :]
    # raster-space eval coords: what the non-compact resolve derives from
    # the flat index (px = x*coord_scale + 0.5 at the supersample center)
    px = (gx * coord_scale + 0.5).reshape(C * U)
    py = ((gy + jnp.float32(resolve_row_offset))
          * coord_scale + 0.5).reshape(C * U)
    vis = resolve_planes_fused(tid_c, setup_rows, width=W,
                               height_full=height_full,
                               px=px, py=py, interpret=interpret)
    planes = {k: vis[k] for k in RESOLVE_NAMES}
    planes["depth"] = dep_c
    planes["ndc_x"] = ((gx + 0.5) / W * 2.0 - 1.0).reshape(C * U)
    planes["ndc_y"] = (1.0 - (gy + jnp.float32(row_offset) + 0.5)
                       / height_full * 2.0).reshape(C * U)

    color, _alpha, valid, n_final, sky = shade_surface(
        planes, ds,
        width=128, height=C * th, height_full=height_full, row_offset=0,
        use_mips=use_mips, slot_mask=slot_mask, solid_env=solid_env,
        has_nearest=has_nearest, ext=ext,
        debug_mode=(debug_mode
                    if debug_mode in ("ibl", "punctual", "material")
                    or debug_mode.startswith("channel:")
                    else "none"),
        want_sky=True, light_tiles=light_tiles,
    )
    if debug_mode == "normals":
        color = [n_final[c] * 0.5 + 0.5 for c in range(3)]
    if solid_env:
        assert sky is None
        sky = [jnp.broadcast_to(ds["skybox"][0, c], valid.shape)
               for c in range(4)]
    out_c = [jnp.where(valid, color[c], sky[c]) for c in range(3)]
    return out_c, valid


def shade_deferred_compact_c(
    tid_flat, setup_rows, depth_flat, ds, *,
    width: int, height: int, height_full: int, row_offset,
    resolve_row_offset, coord_scale: int,
    use_mips: bool, slot_mask, solid_env: bool, has_nearest: bool,
    ext, debug_mode: str, tile_cap: int, interpret: bool = False,
    tile_rows: int = 8, light_tiles: bool = False,
):
    """Covered-tile-compacted deferred opaque shade (slim/MSAA path).

    Opaque geometry typically covers 50-70% of a frame's 8x128 tiles —
    the rest is sky, yet the band-wide deferred shade pays the resolve
    gather + full PBR ALU + texture taps for every sky pixel just to
    discard it at the miss select. With a host AABB-derived upper bound
    on covered tiles (renderer._bucket_tile_cap), the slim tri_id plane
    compacts to the covered tiles (coverage-first argsort, the
    _shade_transparent_compact pattern), the fused resolve evaluates
    plane equations at explicit px/py coords, shading runs in compact
    space with NDC coords riding as planes, and the shaded colors
    scatter into the sky background. Bit-equivalent to shade_deferred_c
    whenever the cap covers every live tile (tests/test_opaque_compact.py
    asserts it). Solid env: skipped tiles fill with the face-0 constant.
    Image env (requires ds["env_pool_base"], renderer._flush): covered
    tiles take the per-pixel sky that rides the batched env gather
    (want_sky), and the skipped tiles pay ONE skybox-only gather of
    O(sky pixels) rows into the same texel-pool table
    (cubemap.sample_skybox_pool_c) — total gather work stays O(covered
    material taps + sky pixels), the compaction's point.

    tile_rows (th): compaction-unit height — (th, 128) units. th=8 is
    the native tile AND the production choice. The r4 granularity
    experiment measured th=1 a LOSS (34.6 vs 31.0 ms at 1080p): strip
    coverage is 61.3% vs tile coverage 62.4% (sky gaps are sub-128px
    wide, so row granularity buys ~1%), while the finer units add a
    16k-key argsort + 16k-row take/scatter and replace the free
    8-sublane tile relabeling with real data movement. Kept as a
    parameter because the equality tests pin both granularities and
    other scenes (letterboxed / top-heavy coverage) may differ."""
    H, W = height, width
    th = tile_rows
    U = th * 128
    n_tiles = (H // th) * (W // 128)
    C = min(tile_cap, n_tiles)
    sw_tid = _tile_swizzle(tid_flat, H, W, th)           # (n_units, U)
    cov = jnp.any(sw_tid >= 0, axis=-1)
    order = jnp.argsort(~cov)                            # covered-first
    idx = order[:C]
    tid_c = jnp.take(sw_tid, idx, axis=0).reshape(C * U)
    dep_c = jnp.take(_tile_swizzle(depth_flat, H, W, th), idx,
                     axis=0).reshape(C * U)
    out_c, valid = shade_units_c(
        tid_c, dep_c, idx, setup_rows, ds,
        width=W, height_full=height_full, row_offset=row_offset,
        resolve_row_offset=resolve_row_offset, coord_scale=coord_scale,
        th=th, use_mips=use_mips, slot_mask=slot_mask, solid_env=solid_env,
        has_nearest=has_nearest, ext=ext, debug_mode=debug_mode,
        interpret=interpret, light_tiles=light_tiles,
    )

    ntx = W // 128
    R = n_tiles - C
    if solid_env or R == 0:
        rest_sky = None
    else:
        # per-pixel skybox for the skipped tiles: view rays through the
        # far plane (exactly what shade_surface's miss path reconstructs)
        idx_rest = order[C:]
        gxr = ((idx_rest % ntx).astype(jnp.float32)[:, None] * 128.0
               + (jnp.arange(U, dtype=jnp.float32) % 128)[None, :])
        gyr = ((idx_rest // ntx).astype(jnp.float32)[:, None] * float(th)
               + (jnp.arange(U, dtype=jnp.float32) // 128)[None, :])
        nx = ((gxr + 0.5) / W * 2.0 - 1.0).reshape(R * U)
        ny = (1.0 - (gyr + jnp.float32(row_offset) + 0.5)
              / height_full * 2.0).reshape(R * U)
        ivp = ds["camera"]["inv_view_proj"]
        wp = [nx * ivp[j, 0] + ny * ivp[j, 1] + ivp[j, 2] + ivp[j, 3]
              for j in range(4)]
        iw = 1.0 / jnp.where(jnp.abs(wp[3]) > _EPS, wp[3], _EPS)
        cam = ds["camera"]["position"]
        d3 = tuple(wp[k] * iw - cam[k] for k in range(3))
        from .cubemap import sample_skybox_pool_c

        rest_sky = sample_skybox_pool_c(
            ds["texels"], ds["env_pool_base"], ds["skybox"].shape[0], d3)

    out_full = []
    for c in range(3):
        full = jnp.broadcast_to(
            ds["skybox"][0, c] if solid_env else jnp.float32(0.0),
            (n_tiles, U))
        scat = full.at[idx].set(out_c[c].reshape(C, U))
        if rest_sky is not None:
            scat = scat.at[idx_rest].set(rest_sky[c].reshape(R, U))
        out_full.append(_tile_unswizzle(scat, H, W, th))
    a_scat = jnp.zeros((n_tiles, U), jnp.float32).at[idx].set(
        valid.astype(jnp.float32).reshape(C, U))
    return out_full + [_tile_unswizzle(a_scat, H, W, th)]


def _shade_transparent_compact(
    layers, opaque_ch, ds, *, width: int, height: int, height_full: int,
    row_offset, use_mips: bool, slot_mask, solid_env: bool,
    has_nearest: bool, ext, n_layers: int, tile_cap: int,
    light_tiles: bool = False,
):
    """Covered-tile-compacted K-layer transparent shade + composite.

    See shade_transparent_layers_c(tile_cap=...). Bit-equivalent to the
    band-wide path whenever tile_cap covers every tile layer 0 touches
    (tests/test_transparent_compact.py asserts it)."""
    assert not ext[EXT_VOLUME], "refraction needs band-space planes"
    H, W, K = height, width, n_layers
    P = H * W
    n_tiles = (H // 8) * (W // 128)
    C = min(tile_cap, n_tiles)

    # exact uv gradients in band space (the same min-magnitude math
    # shade_surface runs internally; never crosses a layer boundary) —
    # unless the raster already emitted analytic derivative planes
    grads = {}
    if "du0_dx" not in layers:
        grads = {
            "du0_dx": _screen_gradient(layers["uv0_u"].reshape(-1), W,
                                       K * H, False, K),
            "dv0_dx": _screen_gradient(layers["uv0_v"].reshape(-1), W,
                                       K * H, False, K),
            "du0_dy": _screen_gradient(layers["uv0_u"].reshape(-1), W,
                                       K * H, True, K),
            "dv0_dy": _screen_gradient(layers["uv0_v"].reshape(-1), W,
                                       K * H, True, K),
        }
    sw = {k: _tile_swizzle(v, H, W) for k, v in layers.items()}
    sw.update({k: _tile_swizzle(v.reshape(K, P), H, W)
               for k, v in grads.items()})
    # depth peeling makes layer-k coverage a subset of layer-0 coverage,
    # so one tile set serves every layer
    cov = jnp.any(sw["tri_id"][0] >= 0, axis=-1)          # (n_tiles,)
    idx = jnp.argsort(~cov)[:C]                           # covered-first
    comp = {k: jnp.take(v, idx, axis=1) for k, v in sw.items()}

    # pixel NDC coords for the compacted pixels (shade_surface ndc_x path)
    ntx = W // 128
    tx = (idx % ntx).astype(jnp.float32)
    ty = (idx // ntx).astype(jnp.float32)
    q = jnp.arange(1024, dtype=jnp.float32)
    gx = tx[:, None] * 128.0 + (q % 128)[None, :]         # (C, 1024)
    gy = ty[:, None] * 8.0 + (q // 128)[None, :] + jnp.float32(row_offset)
    ndc_x = ((gx + 0.5) / W * 2.0 - 1.0).reshape(C * 1024)
    ndc_y = (1.0 - (gy + 0.5) / height_full * 2.0).reshape(C * 1024)

    ob = [jnp.take(_tile_swizzle(opaque_ch[c], H, W), idx, axis=0)
          .reshape(C * 1024) for c in range(3)]           # compact background

    Pc = C * 1024

    def shade_group(k0, Kg, out_rgb):
        flat = {k: v[k0:k0 + Kg].reshape(Kg * Pc) for k, v in comp.items()}
        flat["ndc_x"] = jnp.broadcast_to(ndc_x, (Kg, Pc)).reshape(Kg * Pc)
        flat["ndc_y"] = jnp.broadcast_to(ndc_y, (Kg, Pc)).reshape(Kg * Pc)
        color, alpha, valid, _n, trans, _refr = shade_surface(
            flat, ds, width=128, height=Kg * C * 8, height_full=height_full,
            row_offset=0, use_mips=use_mips, slot_mask=slot_mask,
            solid_env=solid_env, has_nearest=has_nearest, ext=ext,
            transparent_pass=True, want_transmission_factor=True,
            light_tiles=light_tiles,
        )
        color = [c.reshape(Kg, Pc) for c in color]
        a = jnp.where(valid, alpha, 0.0).reshape(Kg, Pc)
        trans = None if trans is None else [t.reshape(Kg, Pc) for t in trans]
        out_rgb = list(out_rgb)
        for k in range(Kg - 1, -1, -1):
            for c in range(3):
                cc = (color[c][k] if trans is None
                      else color[c][k] + ob[c] * trans[c][k])
                out_rgb[c] = cc * a[k] + out_rgb[c] * (1.0 - a[k])
        return out_rgb

    out = list(ob)
    if K > 2:
        has_deep = jnp.max(comp["tri_id"][2:]) >= 0
        out = jax.lax.cond(has_deep, lambda o: shade_group(2, K - 2, o),
                           lambda o: list(o), out)
        out = shade_group(0, 2, out)
    else:
        out = shade_group(0, K, out)

    out_full = []
    for c in range(3):
        full = _tile_swizzle(opaque_ch[c], H, W)
        scat = full.at[idx].set(out[c].reshape(C, 1024))
        out_full.append(_tile_unswizzle(scat, H, W))
    return out_full + [opaque_ch[3]]


def shade_transparent_compact32(
    layers,            # dict of (K, C*1024) compacted 32x32-block planes
    tile_idx,          # (C,) i32 logical 32x32 tile ids (band grid)
    opaque_ch,         # [r, g, b, a] (P,) shaded opaque band planes
    ds,
    *,
    width: int, height: int, height_full: int,
    row_offset, n_tx: int,
    use_mips: bool = True,
    slot_mask: Tuple[bool, ...] = ALL_SLOTS,
    solid_env: bool = False,
    has_nearest: bool = True,
    ext: Tuple[bool, ...] = ALL_EXT,
    n_layers: int = 4,
    light_tiles: bool = False,
):
    """Shade + composite K transparent peels that were RASTERIZED in
    covered-tile-compacted space (ops/raster.py rasterize_layers_compact).

    The peel kernels only ever sweep the 32x32 band tiles transparent
    geometry bins into, and their planes arrive here already compacted
    (block i = logical tile tile_idx[i], 32x32 row-major within a block)
    with analytic uv-derivative planes riding along — so unlike
    _shade_transparent_compact there is no band-wide plane
    materialization, no swizzle, and no coverage argsort on this side:
    only the opaque background compacts (a (C,) take) and only the
    composited rgb scatters back. Same shading math as the band path
    (NDC coords ride as planes), asserted bit-equivalent in
    tests/test_transparent_compact.py. Reference behavior: the forward
    transparent pass simply has no fragments outside its draws
    (render.rs transparent pass), so pixels there keep the opaque result.
    """
    assert not ext[EXT_VOLUME], "refraction needs band-space planes"
    assert "du0_dx" in layers, "compact peel planes carry analytic derivs"
    H, W, K = height, width, n_layers
    C = int(tile_idx.shape[0])
    Pc = C * 1024
    H32 = -(-H // 32) * 32
    n_tiles = (H32 // 32) * (W // 32)
    assert W % 32 == 0 and n_tx == W // 32

    comp = {k: v.reshape(K, C, 1024) for k, v in layers.items()}

    # pixel NDC coords for the compacted pixels (shade_surface ndc_x path)
    tx = (tile_idx % n_tx).astype(jnp.float32)
    ty = (tile_idx // n_tx).astype(jnp.float32)
    q = jnp.arange(1024, dtype=jnp.float32)
    gx = tx[:, None] * 32.0 + (q % 32)[None, :]           # (C, 1024)
    gy = (ty[:, None] * 32.0 + (q // 32)[None, :]
          + jnp.float32(row_offset))
    ndc_x = ((gx + 0.5) / W * 2.0 - 1.0).reshape(Pc)
    ndc_y = (1.0 - (gy + 0.5) / height_full * 2.0).reshape(Pc)

    def sw32(p):
        img = jnp.pad(p.reshape(H, W), ((0, H32 - H), (0, 0)))
        return (img.reshape(H32 // 32, 32, W // 32, 32)
                .swapaxes(1, 2).reshape(n_tiles, 1024))

    ob_full = [sw32(opaque_ch[c]) for c in range(3)]
    ob = [jnp.take(f, tile_idx, axis=0).reshape(Pc) for f in ob_full]

    def shade_group(k0, Kg, out_rgb):
        flat = {k: v[k0:k0 + Kg].reshape(Kg * Pc) for k, v in comp.items()}
        flat["ndc_x"] = jnp.broadcast_to(ndc_x, (Kg, Pc)).reshape(Kg * Pc)
        flat["ndc_y"] = jnp.broadcast_to(ndc_y, (Kg, Pc)).reshape(Kg * Pc)
        color, alpha, valid, _n, trans, _refr = shade_surface(
            flat, ds, width=128, height=Kg * C * 8, height_full=height_full,
            row_offset=0, use_mips=use_mips, slot_mask=slot_mask,
            solid_env=solid_env, has_nearest=has_nearest, ext=ext,
            transparent_pass=True, want_transmission_factor=True,
            light_tiles=light_tiles,
        )
        color = [c.reshape(Kg, Pc) for c in color]
        a = jnp.where(valid, alpha, 0.0).reshape(Kg, Pc)
        trans = None if trans is None else [t.reshape(Kg, Pc) for t in trans]
        out_rgb = list(out_rgb)
        for k in range(Kg - 1, -1, -1):
            for c in range(3):
                cc = (color[c][k] if trans is None
                      else color[c][k] + ob[c] * trans[c][k])
                out_rgb[c] = cc * a[k] + out_rgb[c] * (1.0 - a[k])
        return out_rgb

    out = list(ob)
    if K > 2:
        has_deep = jnp.max(comp["tri_id"][2:]) >= 0
        out = jax.lax.cond(has_deep, lambda o: shade_group(2, K - 2, o),
                           lambda o: list(o), out)
        out = shade_group(0, 2, out)
    else:
        out = shade_group(0, K, out)

    out_full = []
    for c in range(3):
        scat = ob_full[c].at[tile_idx].set(out[c].reshape(C, 1024))
        img = (scat.reshape(H32 // 32, W // 32, 32, 32)
               .swapaxes(1, 2).reshape(H32, W))[:H]
        out_full.append(img.reshape(H * W))
    return out_full + [opaque_ch[3]]


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "height_full", "use_mips",
                     "slot_mask", "solid_env", "has_nearest", "ext",
                     "n_layers", "tile_cap", "light_tiles"),
)
def shade_transparent_layers_c(
    layers,            # dict of (K, P) plane arrays from rasterize_layers
    opaque_ch,         # [r, g, b, a] (P,) shaded opaque channel planes
    ds,
    *,
    width: int, height: int,
    height_full: int | None = None,
    row_offset=0,
    width_full: int | None = None,
    col_offset=0,
    use_mips: bool = True,
    slot_mask: Tuple[bool, ...] = ALL_SLOTS,
    solid_env: bool = False,
    has_nearest: bool = True,
    ext: Tuple[bool, ...] = ALL_EXT,
    n_layers: int = 4,
    setup_rows=None,
    tile_cap: Optional[int] = None,
    light_tiles: bool = False,
):
    """Forward-shade K depth-peeled transparent layers and composite
    back-to-front over the opaque result (reference: render.rs transparent
    pass + blend state).

    Layers shade in BATCHED calls on stacked (Kg*P,) planes — so a group
    pays ONE texture-tap gather and ONE environment gather instead of one
    of each per layer (a second gather in the same XLA computation costs
    ~25-45 ms at 1080p; the old per-layer lax.scan measured ~91 ms/layer).
    The back-to-front KHR transmission dependency (each layer tints what's
    behind it) survives because shading returns a per-layer transmission
    *factor* and the composite is a cheap sequential ALU loop.

    Layers beyond the first two shade under a runtime lax.cond on actual
    coverage: typical scenes have <= 2 overlapping transparent surfaces
    per pixel, so peels 2..K-1 are empty and their full-PBR band shade
    (~5 ms at 1080p/K=4, profiled) is skipped at runtime — the analog of
    the reference's forward pass simply having no fragments there. Deep
    scenes pay the second group's gathers only when peel 2 is non-empty.

    tile_cap (static): covered-tile compaction. Transparent geometry
    typically covers a small fraction of the (already row-cropped) band —
    the reference's forward pass simply has no fragments elsewhere, but a
    band-wide batched shade pays full-band ALU + taps for every peel.
    With a host-derived upper bound on covered 8x128 tiles (projected
    AABB rects, renderer._bucket_tile_cap), the planes compact to the
    covered tiles (coverage-first stable argsort over layer-0 tri_id),
    shade + composite run in compact space with NDC coords and exact
    pre-computed uv gradients riding as planes, and only the composited
    rgb scatters back. Requires fat planes and no KHR_materials_volume
    (screen-space refraction gathers the opaque buffer at arbitrary
    pixels — callers gate on ext)."""
    H, W = height, width
    H_full = height_full if height_full is not None else height
    P = H * W
    K = n_layers

    if (tile_cap is not None and H % 8 == 0 and W % 128 == 0
            and tile_cap * 1024 < P and "uv0_u" in layers):
        return _shade_transparent_compact(
            layers, opaque_ch, ds, width=W, height=H, height_full=H_full,
            row_offset=row_offset, use_mips=use_mips, slot_mask=slot_mask,
            solid_env=solid_env, has_nearest=has_nearest, ext=ext,
            n_layers=K, tile_cap=tile_cap, light_tiles=light_tiles)

    def shade_group(sub, Kg, out_rgb):
        """Shade Kg stacked layers and composite back-to-front onto
        out_rgb (3 (P,) planes)."""
        flat = {k: v.reshape(Kg * P) for k, v in sub.items()}
        color, alpha, valid, _n, trans, refr = shade_surface(
            flat, ds,
            width=W, height=Kg * H, height_full=H_full,
            row_offset=row_offset,
            width_full=width_full, col_offset=col_offset,
            use_mips=use_mips, slot_mask=slot_mask, solid_env=solid_env,
            has_nearest=has_nearest, ext=ext,
            transparent_pass=True, want_transmission_factor=True,
            setup_rows=setup_rows, n_layer_tiles=Kg,
            light_tiles=light_tiles,
        )
        color = [c.reshape(Kg, P) for c in color]
        a = jnp.where(valid, alpha, 0.0).reshape(Kg, P)
        trans = None if trans is None else [t.reshape(Kg, P) for t in trans]

        # the background transmission sees is the PRE-transparent opaque
        # buffer (the reference samples opaque_tex, never the running
        # blend target — fragment.wgsl sample_transmission_background), at
        # the refracted pixel when KHR_materials_volume is active
        if trans is not None:
            if ext[EXT_VOLUME] and refr is not None:
                from .relayout import split_channels

                idx, use_fb, fb = refr
                bg4 = jnp.stack(list(opaque_ch), axis=-1)    # (P, 4)
                got = split_channels(bg4[idx])               # 4 (Kg*P,)
                bg = [jnp.where(use_fb, fb[c], got[c]).reshape(Kg, P)
                      for c in range(3)]
            else:
                bg = [jnp.broadcast_to(opaque_ch[c], (Kg, P))
                      for c in range(3)]

        # back-to-front: the last layer of the group is the farthest peel
        out_rgb = list(out_rgb)
        for k in range(Kg - 1, -1, -1):
            for c in range(3):
                cc = (color[c][k] if trans is None
                      else color[c][k] + bg[c][k] * trans[c][k])
                out_rgb[c] = cc * a[k] + out_rgb[c] * (1.0 - a[k])
        return out_rgb

    out = list(opaque_ch[:3])
    if K > 2:
        deep = {k: v[2:] for k, v in layers.items()}
        has_deep = jnp.max(layers["tri_id"][2:]) >= 0
        out = jax.lax.cond(
            has_deep,
            lambda o: shade_group(deep, K - 2, o),
            lambda o: list(o), out)
        front = {k: v[:2] for k, v in layers.items()}
        out = shade_group(front, 2, out)
    else:
        out = shade_group(layers, K, out)

    return out + [opaque_ch[3]]


def shade_transparent_layers(layers, opaque_hdr, ds, *, width: int,
                             height: int, **kw):
    """AoS-compat wrapper: (H, W, 4) in and out."""
    P = width * height
    flat = opaque_hdr.reshape(P, 4)
    ch = shade_transparent_layers_c(
        layers, [flat[:, c] for c in range(4)], ds,
        width=width, height=height, **kw)
    return jnp.stack(ch, axis=-1).reshape(height, width, 4)
