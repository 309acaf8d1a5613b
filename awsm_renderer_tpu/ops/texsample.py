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
    TD_MAX_ANISO,
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


def _level_idx(desc, u, v, level):
    """Footprint math for one mip level: texel-row indices + weights.

    u, v: (P,) uv channels. Returns (idx (P,), fx (P,), fy (P,), x0i,
    y0i, wm, hm). The actual texel fetch is deferred so a whole pass's
    taps can ride ONE gather — XLA's TPU lowering runs a lone 2M-row
    gather ~30x faster than two gathers fused into the same computation
    (measured: 1 gather of 4M concatenated rows ≈ 2 ms; 2 separate 2M
    gathers in one jit ≈ 45-67 ms), so batching indices and splitting
    the result is the difference between HBM-speed sampling and
    latency-bound sampling."""
    w0 = desc[TD_WIDTH]
    h0 = desc[TD_HEIGHT]
    wm = jnp.maximum(w0 >> level, 1)
    hm = jnp.maximum(h0 >> level, 1)
    lv = jnp.clip(level, 0, MAX_MIPS - 1)
    # select the mip offset with a one-hot sum (row-wise dynamic column
    # extraction lowers to a slow gather otherwise)
    offset = sum(
        jnp.where(lv == m, desc[TD_MIP_OFFSETS + m], 0) for m in range(MAX_MIPS)
    )
    wrap_s = desc[TD_WRAP_S]
    wrap_t = desc[TD_WRAP_T]

    wf = wm.astype(jnp.float32)
    hf = hm.astype(jnp.float32)
    x = _prep_coord(u, wf, wrap_s)
    y = _prep_coord(v, hf, wrap_t)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = _wrap_coord(x0.astype(jnp.int32), wm, wrap_s)
    y0i = _wrap_coord(y0.astype(jnp.int32), hm, wrap_t)
    idx = offset + y0i * wm + x0i
    return idx, fx, fy, x0i, y0i, wm, hm


def _quad_weights(fx, fy, linear, has_nearest: bool):
    """Bilinear corner weights, with NEAREST filtering folded in as 0/1
    weights (fx>=0.5 picks the right column exactly — 0/1 products are
    exact, so this equals a select)."""
    if has_nearest:
        fx = jnp.where(linear, fx, (fx >= 0.5).astype(jnp.float32))
        fy = jnp.where(linear, fy, (fy >= 0.5).astype(jnp.float32))
    return (1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy


def _axis_weights(f, d1, linear, has_nearest: bool):
    """3-tap stencil weights along one parent-block axis.

    d1: (P,) bool — the parent bilinear anchor sits one cell right/down of
    the baked base. Bilinear weights [1-f, f, 0] or [0, 1-f, f]; NEAREST
    folds in by snapping f to 0/1."""
    if has_nearest:
        f = jnp.where(linear, f, (f >= 0.5).astype(jnp.float32))
    z = jnp.zeros_like(f)
    w0 = jnp.where(d1, z, 1.0 - f)
    w1 = jnp.where(d1, 1.0 - f, f)
    w2 = jnp.where(d1, f, z)
    return w0, w1, w2


def _tap_weights(desc, u, v, plan, frac, has_nearest: bool):
    """Per-pixel filter-weight planes for one tap: [w00, w10, w01, w11,
    wx0, wx1, wx2, wy0, wy1, wy2, blend] — bilinear quad weights, the
    parent-mip 3x3 stencil weights, and the trilinear blend fraction.
    frac=None (no mips) → parent weights and blend are zero."""
    fx, fy, x0i, y0i, wm, hm = plan
    linear = desc[TD_FILTER_LINEAR] > 0
    w00, w10, w01, w11 = _quad_weights(fx, fy, linear, has_nearest)
    z = jnp.zeros_like(fx)
    if frac is None:
        return [w00, w10, w01, w11, z, z, z, z, z, z, z]

    # parent-mip 3x3 stencil (layout: core/textures.py::_pack_rows). The
    # parent's own bilinear anchor is recomputed from uv and located
    # inside the baked 3x3 by its wrapped offset from base=((x0-1)>>1).
    w1 = jnp.maximum(wm >> 1, 1)
    h1 = jnp.maximum(hm >> 1, 1)
    wrap_s = desc[TD_WRAP_S]
    wrap_t = desc[TD_WRAP_T]
    x = _prep_coord(u, w1.astype(jnp.float32), wrap_s)
    y = _prep_coord(v, h1.astype(jnp.float32), wrap_t)
    ax = jnp.floor(x)
    ay = jnp.floor(y)
    fx1 = x - ax
    fy1 = y - ay
    axw = _wrap_coord(ax.astype(jnp.int32), w1, wrap_s)
    ayw = _wrap_coord(ay.astype(jnp.int32), h1, wrap_t)
    bx = _wrap_coord((x0i - 1) >> 1, w1, wrap_s)
    by = _wrap_coord((y0i - 1) >> 1, h1, wrap_t)
    dx1 = jnp.clip(jnp.remainder(axw - bx, w1), 0, 1) == 1
    dy1 = jnp.clip(jnp.remainder(ayw - by, h1), 0, 1) == 1
    wx = _axis_weights(fx1, dx1, linear, has_nearest)
    wy = _axis_weights(fy1, dy1, linear, has_nearest)
    tri = desc[TD_MIP_FILTER_LINEAR] > 0
    blend = jnp.where(tri, frac, 0.0)
    return [w00, w10, w01, w11, wx[0], wx[1], wx[2],
            wy[0], wy[1], wy[2], blend]


def _apply_tap_weights(cols, w, parent: bool):
    """Filter from texel channel columns + precomputed weight planes."""
    w00, w10, w01, w11 = w[:4]
    out = [cols[c] * w00 + cols[4 + c] * w10 + cols[8 + c] * w01
           + cols[12 + c] * w11 for c in range(4)]
    if not parent:
        return out
    wx = w[4:7]
    wy = w[7:10]
    blend = w[10]
    res = []
    for c in range(4):
        rows = [cols[16 + (cy * 3) * 4 + c] * wx[0]
                + cols[16 + (cy * 3 + 1) * 4 + c] * wx[1]
                + cols[16 + (cy * 3 + 2) * 4 + c] * wx[2] for cy in range(3)]
        par = rows[0] * wy[0] + rows[1] * wy[1] + rows[2] * wy[2]
        res.append(out[c] * (1.0 - blend) + par * blend)
    return res


def _tap_channels(cols, desc, u, v, plan, frac, has_nearest: bool):
    """One tap from pre-extracted texel channel columns → [r,g,b,a] (P,).

    cols: list of (P,) f32 texel-row columns (16 quad [+ 36 parent]);
    plan: (fx, fy, x0i, y0i, wm, hm) from _level_idx; frac: (P,)
    trilinear fraction or None. ALL math is (P,)-shaped — (P,4)-shaped
    ops run at 4/128 lane efficiency on TPU (~0.26 ms each at 1080p),
    which made the old AoS tap path ~15 ms of pure ALU."""
    w = _tap_weights(desc, u, v, plan, frac, has_nearest)
    return _apply_tap_weights(cols, w, parent=frac is not None)


def _tap_plan_fused(tex_id, u, v, duv, descriptors, *, has_nearest: bool,
                    tform_id=None, tex_transforms=None):
    """Fused Pallas tap planner: per-pixel texel-row index + the 11
    filter-weight planes in ONE pass.

    Replaces the XLA chain KHR-transform one-hot + split -> descriptor
    one-hot + split -> 14-way mip-offset select -> footprint/wrap/weight
    fusions with explicit in-kernel math (measured net-neutral on frame
    time, but it deletes the layout-hazard surface those splits carried).
    The descriptor/transform tables are tiny, so each block fetches rows
    with in-kernel one-hot matmuls on the MXU. Integer wrap math uses an
    exact f32-reciprocal remainder (Mosaic's native variable-divisor i32
    remainder lowers ~10x slower — it alone cost ~14 ms/frame). Mip
    offsets ride as exact 12-bit hi/lo f32 halves so texel pools larger
    than 2^24 rows stay exact.

    duv: (dudx, dvdx, dudy, dvdy) channel planes, or None (mip level 0,
    zero parent weights). tform_id + tex_transforms apply
    KHR_texture_transform in-kernel (id < 0 = identity). Returns
    (idx (N,) i32, [11 x (N,) f32])."""
    from jax.experimental import pallas as pl

    from .relayout import _padded, _pick_blk

    mips = duv is not None
    tform = tform_id is not None
    N = tex_id.shape[0]
    capD = descriptors.shape[0]
    capT = tex_transforms.shape[0] if tform else 0
    # f32-exact descriptor table: 7 scalar fields + hi/lo offset halves.
    # Stored TRANSPOSED (DC, capD) so the in-kernel fetch is
    # (DC,capD)@(capD,blk) against a transposed one-hot — per-block
    # transposes of the matmul result measured ~25% of this kernel.
    d = descriptors
    offs = d[:, TD_MIP_OFFSETS:TD_MIP_OFFSETS + MAX_MIPS]
    tab = jnp.concatenate([
        d[:, :8].astype(jnp.float32),
        (offs >> 12).astype(jnp.float32),
        (offs & 0xFFF).astype(jnp.float32),
    ], axis=1).T                                 # (8 + 2*MAX_MIPS, capD)
    DC = tab.shape[0]

    blk = _pick_blk(N)
    ins = [jnp.clip(tex_id, 0, capD - 1), u, v]
    if tform:
        ins.append(tform_id)
    ins += list(duv) if mips else []
    ins = [_padded(x, blk, 0)[0] for x in ins]
    Np = ins[0].shape[0]

    def kernel(*refs):
        tab_ref = refs[0]
        refs = refs[1:]
        if tform:
            tt_ref = refs[0]
            refs = refs[1:]
        n_in = 3 + (1 if tform else 0) + (4 if mips else 0)
        in_refs = refs[:n_in]
        idx_ref = refs[n_in]
        w_refs = refs[n_in + 1:]
        tid = in_refs[0][:]
        uu = in_refs[1][:]
        vv = in_refs[2][:]
        duv_refs = in_refs[4:8] if tform else in_refs[3:7]

        def remq(a, n):
            # exact i32 (remainder, quotient) (n > 0, |a| < n * 2^24) via
            # f32 reciprocal + fixup: Mosaic's native variable-divisor
            # i32 remainder lowers ~10x slower (profiled: the
            # jnp.remainder form cost ~14 ms/frame in this kernel)
            q = jnp.floor(a.astype(jnp.float32)
                          / n.astype(jnp.float32)).astype(jnp.int32)
            r = a - q * n
            under = r < 0
            r = jnp.where(under, r + n, r)
            q = jnp.where(under, q - 1, q)
            over = r >= n
            r = jnp.where(over, r - n, r)
            q = jnp.where(over, q + 1, q)
            return r, q

        def wrapc(i, n, mode):
            # _wrap_coord with ONE divide: rem(i, 2n) = rem(i, n)
            # + n*(q&1) since floor(i/2n) = q>>1 exactly (i = q*n + r,
            # 0 <= r < n)
            repv, q = remq(i, n)
            clm = jnp.clip(i, 0, n - 1)
            m = repv + jnp.where((q & 1) != 0, n, 0)
            mir = jnp.where(m >= n, 2 * n - 1 - m, m)
            return jnp.where(mode == WRAP_REPEAT, repv,
                             jnp.where(mode == WRAP_CLAMP, clm, mir))

        if mips:
            dudx, dvdx, dudy, dvdy = (r[:] for r in duv_refs)
        if tform:
            # KHR_texture_transform + gradient pushforward, fused in
            # (apply_texture_transform_with_grads_c semantics)
            tfid = in_refs[3][:]
            ohT = (jnp.clip(tfid, 0, capT - 1)[None, :]
                   == jax.lax.broadcasted_iota(jnp.int32, (capT, blk), 0)
                   ).astype(jnp.float32)
            Tt = jnp.dot(tt_ref[:], ohT,
                         preferred_element_type=jnp.float32)     # (8, blk)
            wrap_first = Tt[6] > 0.5
            uw = jnp.where(wrap_first, uu - jnp.floor(uu), uu)
            vw = jnp.where(wrap_first, vv - jnp.floor(vv), vv)
            boundT = tfid >= 0
            uu = jnp.where(boundT, Tt[0] * uw + Tt[1] * vw + Tt[4], uu)
            vv = jnp.where(boundT, Tt[2] * uw + Tt[3] * vw + Tt[5], vv)
            if mips:
                dudx, dvdx = (
                    jnp.where(boundT, Tt[0] * dudx + Tt[1] * dvdx, dudx),
                    jnp.where(boundT, Tt[2] * dudx + Tt[3] * dvdx, dvdx))
                dudy, dvdy = (
                    jnp.where(boundT, Tt[0] * dudy + Tt[1] * dvdy, dudy),
                    jnp.where(boundT, Tt[2] * dudy + Tt[3] * dvdy, dvdy))

        # descriptor fetch: one-hot matmul on the tiny (pre-transposed)
        # table — result lands channel-major, no per-block transpose
        oh = (tid[None, :]
              == jax.lax.broadcasted_iota(jnp.int32, (capD, blk), 0)
              ).astype(jnp.float32)
        D = jnp.dot(tab_ref[:], oh,
                    preferred_element_type=jnp.float32)         # (DC, blk)
        w0 = D[TD_WIDTH].astype(jnp.int32)
        h0 = D[TD_HEIGHT].astype(jnp.int32)
        n_mips = D[TD_N_MIPS]
        wrap_s = D[TD_WRAP_S].astype(jnp.int32)
        wrap_t = D[TD_WRAP_T].astype(jnp.int32)
        linear = D[TD_FILTER_LINEAR] > 0
        tri = D[TD_MIP_FILTER_LINEAR] > 0

        if mips:
            wf0 = D[TD_WIDTH]
            hf0 = D[TD_HEIGHT]
            an = jnp.maximum(D[TD_MAX_ANISO], 1.0)
            rx = (dudx * wf0) ** 2 + (dvdx * hf0) ** 2
            ry = (dudy * wf0) ** 2 + (dvdy * hf0) ** 2
            # anisotropy-aware LOD (see _mip_level): minor-axis footprint
            # bounded below by major/N^2
            r_eff = jnp.maximum(jnp.minimum(rx, ry),
                                jnp.maximum(rx, ry) / (an * an))
            level = 0.5 * jnp.log2(jnp.maximum(r_eff, 1e-12))
            level = jnp.clip(level, 0.0, n_mips - 1.0)
            l0 = jnp.floor(level).astype(jnp.int32)
            frac = level - l0.astype(jnp.float32)
        else:
            l0 = jnp.zeros((blk,), jnp.int32)

        wm = jnp.maximum(jnp.right_shift(w0, l0), 1)
        hm = jnp.maximum(jnp.right_shift(h0, l0), 1)
        lv = jnp.clip(l0, 0, MAX_MIPS - 1)
        off_hi = sum(jnp.where(lv == m, D[8 + m], 0.0)
                     for m in range(MAX_MIPS))
        off_lo = sum(jnp.where(lv == m, D[8 + MAX_MIPS + m], 0.0)
                     for m in range(MAX_MIPS))
        offset = (off_hi.astype(jnp.int32) << 12) | off_lo.astype(jnp.int32)

        wf = wm.astype(jnp.float32)
        hf = hm.astype(jnp.float32)
        x = _prep_coord(uu, wf, wrap_s)
        y = _prep_coord(vv, hf, wrap_t)
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = x - x0
        fy = y - y0
        x0i = wrapc(x0.astype(jnp.int32), wm, wrap_s)
        y0i = wrapc(y0.astype(jnp.int32), hm, wrap_t)
        idx_ref[:] = offset + y0i * wm + x0i

        w00, w10, w01, w11 = _quad_weights(fx, fy, linear, has_nearest)
        zeros = jnp.zeros((blk,), jnp.float32)
        if not mips:
            ws = [w00, w10, w01, w11] + [zeros] * 7
        else:
            # parent-mip 3x3 anchor (same math as _tap_weights)
            w1 = jnp.maximum(jnp.right_shift(wm, 1), 1)
            h1 = jnp.maximum(jnp.right_shift(hm, 1), 1)
            x1 = _prep_coord(uu, w1.astype(jnp.float32), wrap_s)
            y1 = _prep_coord(vv, h1.astype(jnp.float32), wrap_t)
            ax = jnp.floor(x1)
            ay = jnp.floor(y1)
            fx1 = x1 - ax
            fy1 = y1 - ay
            axw = wrapc(ax.astype(jnp.int32), w1, wrap_s)
            ayw = wrapc(ay.astype(jnp.int32), h1, wrap_t)
            bx = wrapc((x0i - 1) >> 1, w1, wrap_s)
            by = wrapc((y0i - 1) >> 1, h1, wrap_t)
            # axw/bx are already in [0, w1), so the difference lies in
            # (-w1, w1) and the mod-w1 fold is one conditional add
            ddx = axw - bx
            ddy = ayw - by
            dx1 = jnp.where(ddx < 0, ddx + w1, ddx) >= 1
            dy1 = jnp.where(ddy < 0, ddy + h1, ddy) >= 1
            wx = _axis_weights(fx1, dx1, linear, has_nearest)
            wy = _axis_weights(fy1, dy1, linear, has_nearest)
            blend = jnp.where(tri, frac, 0.0)
            ws = [w00, w10, w01, w11, wx[0], wx[1], wx[2],
                  wy[0], wy[1], wy[2], blend]
        for w, o in zip(ws, w_refs):
            o[:] = w

    n_in = len(ins)
    tables = [tab] + ([tex_transforms.T] if tform else [])
    table_specs = [pl.BlockSpec((DC, capD), lambda n: (0, 0))]
    if tform:
        table_specs.append(pl.BlockSpec((8, capT), lambda n: (0, 0)))
    outs = pl.pallas_call(
        kernel,
        grid=(Np // blk,),
        in_specs=table_specs
        + [pl.BlockSpec((blk,), lambda n: (n,)) for _ in range(n_in)],
        out_specs=tuple(pl.BlockSpec((blk,), lambda n: (n,))
                        for _ in range(12)),
        out_shape=(jax.ShapeDtypeStruct((Np,), jnp.int32),)
        + tuple(jax.ShapeDtypeStruct((Np,), jnp.float32)
                for _ in range(11)),
    )(*tables, *ins)
    return outs[0][:N], [o[:N] for o in outs[1:]]


def _filter_taps_fused(q_all, wplanes, *, mips: bool):
    """Fused Pallas filter: gathered texel rows (N, C) + 11 (N,) weight
    planes → 4 (N,) filtered channels in ONE pass. The XLA form paid a
    ~2.4 ms channel splitter plus 52 planes of HBM round-trip at 1080p;
    here each block's columns are read straight out of the gather
    result. Same math as _apply_tap_weights."""
    from jax.experimental import pallas as pl

    from .relayout import _padded, _pick_blk

    N, C = q_all.shape
    blk = _pick_blk(N)
    qp, Np = _padded(q_all, blk, 0)
    wps = [_padded(w, blk, 0)[0] for w in wplanes]

    def kernel(q_ref, *refs):
        w_refs, o_refs = refs[:11], refs[11:]
        Q = q_ref[:].astype(jnp.float32).T              # (C, blk)
        (w00, w10, w01, w11, wx0, wx1, wx2, wy0, wy1, wy2,
         blend) = [r[:] for r in w_refs]
        for c in range(4):
            quad = (Q[c] * w00 + Q[4 + c] * w10
                    + Q[8 + c] * w01 + Q[12 + c] * w11)
            if mips:
                par = ((Q[16 + c] * wx0 + Q[20 + c] * wx1 + Q[24 + c] * wx2) * wy0
                       + (Q[28 + c] * wx0 + Q[32 + c] * wx1 + Q[36 + c] * wx2) * wy1
                       + (Q[40 + c] * wx0 + Q[44 + c] * wx1 + Q[48 + c] * wx2) * wy2)
                o_refs[c][:] = quad * (1.0 - blend) + par * blend
            else:
                o_refs[c][:] = quad

    outs = pl.pallas_call(
        kernel,
        grid=(Np // blk,),
        in_specs=[pl.BlockSpec((blk, C), lambda n: (n, 0))]
        + [pl.BlockSpec((blk,), lambda n: (n,)) for _ in range(11)],
        out_specs=tuple(pl.BlockSpec((blk,), lambda n: (n,))
                        for _ in range(4)),
        out_shape=tuple(jax.ShapeDtypeStruct((Np,), jnp.float32)
                        for _ in range(4)),
    )(qp, *wps)
    return [o[:N] for o in outs]


def _blend_bilinear(q, fx, fy):
    """q: packed rows (first 16 cols = quad) → (P,4) bilinear blend."""
    q = q[:, :16].astype(jnp.float32)
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
    q = q[:, :16].astype(jnp.float32)
    right = fx >= 0.5
    down = fy >= 0.5
    top = jnp.where(right, q[:, 4:8], q[:, 0:4])
    bot = jnp.where(right, q[:, 12:16], q[:, 8:12])
    return jnp.where(down, bot, top)


def _mip_level(desc, duv):
    """LOD from screen-space uv gradients (per-pixel, given the
    already-fetched descriptor rows). duv = (dudx, dvdx, dudy, dvdy)
    channel arrays.

    Honors the sampler's max_anisotropy N (reference textures.rs:186-220):
    with rho_max/rho_min the major/minor footprint axes, the LOD is
    log2(rho_max / min(rho_max/rho_min, N)) = 0.5*log2(max(rho_min^2,
    rho_max^2/N^2)) — N=1 reduces to the isotropic max-axis rule; larger N
    sharpens oblique footprints exactly as far as hardware aniso would
    pick its minor-axis LOD."""
    dudx, dvdx, dudy, dvdy = duv
    w = desc[TD_WIDTH].astype(jnp.float32)
    h = desc[TD_HEIGHT].astype(jnp.float32)
    a = jnp.maximum(desc[TD_MAX_ANISO].astype(jnp.float32), 1.0)
    rx = (dudx * w) ** 2 + (dvdx * h) ** 2
    ry = (dudy * w) ** 2 + (dvdy * h) ** 2
    rmin = jnp.minimum(rx, ry)
    rmax = jnp.maximum(rx, ry)
    r_eff = jnp.maximum(rmin, rmax / (a * a))
    return 0.5 * jnp.log2(jnp.maximum(r_eff, 1e-12))


def sample_texture_batch_c(texq, descriptors, taps, has_nearest: bool = True,
                           tex_transforms=None):
    """Sample many texture taps through ONE texel gather (and one
    descriptor one-hot matmul) — channel-column form.

    taps: list of (tex_id (P,) i32, (u, v) channel pair, duv or None
    [, tform_id (P,) i32]) where duv = (dudx, dvdx, dudy, dvdy) channels
    enables gradient mip selection + trilinear (ONE row per tap even
    then — the row carries the parent-mip 3x3), and the optional 4th
    element applies KHR_texture_transform (requires `tex_transforms`;
    id < 0 → identity). Returns a list of [r,g,b,a] channel lists
    aligned with taps; tex_id < 0 → white. This is the TPU shape of the
    reference's texture-pool sampling loop (material_opaque_wgsl/
    compute.wgsl): all slots sample together.
    """
    from .vertex import onehot_gather_t

    if not taps:
        return []
    P = taps[0][0].shape[0]
    nt = len(taps)

    from .raster import _interpret_default

    mips_flags = [t[2] is not None for t in taps]
    has_tform = [len(t) > 3 and t[3] is not None for t in taps]
    if not _interpret_default() and len(set(mips_flags)) == 1:
        # fully fused pipeline: ONE Pallas tap planner (transform,
        # descriptor fetch, mip level, footprint, weights) -> ONE texel
        # gather -> ONE Pallas filter. The XLA form of plan+filter cost
        # ~4 ms at 1080p in descriptor/weight splits and select chains.
        any_mips = mips_flags[0]
        cat = (jnp.concatenate if nt > 1 else (lambda xs: xs[0]))
        ids_all = cat([t[0] for t in taps])
        u_all = cat([t[1][0] for t in taps])
        v_all = cat([t[1][1] for t in taps])
        duv_all = (tuple(cat([t[2][c] for t in taps]) for c in range(4))
                   if any_mips else None)
        tform_all = None
        if any(has_tform):
            none_t = jnp.full((P,), -1, jnp.int32)
            tform_all = cat([t[3] if len(t) > 3 and t[3] is not None
                             else none_t for t in taps])
        idx_all, wplanes = _tap_plan_fused(
            ids_all, u_all, v_all, duv_all, descriptors,
            has_nearest=has_nearest, tform_id=tform_all,
            tex_transforms=tex_transforms if tform_all is not None else None)
        idx_all = jnp.clip(idx_all, 0, texq.shape[0] - 1)
        # barrier: see below — keeps the index operand in canonical layout
        idx_all = jax.lax.optimization_barrier(idx_all)
        q_all = texq[idx_all]
        ch4 = _filter_taps_fused(q_all, wplanes, mips=any_mips)
        outs = []
        for i, t in enumerate(taps):
            bound = t[0] >= 0
            outs.append([jnp.where(bound, c[i * P:(i + 1) * P], 1.0)
                         for c in ch4])
        return outs

    # fallback (interpret / mixed-mip taps): apply any per-tap transform
    # in XLA first, then the split-based sampling below
    if any(has_tform):
        conv = []
        for t in taps:
            if len(t) > 3 and t[3] is not None:
                u, v, duv = apply_texture_transform_with_grads_c(
                    tex_transforms, t[3], t[1][0], t[1][1], t[2])
                conv.append((t[0], (u, v), duv))
            else:
                conv.append(t[:3])
        taps = conv

    # one descriptor fetch for all taps — split into per-field rank-1
    # arrays so no XLA-side row slice ever exists (ops/relayout.py)
    from .relayout import split_rows

    ids_all = jnp.concatenate([jnp.clip(t[0], 0, descriptors.shape[0] - 1)
                               for t in taps])
    desc_rows = split_rows(
        onehot_gather_t(ids_all, descriptors.astype(jnp.float32)).astype(jnp.int32))
    descs = [tuple(r[i * P : (i + 1) * P] for r in desc_rows)
             for i in range(nt)]

    plans = []
    idx_parts = []
    any_mips = False
    for (tex_id, (u, v), duv), desc in zip(taps, descs):
        n_mips = desc[TD_N_MIPS]
        if duv is not None:
            level = jnp.clip(_mip_level(desc, duv), 0.0,
                             (n_mips - 1).astype(jnp.float32))
            l0 = jnp.floor(level).astype(jnp.int32)
            frac = level - l0.astype(jnp.float32)
            any_mips = True
        else:
            l0 = jnp.zeros(P, jnp.int32)
            frac = None
        plan = _level_idx(desc, u, v, l0)
        plans.append((tex_id, desc, u, v, plan[1:], frac))
        idx_parts.append(plan[0])

    # THE gather: every tap in one op; then ONE explicit transpose so the
    # per-channel reads are contiguous rows with the canonical rank-1
    # layout (slicing columns out of the row-major gather result makes
    # XLA assign T(1,128) layouts downstream — 1/8 vector utilization)
    idx_all = jnp.clip(jnp.concatenate(idx_parts), 0, texq.shape[0] - 1)
    # barrier: without it the whole index-math fusion compiles INTO the
    # gather operand's s32[N,1]{0,1:T(1,128)} layout (1/8 vector
    # utilization — profiled 4.3 ms); with it the math runs in the
    # canonical layout and only a thin convert feeds the gather
    idx_all = jax.lax.optimization_barrier(idx_all)
    q_all = texq[idx_all]                            # (n_taps*P, TEXEL_COLS)
    ncols = 52 if any_mips else 16
    from .relayout import split_channels
    cols_all = split_channels(q_all[:, :ncols])      # ncols x (n_taps*P,)

    outs = []
    for i, (tex_id, desc, u, v, plan, frac) in enumerate(plans):
        cols = [c[i * P : (i + 1) * P] for c in cols_all]
        ch = _tap_channels(cols, desc, u, v, plan, frac, has_nearest)
        bound = tex_id >= 0
        outs.append([jnp.where(bound, c, 1.0) for c in ch])
    return outs


def sample_texture_batch(texq, descriptors, taps, has_nearest: bool = True):
    """AoS-compat wrapper over sample_texture_batch_c: taps carry (P,2)
    uv / ((P,2),(P,2)) duv and results come back stacked (P,4)."""
    conv = []
    for (tex_id, uv, duv) in taps:
        duv_c = None if duv is None else (duv[0][:, 0], duv[0][:, 1],
                                          duv[1][:, 0], duv[1][:, 1])
        conv.append((tex_id, (uv[:, 0], uv[:, 1]), duv_c))
    return [jnp.stack(ch, axis=-1)
            for ch in sample_texture_batch_c(texq, descriptors, conv,
                                             has_nearest)]


def _sample_level(texq, desc, uv, level, has_nearest: bool = True,
                  frac=None):
    """Sample at integer mip `level` (P,), trilinear when frac is given.

    texq is the packed texel buffer (N, TEXEL_COLS): each row carries the
    bilinear quad plus the parent mip's 3x3 neighborhood
    (core/textures.py::_pack_rows), so one bilinear OR trilinear tap =
    ONE gather. has_nearest=False compiles out the nearest-filter select."""
    u, v = uv[:, 0], uv[:, 1]
    idx, fx, fy, x0i, y0i, wm, hm = _level_idx(desc, u, v, level)
    q = texq[jnp.clip(idx, 0, texq.shape[0] - 1)]
    ncols = 52 if frac is not None else 16
    from .relayout import split_channels
    cols = split_channels(q[:, :ncols])
    ch = _tap_channels(cols, desc, u, v, (fx, fy, x0i, y0i, wm, hm),
                       frac, has_nearest)
    return jnp.stack(ch, axis=-1)


def sample_texture(texq, descriptors, tex_id, uv, mip_level=None,
                   has_nearest: bool = True):
    """Sample textures per pixel. tex_id < 0 → white (1,1,1,1).
    texq: quad-packed texel buffer (N, 16) — see core/textures.py.

    mip_level: (P,) f32 or None (base level). Trilinear when the sampler's
    mip filter is linear, else nearest-mip. The descriptor fetch rides the
    MXU (one-hot matmul — the descriptor table is tiny and XLA's TPU
    gather lowering is slow).
    """
    from .relayout import split_rows
    from .vertex import onehot_gather_t

    P = tex_id.shape[0]
    safe_id = jnp.clip(tex_id, 0, descriptors.shape[0] - 1)
    desc = split_rows(
        onehot_gather_t(safe_id, descriptors.astype(jnp.float32)).astype(jnp.int32))
    n_mips = desc[TD_N_MIPS]

    if mip_level is None:
        out = _sample_level(texq, desc, uv, jnp.zeros(P, jnp.int32), has_nearest)
    else:
        level = jnp.clip(mip_level, 0.0, (n_mips - 1).astype(jnp.float32))
        l0 = jnp.floor(level).astype(jnp.int32)
        frac = level - l0.astype(jnp.float32)
        out = _sample_level(texq, desc, uv, l0, has_nearest, frac=frac)

    return jnp.where((tex_id >= 0)[:, None], out, jnp.ones_like(out))


def mip_level_from_grads(descriptors, tex_id, duv_dx, duv_dy):
    """Standard isotropic LOD: log2(max gradient length in texel space).

    Ports the reference's gradient-based mip selection in the opaque
    shading kernel (material_opaque_wgsl/compute.wgsl texture sampling).
    """
    from .relayout import split_rows
    from .vertex import onehot_gather_t

    safe_id = jnp.clip(tex_id, 0, descriptors.shape[0] - 1)
    desc = split_rows(
        onehot_gather_t(safe_id, descriptors.astype(jnp.float32)).astype(jnp.int32))
    return _mip_level(desc, (duv_dx[:, 0], duv_dx[:, 1],
                             duv_dy[:, 0], duv_dy[:, 1]))


def apply_texture_transform(tex_transforms, transform_id, uv):
    """KHR_texture_transform: uv' = M @ uv + offset; id < 0 → identity.

    Row slot 6 is a mode flag: 1 = wrap (fract) uv BEFORE the affine map —
    used by MegaTexture atlas entries so REPEAT sampling stays inside the
    entry's sub-rectangle (reference mega_texture per-entry uv offset/scale
    behaves the same way). The tiny table is fetched with a one-hot MXU
    matmul, NOT a gather — a second real gather in the same XLA
    computation as the texel gather costs +25-45 ms at 1080p
    (anti-fusion), which dwarfs the whole tap budget."""
    u, v = apply_texture_transform_c(tex_transforms, transform_id,
                                     uv[:, 0], uv[:, 1])
    return jnp.stack([u, v], axis=-1)


def apply_texture_transform_c(tex_transforms, transform_id, u, v):
    """Channel-column form of apply_texture_transform: (u, v) → (u', v')."""
    uo, vo, _ = apply_texture_transform_with_grads_c(
        tex_transforms, transform_id, u, v, None)
    return uo, vo


def apply_texture_transform_with_grads_c(tex_transforms, transform_id,
                                         u, v, duv):
    """apply_texture_transform_c + pushforward of the screen-space uv
    gradients through the transform's LINEAR part (J = [[t0,t1],[t2,t3]]).

    The mip estimator must see derivatives in the SAMPLED uv space: an
    atlas entry scaling uv by 1/64 (MegaTexture sub-rect) otherwise reads
    gradients 64x too large and drops ~6 mip levels deep, smearing the
    whole page into the tap. One one-hot fetch serves both the affine map
    and the Jacobian. duv = (du_dx, dv_dx, du_dy, dv_dy) or None."""
    from .relayout import split_rows
    from .vertex import onehot_gather_t

    safe = jnp.clip(transform_id, 0, tex_transforms.shape[0] - 1)
    t = split_rows(onehot_gather_t(safe, tex_transforms))   # 8 x (P,)
    wrap_first = t[6] > 0.5
    uw = jnp.where(wrap_first, u - jnp.floor(u), u)
    vw = jnp.where(wrap_first, v - jnp.floor(v), v)
    uo = t[0] * uw + t[1] * vw + t[4]
    vo = t[2] * uw + t[3] * vw + t[5]
    bound = transform_id >= 0
    uo = jnp.where(bound, uo, u)
    vo = jnp.where(bound, vo, v)
    if duv is None:
        return uo, vo, None
    du_dx, dv_dx, du_dy, dv_dy = duv
    out = (
        jnp.where(bound, t[0] * du_dx + t[1] * dv_dx, du_dx),
        jnp.where(bound, t[2] * du_dx + t[3] * dv_dx, dv_dx),
        jnp.where(bound, t[0] * du_dy + t[1] * dv_dy, du_dy),
        jnp.where(bound, t[2] * du_dy + t[3] * dv_dy, dv_dy),
    )
    return uo, vo, out
