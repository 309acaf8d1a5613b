"""Post-processing effects: bloom, depth of field, SMAA.

Port of the reference's effects compute pass (render_passes/effects/:
bloom Extract → N blur ping-pong passes → Blend, effects/render_pass.rs:
36-63; physically-based DoF CoC from aperture/focus distance,
effects_wgsl/helpers/dof.wgsl:1-50; SMAA 1x single-pass,
helpers/smaa.wgsl:1-30). All stages are whole-image XLA stencils
(shift-accumulate + elementwise) that XLA fuses; ping-pong buffers
disappear into SSA values.

CHANNEL-PLANE layout: every stage runs on per-channel (H, W) f32 planes.
The original (H, W, C) AoS form ran the whole chain at C/128 lane
utilization — profiled ~25 ms of select/blur fusions on f32[8294400]
(= 1080*1920*4) at 1080p, vs ~3 ms for the same math on planes. The
`bloom`/`depth_of_field`/`smaa` AoS wrappers below delegate to the
channel kernels, so formula-parity tests cover the production path.
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


def _luma(rgb_ch):
    return rgb_ch[0] * 0.2126 + rgb_ch[1] * 0.7152 + rgb_ch[2] * 0.0722


def _bloom_threshold_c(rgb_ch):
    """Soft-knee brightness extract (bloom.wgsl bloom_threshold)."""
    brightness = _luma(rgb_ch)
    contribution = jnp.maximum(brightness - BLOOM_THRESHOLD, 0.0)
    soft_threshold = BLOOM_THRESHOLD * 0.8
    knee = BLOOM_THRESHOLD - soft_threshold
    soft = jnp.clip((brightness - soft_threshold) / knee, 0.0, 1.0)
    factor = contribution / jnp.maximum(brightness, 1e-4) * soft
    return [c * factor for c in rgb_ch]


def _bloom_blur_c(planes):
    """Circular-masked gaussian stencil (bloom.wgsl blur_sample:
    5x5 neighborhood, corners beyond BLOOM_RADIUS skipped, edge clamp).
    Shift-accumulate on clamp-padded planes — XLA fuses the whole kernel
    into one stencil pass per plane."""
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
    outs = []
    for p in planes:
        H, W = p.shape
        xp = jnp.pad(p, ((r, r), (r, r)), mode="edge")
        out = jnp.zeros_like(p)
        for dy, dx, w in taps:
            out = out + xp[r + dy : r + dy + H, r + dx : r + dx + W] * (w / total)
        outs.append(out)
    return outs


def bloom_c(rgb_ch):
    """Reference bloom pipeline (effects pipeline.rs:25-27 — 1 extract +
    BLOOM_BLUR_PASSES ping-pong blurs + 1 blend, all full-resolution) on
    [r, g, b] (H, W) channel planes."""
    b = _bloom_blur_c(_bloom_threshold_c(rgb_ch))
    for _ in range(BLOOM_BLUR_PASSES):
        b = _bloom_blur_c(b)
    blurred = _bloom_blur_c(b)
    return [c + bb * BLOOM_INTENSITY for c, bb in zip(rgb_ch, blurred)]


def bloom(hdr: jnp.ndarray) -> jnp.ndarray:
    """AoS wrapper: (H, W, 4) in/out (tests + hook-compat surface)."""
    out = bloom_c([hdr[..., c] for c in range(3)])
    return jnp.concatenate([jnp.stack(out, axis=-1), hdr[..., 3:4]], axis=-1)


DOF_MAX_BLUR = 16.0         # dof.wgsl DOF_MAX_BLUR (pixels)
DOF_SAMPLES = 16            # dof.wgsl DOF_SAMPLES
DOF_SENSOR_HEIGHT = 0.024   # dof.wgsl SENSOR_HEIGHT (24mm full frame)
DOF_GOLDEN_ANGLE = 2.39996323  # dof.wgsl get_disk_offset


DOF_RING_SCALES = (1.0, 0.5, 0.25)   # static disk radii: 16, 8, 4 px


def dof_disk_offsets(scale: float = 1.0):
    """The 16 golden-angle disk taps of dof.wgsl get_disk_offset, laid
    out at radius scale*DOF_MAX_BLUR: returns a list of (dx, dy, dist)
    with integer pixel offsets (rounded like the WGSL round(offset)) and
    the pre-round euclidean distance used by the falloff weight."""
    taps = []
    for i in range(DOF_SAMPLES):
        theta = i * DOF_GOLDEN_ANGLE
        r = np.sqrt((i + 1) / DOF_SAMPLES) * DOF_MAX_BLUR * scale
        ox, oy = np.cos(theta) * r, np.sin(theta) * r
        taps.append((int(np.round(ox)), int(np.round(oy)),
                     float(np.hypot(ox, oy))))
    return taps


def dof_ring_weight(coc, scale: float):
    """Blend weight of the ring with radius R = scale*DOF_MAX_BLUR as a
    hat function of log2(CoC): 1 when CoC == R, linearly fading to the
    adjacent rings' radii (the smallest ring keeps weight 1 below its
    radius, the largest above). Interpolating ring radii in log space is
    how the static rings track the WGSL's per-pixel-scaled disk."""
    import jax.numpy as jnp

    R = scale * DOF_MAX_BLUR
    t = jnp.log2(jnp.maximum(coc, 1e-6)) - np.log2(R)
    up = jnp.clip(1.0 - t, 0.0, 1.0)        # fade toward the 2R ring
    dn = jnp.clip(1.0 + t, 0.0, 1.0)        # fade toward the R/2 ring
    if scale >= max(DOF_RING_SCALES):
        up = jnp.ones_like(up)              # no larger ring: keep 1 above
    if scale <= min(DOF_RING_SCALES):
        dn = jnp.ones_like(dn)              # no smaller ring: keep 1 below
    return jnp.minimum(up, dn)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / jnp.maximum(e1 - e0, 1e-8), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


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


def dof_coc_c(depth: jnp.ndarray, camera: dict) -> jnp.ndarray:
    """Per-pixel circle of confusion in pixels (dof.wgsl calculate_coc,
    Blender-compatible camera model): focal length from proj[1][1] against
    a 24mm sensor, aperture as the f-stop number, CoC = (f/N)·f·|D-S| /
    (D·S) converted to pixels and capped at DOF_MAX_BLUR."""
    proj = camera["proj"]
    S = camera["dof"][0]                       # focus distance (world units)
    N = camera["dof"][1]                       # f-stop number
    Hpx = depth.shape[0]
    D = jnp.maximum(linearize_depth(depth, proj), 1e-4)
    f = (DOF_SENSOR_HEIGHT * 0.5) * proj[1, 1]  # get_focal_length
    A_ap = f / jnp.maximum(N, 0.1)              # aperture diameter
    coc_world = A_ap * f * jnp.abs(D - S) / (D * jnp.maximum(S, 1e-3))
    return jnp.clip(coc_world * Hpx / DOF_SENSOR_HEIGHT, 0.0, DOF_MAX_BLUR)


_DOF_PAD = int(DOF_MAX_BLUR)


def _pad_once(p: jnp.ndarray) -> jnp.ndarray:
    """Edge-pad a plane by the max tap radius ONCE; every tap then reads
    a static slice of the same buffer. Per-tap jnp.pad (the first
    implementation) materialized one padded copy per (tap, plane) —
    ~240 full-frame copies, ~7 ms at 1080p; slices of one shared padded
    array fuse into the accumulating stencil instead."""
    return jnp.pad(p, ((_DOF_PAD, _DOF_PAD), (_DOF_PAD, _DOF_PAD)),
                   mode="edge")


def _shift_padded(xp: jnp.ndarray, H: int, W: int, dy: int, dx: int) -> jnp.ndarray:
    """Value at (y+dy, x+dx) of the original plane, read from its
    _pad_once buffer — the WGSL clamp(coords + offset, 0, dims-1)
    sampling rule as a static slice."""
    return xp[_DOF_PAD + dy : _DOF_PAD + dy + H,
              _DOF_PAD + dx : _DOF_PAD + dx + W]


def linearize_depth_host(d: float, proj: np.ndarray) -> float:
    """Pure-host mirror of linearize_depth (no device roundtrip) for the
    per-frame CoC-bound computation."""
    A = float(proj[2, 2])
    B = float(proj[2, 3])
    persp = abs(float(proj[3, 2])) > 0.5
    d = min(max(d, 0.0), 1.0)
    if persp:
        den = A + d
        return B / (den if abs(den) > 1e-8 else 1e-8)
    return (B - d) / (A if abs(A) > 1e-12 else 1e-12)


def dof_max_coc(dof_params, proj_11: float, dmin: float, dmax: float,
                height_px: int) -> float:
    """Host-side upper bound on the frame's CoC in pixels, from the
    camera model and the scene's view-distance range [dmin, dmax].
    coc(D) ∝ |D-S|/D is decreasing below the focus distance and
    increasing above it, so the max is at an endpoint. Drives the static
    ring specialization of depth_of_field_c: rings whose log2-hat weight
    is provably zero for every representable CoC compile out, and
    coc_max <= 1 makes the whole pass the identity (every tap sits at
    dist >= 1 with zero falloff) — the compile-time analog of the WGSL's
    `if (center_coc < 0.5) return color` early-out."""
    S, N = float(dof_params[0]), float(dof_params[1])
    f = DOF_SENSOR_HEIGHT * 0.5 * float(proj_11)
    A = f / max(N, 0.1)
    dmin = max(float(dmin), 1e-4)
    dmax = max(float(dmax), dmin)
    coc_w = max(A * f * abs(d - S) / (d * max(S, 1e-3)) for d in (dmin, dmax))
    return min(coc_w * height_px / DOF_SENSOR_HEIGHT, DOF_MAX_BLUR)


def dof_active_rings(coc_max: float):
    """Static ring set for a CoC bound: ring R keeps nonzero hat weight
    only when coc can exceed R/2 (the next-smaller ring covers below);
    the smallest ring always stays. Returns () when DoF is the identity
    (coc_max <= 1 px)."""
    if coc_max <= 1.0:
        return ()
    smallest = min(DOF_RING_SCALES)
    return tuple(
        s for s in DOF_RING_SCALES
        if s == smallest or coc_max > s * DOF_MAX_BLUR / 2.0)


def depth_of_field_c(rgb_ch, depth: jnp.ndarray, camera: dict,
                     rings=DOF_RING_SCALES):
    """dof.wgsl apply_dof on [r, g, b] (H, W) channel planes: the 16-tap
    golden-angle disk as STATIC shifted adds.

    The WGSL scales its 16 tap positions by the per-pixel CoC; XLA needs
    static offsets, so the disk is laid out at THREE static ring scales
    (radii 16/8/4 px, dof_disk_offsets) blended by a log2(CoC) hat
    (dof_ring_weight) — each pixel effectively samples the ring whose
    radius brackets its CoC, which tracks the scaled disk to within one
    log2 step across the whole blur range. Per tap, the reference's two
    weights apply unchanged: the background-bleed occlusion guard
    (evaluated at the shifted pixel, dof.wgsl:104-107) and the radial
    falloff `1 - smoothstep(coc/2, coc, dist)` at the tap's true
    distance (for the ring matched to CoC this equals the WGSL's
    per-tap value, since its dist_i = sqrt((i+1)/16)*coc). A center tap
    (weight 1) stands in for scaled+rounded inner taps that degenerate
    to the center pixel. Sum renormalized by accepted weight; final mix
    by smoothstep(0, 2, coc) — all per dof.wgsl:92-123. Exact numpy
    mirror: tests/test_transparency_effects.py::
    test_dof_matches_numpy_wgsl_loop.

    rings: the active static ring subset (dof_active_rings) — rings the
    host-side CoC bound proves weightless compile out; rings=() is the
    exact identity and should be skipped by the caller."""
    if not rings:
        return [c for c in rgb_ch]
    coc = dof_coc_c(depth, camera)
    D = jnp.maximum(linearize_depth(depth, camera["proj"]), 1e-4)
    H, W = coc.shape

    coc_safe = jnp.maximum(coc, 0.01)
    # hoisted reciprocals: the per-tap forms s_coc/coc_safe and
    # smoothstep(coc/2, coc, dist) each hide a divide — 96 divides/px
    # across 48 taps; as multiplies by these two planes they are 2
    inv_coc = 1.0 / coc_safe
    inv_half = 2.0 * inv_coc                 # 1 / (coc - coc/2)
    pads = [_pad_once(p) for p in (*rgb_ch, D, coc)]
    # center tap: falloff at dist=0 is 1 - smoothstep(..,.., 0) = 1
    blur = [c * 1.0 for c in rgb_ch]
    total_w = jnp.ones_like(coc)
    for scale in rings:
        ring_w = dof_ring_weight(coc, scale)
        for dx, dy, dist in dof_disk_offsets(scale):
            s_r, s_g, s_b, s_D, s_coc = (
                _shift_padded(xp, H, W, dy, dx) for xp in pads)
            # background→foreground bleed guard (dof.wgsl:104-107)
            occluded = (s_D > D) & (s_coc < coc)
            w = jnp.where(occluded, s_coc * inv_coc, 1.0)
            # radial falloff at the tap's true distance:
            # 1 - smoothstep(coc/2, coc, dist), divide-free
            t = jnp.clip((dist - coc * 0.5) * inv_half, 0.0, 1.0)
            # per-tap weight floor (dof.wgsl:116 `weight = max(weight,
            # 0.01)`) applied BEFORE the ring hat: the rings partition
            # unity over CoC, so flooring the WGSL weight per ring keeps
            # the renormalized blend equal to the reference's for the
            # matched ring even in fully occluded neighborhoods
            w = jnp.maximum(w * (1.0 - t * t * (3.0 - 2.0 * t)),
                            0.01) * ring_w
            blur = [b + sc * w for b, sc in zip(blur, (s_r, s_g, s_b))]
            total_w = total_w + w
    inv = 1.0 / jnp.maximum(total_w, 0.01)
    blend = _smoothstep(0.0, 2.0, coc)  # dof.wgsl apply_dof tail
    return [c * (1.0 - blend) + b * inv * blend
            for c, b in zip(rgb_ch, blur)]


def depth_of_field(hdr: jnp.ndarray, depth: jnp.ndarray, camera: dict) -> jnp.ndarray:
    """AoS wrapper: (H, W, 4) in/out."""
    out = depth_of_field_c([hdr[..., c] for c in range(3)], depth, camera)
    return jnp.concatenate([jnp.stack(out, axis=-1), hdr[..., 3:4]], axis=-1)


SMAA_THRESHOLD = 0.03       # smaa.wgsl SMAA_THRESHOLD
SMAA_BLEND_STRENGTH = 0.6   # smaa.wgsl SMAA_BLEND_STRENGTH


def smaa_c(rgb_ch):
    """Single-pass morphological AA, full smaa.wgsl apply_smaa parity, on
    [r, g, b] (H, W) channel planes: 8-neighbor luma deltas in perceptual
    space, edge-orientation classification (horizontal / vertical /
    diagonal), inverse-contrast weighted neighborhood blending. Runs on
    the display (LDR, sRGB-encoded) image — the perceptual space the
    reference converts into for its edge detection. Branches become
    masked selects; the textureLoads become 8 rolls that XLA fuses into
    one stencil."""
    luma = _luma(rgb_ch)

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

    c = {k: [at_offset(p, *o) for p in rgb_ch] for k, o in offs.items()}

    def inv_w(a, b):
        wa = 1.0 / (a + 1e-3)
        wb = 1.0 / (b + 1e-3)
        t = wa + wb
        return wa / t, wb / t

    # horizontal edge: sequential mixes toward top then bottom
    # (neighborhood_blending is_horizontal=true)
    wt, wb = inv_w(d["n"], d["s"])
    wt = wt * SMAA_BLEND_STRENGTH
    wb = wb * SMAA_BLEND_STRENGTH
    blended_h = [p * (1 - wt) + cn * wt for p, cn in zip(rgb_ch, c["n"])]
    blended_h = [p * (1 - wb) + cs * wb for p, cs in zip(blended_h, c["s"])]

    # vertical edge: mixes toward left then right
    wl, wr = inv_w(d["w"], d["e"])
    wl = wl * SMAA_BLEND_STRENGTH
    wr = wr * SMAA_BLEND_STRENGTH
    blended_v = [p * (1 - wl) + cw * wl for p, cw in zip(rgb_ch, c["w"])]
    blended_v = [p * (1 - wr) + ce * wr for p, ce in zip(blended_v, c["e"])]

    # diagonal edge: inverse-contrast weighted 4-diagonal average,
    # mixed at the global strength (diagonal_blending)
    ws = {k: 1.0 / (d[k] + 1e-3) for k in ("nw", "ne", "sw", "se")}
    wtot = ws["nw"] + ws["ne"] + ws["sw"] + ws["se"]
    out = []
    for ci in range(3):
        nb = sum(c[k][ci] * (ws[k] / wtot) for k in ("nw", "ne", "sw", "se"))
        blended_d = (rgb_ch[ci] * (1 - SMAA_BLEND_STRENGTH)
                     + nb * SMAA_BLEND_STRENGTH)
        o = jnp.where(is_horiz, blended_h[ci], blended_v[ci])
        o = jnp.where(is_diag, blended_d, o)
        out.append(jnp.where(no_edge, rgb_ch[ci], o))
    return out


def smaa(img: jnp.ndarray) -> jnp.ndarray:
    """AoS wrapper: (H, W, 4) in/out."""
    out = smaa_c([img[..., c] for c in range(3)])
    return jnp.concatenate([jnp.stack(out, axis=-1), img[..., 3:4]], axis=-1)
