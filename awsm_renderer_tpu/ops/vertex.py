"""Vertex stage: morph → skin → world → clip → near-plane clip → fat setup.

TPU-native replacement for the reference's geometry-pass vertex shader
(crates/renderer/src/render_passes/shared/shared_wgsl/vertex/apply_vertex.wgsl:25-120:
morphs → skins → instancing → model → view-proj) plus the fixed-function
triangle setup AND near-plane clipping the GPU rasterizer does in hardware.

TPU-first data flow (v3, fully component-SoA):
- geometry arrives CORNER-MAJOR (3T, k) — exploded at asset insert like the
  reference's 52-byte visibility vertices (gltf/buffers/mesh/visibility.rs),
  because XLA gathers are the slowest primitive on TPU while reshapes are
  free. Per-corner reads are contiguous loads.
- small-table lookups (world matrices, normal matrices, per-mesh meta) go
  through ONE-HOT MATMULS on the MXU instead of gathers: onehot(T, cap) @
  table(cap, k) runs at matmul speed, ~100x the gather path for the table
  sizes a scene uses.
- ALL per-corner math runs on flat (T,) component vectors. Any tensor with
  a tiny minor dimension ((T,3,4) corners, (T,4,4) matrices) pads that
  minor dim to the 128-lane width in VMEM, so elementwise work runs at
  ~2-10% lane utilization — the einsum/stacked-corner form of this stage
  measured ~27 ms at 524k triangles where the (T,)-component form is a
  few ms. Matrices stay as (T,16)/(T,9) column tables; corners become
  [corner][component] lists of (T,) vectors.
- per-corner vertex ATTRIBUTES (uv/color/normal/tangent) ride in the setup
  rows; the rasterizer interpolates them per pixel (fat G-buffer), so the
  shading pass needs no per-triangle gathers at all. Near-plane-clipped
  sub-corners get bary-lerped attributes, keeping interpolation exact.

Static specialization flags (`has_morphs`, `skin_sets`) play the role of
the reference's shader-template variables (geometry/shader/cache_key.rs).

Output `setup` is SoA (NSETUP, 2T) f32 — lanes along triangles so the
rasterizer DMAs aligned 128-triangle chunks; every input triangle owns
columns i (primary) and T+i (secondary clip piece).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.meshes import (
    MI_FLAGS,
    MI_MATERIAL_ROW,
    MI_N_MORPH_TARGETS,
    MI_SKIN_SETS,
    MI_TRANSFORM_ROW,
    MESH_FLAG_DOUBLE_SIDED,
)

# ---- setup row indices (transposed SoA: (NSETUP, 2T)) ----------------------
# v4 PLANE-EQUATION layout: instead of raw corner positions, each triangle
# stores its three edge-function coefficient triples (E = A*px + B*py + C)
# and an affine NDC z-plane. The raster merge then evaluates coverage with
# 2 fused madds + 1 compare per edge instead of the ~9-op corner form —
# the merge ALU dominated the kernel (~40 of 48 ms at 1080p).
#
# Watertightness: A, B, C are built from exact-negation-symmetric forms
# (A = y1-y2, C = x1*y2 - x2*y1), so the neighbor sharing an edge computes
# EXACTLY -E at every pixel, and the top-left rule — derived in-kernel
# from the signs of A, B — assigns each shared-edge pixel to exactly one
# triangle (E >= t with t = top-left ? 0 : FLT_MIN_NORMAL; no f32 value
# lies strictly between 0 and FLT_MIN_NORMAL).
#
# The "valid" flag folds into E0C (invalid → -3e38: never covers); the
# per-triangle z-min for hi-Z is derived conservatively from the z-plane
# over the bbox (raster._chunk_zmin).
S_E0A, S_E0B, S_E0C = 0, 1, 2
S_E1A, S_E1B, S_E1C = 3, 4, 5
S_E2A, S_E2B, S_E2C = 6, 7, 8
S_ZA, S_ZB, S_ZC = 9, 10, 11
S_IW0, S_IW1, S_IW2 = 12, 13, 14
S_BB_MINX, S_BB_MINY, S_BB_MAXX, S_BB_MAXY = 15, 16, 17, 18
S_MAT_ROW = 19            # per-triangle material row (flat attribute)
S_TANGENT_W = 20          # tangent handedness (corner 0 — ±1, not blended)
# per-corner attributes (3 rows each per channel, corner-major: c0 c1 c2)
S_UV0 = 21                # u0,u1,u2, v0,v1,v2         (6 rows)
S_UV1 = 27                # 6 rows
S_COLOR = 33              # r*3, g*3, b*3, a*3         (12 rows)
S_NORMAL = 45             # nx*3, ny*3, nz*3           (9 rows)
S_TANGENT = 54            # tx*3, ty*3, tz*3           (9 rows)
S_ORIG_ID = 63            # original setup-column id (f32, exact to 2^24) —
                          # rides through the Morton sort so the raster can
                          # emit original ids directly (no 2M-px remap gather)
NSETUP = 64

# attribute channel order inside the per-corner bundle (channels 0..13 are
# interpolated triples matching S_UV0..S_TANGENT; channel 14 is tangent.w,
# emitted as the single S_TANGENT_W row): uv0.uv, uv1.uv, color.rgba,
# normal.xyz, tangent.xyz, tangent.w
NA = 15

_Z_EPS = 1e-6


def onehot_gather(rows: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """table[rows] via one-hot matmul on the MXU.

    rows (N,) i32 in [0, cap); table (cap, K) f32 → (N, K) f32. For the
    small capacity-padded scene tables this is far faster than XLA's
    gather lowering on TPU. The one-hot matrix is bf16 (0/1 are exact)
    with f32 accumulation — halves the dominant intermediate buffer."""
    cap = table.shape[0]
    oh = (rows[:, None] == jnp.arange(cap, dtype=rows.dtype)[None, :]).astype(jnp.bfloat16)
    return jnp.dot(oh, table, preferred_element_type=jnp.float32)


def onehot_gather_t(rows: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """table[rows].T via one-hot matmul: rows (N,), table (cap, K) →
    (K, N) f32, CHANNEL-MAJOR.

    The transposed orientation matters for layout, not just math: a
    (N, K) one-hot result gets a column-major TPU layout whose extracted
    columns are f32[N,1]{0,1:T(1,128)} — 1/8 vector utilization that
    then poisons every downstream elementwise op and inserts multi-ms
    relayout copies (profiled: three ~15 ms fusions + a dozen ~15 ms
    copies in the 1080p shade). A (K, N) result's rows are contiguous
    (N,) slices with the canonical rank-1 layout."""
    cap = table.shape[0]
    oh = (jnp.arange(cap, dtype=rows.dtype)[:, None] == rows[None, :]).astype(jnp.bfloat16)
    return jnp.dot(table.T, oh, preferred_element_type=jnp.float32)


def _corner_comps(arr, C):
    """(3C, T) component-major array → [corner][component] lists of (T,).

    Row c*C + k holds component k of corner c for every triangle — a
    contiguous (T,) slice. (The corner-major (3T, C) layout needed a
    stride-3C slice per component, which measured 30 ms/frame on TPU.)"""
    return [[arr[c * C + k] for k in range(C)] for c in range(3)]


def _mat4_point(m, p):
    """Row-major flat 4x4 columns m (list/(T,16)) times point (x,y,z,1).

    p: [x, y, z] of (T,); returns [x', y', z', w'] of (T,). Pure (T,)
    madds — XLA's batched tiny-dot lowering is ~20x slower."""
    x, y, z = p
    return [
        m[:, 4 * j + 0] * x + m[:, 4 * j + 1] * y + m[:, 4 * j + 2] * z
        + m[:, 4 * j + 3]
        for j in range(4)
    ]


def _mat3_vec(m, v, stride=3, rows=3):
    """Flat row-major matrix columns (T, >=stride*rows) times (x,y,z)."""
    x, y, z = v
    return [
        m[:, stride * j + 0] * x + m[:, stride * j + 1] * y
        + m[:, stride * j + 2] * z
        for j in range(rows)
    ]


def _const_mat4(vp, p):
    """Constant (4,4) matrix times per-corner [x,y,z,w] of (T,)."""
    return [
        vp[j, 0] * p[0] + vp[j, 1] * p[1] + vp[j, 2] * p[2] + vp[j, 3] * p[3]
        for j in range(4)
    ]


def _morton(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Interleave 16-bit x/y into a Z-order key (i32)."""

    def spread(v):
        v = v & 0xFFFF
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    return spread(x) | (spread(y) << 1)


def finish_setup(corners, attrs, act, mat_row, flags, width, height,
                 id_offset: int = 0, orig_ids=None):
    """Screen-map one output triangle set → ((T, NSETUP) setup rows,
    (T,) Morton sort key).

    corners: [c][x,y,z,w] clip-space (T,) components; attrs: [c][ch] of NA
    (T,) channels; act: (T,) active mask; flags: per-triangle mesh flags
    (double-sided). All math on (T,) vectors — see module docstring.

    The Z-order key (screen bbox center, invalid → MAX so padding sorts
    last) is computed here while the bboxes are live (T,) values: reading
    them back out of the assembled block is a strided slice, the exact
    layout hazard this stage avoids. The caller sorts ROWS of the
    row-major block (an HBM-friendly 256-B-row gather) and transposes
    once — permuting the transposed (NSETUP, T) block columns measured
    6 ms/frame at 524k triangles."""
    double_sided = (flags & MESH_FLAG_DOUBLE_SIDED) != 0
    w = [corners[c][3] for c in range(3)]
    iw = [1.0 / jnp.where(jnp.abs(wc) > 1e-20, wc, 1e-20) for wc in w]
    sx = [(corners[c][0] * iw[c] * 0.5 + 0.5) * width for c in range(3)]
    sy = [(0.5 - corners[c][1] * iw[c] * 0.5) * height for c in range(3)]
    z = [corners[c][2] * iw[c] for c in range(3)]

    # orientation: front faces are CW in y-down screen coords (negative
    # area here); swap corners 1<->2 so the rasterizer always sees
    # positive orientation (attributes swap along)
    area2 = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sx[2] - sx[0]) * (sy[1] - sy[0])
    front = area2 < 0.0
    keep = (front | double_sided) & act & (jnp.abs(area2) > 1e-12)

    def swp(a1, a2):
        return jnp.where(front, a2, a1), jnp.where(front, a1, a2)

    sx[1], sx[2] = swp(sx[1], sx[2])
    sy[1], sy[2] = swp(sy[1], sy[2])
    z[1], z[2] = swp(z[1], z[2])
    iw[1], iw[2] = swp(iw[1], iw[2])
    a1, a2 = [], []
    for ch in range(NA):
        v1, v2 = swp(attrs[1][ch], attrs[2][ch])
        a1.append(v1)
        a2.append(v2)
    attrs = [attrs[0], a1, a2]

    bb_minx = jnp.clip(jnp.minimum(jnp.minimum(sx[0], sx[1]), sx[2]), 0.0, float(width))
    bb_maxx = jnp.clip(jnp.maximum(jnp.maximum(sx[0], sx[1]), sx[2]), 0.0, float(width))
    bb_miny = jnp.clip(jnp.minimum(jnp.minimum(sy[0], sy[1]), sy[2]), 0.0, float(height))
    bb_maxy = jnp.clip(jnp.maximum(jnp.maximum(sy[0], sy[1]), sy[2]), 0.0, float(height))
    on_screen = (bb_maxx > bb_minx) & (bb_maxy > bb_miny)
    zmin = jnp.minimum(jnp.minimum(z[0], z[1]), z[2])
    zmax = jnp.maximum(jnp.maximum(z[0], z[1]), z[2])
    # triangles with any corner behind the near plane must have been
    # clipped before this point; reject any stragglers (w <= 0)
    w_ok = (w[0] > 0.0) & (w[1] > 0.0) & (w[2] > 0.0)
    valid = keep & on_screen & w_ok & (zmax >= 0.0) & (zmin <= 1.0)
    big = jnp.float32(3.0e38)
    bb_minx = jnp.where(valid, bb_minx, big)
    bb_miny = jnp.where(valid, bb_miny, big)
    bb_maxx = jnp.where(valid, bb_maxx, -big)
    bb_maxy = jnp.where(valid, bb_maxy, -big)

    T = area2.shape[0]
    if orig_ids is None:
        orig_id = jnp.float32(id_offset) + jnp.arange(T, dtype=jnp.float32)
    else:
        # compacted pools (overlay buckets) carry their ORIGINAL pool ids
        # so tri_id planes stay in pool space; clip copies keep the same
        # id (the fat kernels read ids from S_ORIG_ID, never row indices)
        orig_id = orig_ids.astype(jnp.float32)

    # ---- plane-equation setup (v4 layout, see row-index comment) ----------
    # edge i is opposite corner i; interior positive after the swap.
    # A = ya-yb and B = xb-xa are exact-negation-symmetric with the
    # neighbor triangle sharing the edge (subtraction is exactly
    # antisymmetric). C must NOT be the textbook xa*yb - xb*ya: XLA fuses
    # it into fma(xa, yb, -fl(xb*ya)), and the neighbor's
    # fma(xb, ya, -fl(xa*yb)) is NOT its exact negation — the two
    # triangles then both miss pixels whose center lies within a ulp of
    # the shared edge (measured: 10 pinholes along a box-face diagonal at
    # 128x64). Anchoring C = -(A*x + B*y) at the edge's CANONICAL
    # endpoint (smaller (y, x) — a winding-independent choice both
    # triangles make identically) restores bitwise negation symmetry:
    # fma of fully negated inputs rounds to the exact negation.
    ea = [sy[1] - sy[2], sy[2] - sy[0], sy[0] - sy[1]]
    eb = [sx[2] - sx[1], sx[0] - sx[2], sx[1] - sx[0]]

    def _edge_c(k, i, j):
        lt = (sy[i] < sy[j]) | ((sy[i] == sy[j]) & (sx[i] <= sx[j]))
        ax = jnp.where(lt, sx[i], sx[j])
        ay = jnp.where(lt, sy[i], sy[j])
        return -(ea[k] * ax + eb[k] * ay)

    ec = [_edge_c(0, 1, 2), _edge_c(1, 2, 0), _edge_c(2, 0, 1)]
    ec[0] = jnp.where(valid, ec[0], -big)       # invalid → never covers

    # affine NDC z-plane: z(px,py) = ZA*px + ZB*py + ZC (z is screen-affine)
    area_pos = jnp.where(front, -area2, area2)
    inv_area = 1.0 / jnp.where(jnp.abs(area_pos) > 1e-30, area_pos, 1.0)
    za = (z[0] * ea[0] + z[1] * ea[1] + z[2] * ea[2]) * inv_area
    zb = (z[0] * eb[0] + z[1] * eb[1] + z[2] * eb[2]) * inv_area
    zc = (z[0] * ec[0] + z[1] * ec[1] + z[2] * ec[2]) * inv_area

    rows = [ea[0], eb[0], ec[0], ea[1], eb[1], ec[1], ea[2], eb[2], ec[2],
            za, zb, zc, iw[0], iw[1], iw[2],
            bb_minx, bb_miny, bb_maxx, bb_maxy,
            mat_row, attrs[0][14]]
    for ch in range(14):
        rows += [attrs[0][ch], attrs[1][ch], attrs[2][ch]]
    rows.append(orig_id)

    cx = ((bb_minx + bb_maxx) * 0.5 / 8.0).astype(jnp.int32)
    cy = ((bb_miny + bb_maxy) * 0.5 / 8.0).astype(jnp.int32)
    key = _morton(jnp.clip(cx, 0, 0xFFFF), jnp.clip(cy, 0, 0xFFFF))
    key = jnp.where(valid, key, jnp.int32(0x7FFFFFFF))
    return jnp.stack(rows, axis=-1), key                    # (T, NSETUP)


@partial(
    jax.jit,
    static_argnames=("width", "height", "has_morphs", "skin_sets",
                     "needs_clip"),
)
def vertex_stage(
    c_pos,            # (9, T) f32 corner positions (component-major)
    c_norm,           # (9, T) f32
    c_tang,           # (12, T) f32
    c_uv0,            # (6, T) f32
    c_uv1,            # (6, T) f32
    c_color,          # (12, T) f32
    c_joints,         # (3*4*MAX_SKIN_SETS, T) i32 (global joint rows)
    c_weights,        # (3*4*MAX_SKIN_SETS, T) f32
    c_morph_base,     # (3, T) i32 row into morph_deltas, -1 none
    morph_deltas,     # (MD, 10) f32
    tri_mesh,         # (T,) i32
    mesh_info,        # (M, MESH_INFO_I32) i32
    morph_weights,    # (M, MAX_MORPH_TARGETS) f32
    world,            # (TC, 4, 4) f32
    normal_mat,       # (TC, 3, 3) f32
    joint_matrices,   # (J, 4, 4) f32
    view_proj,        # (4, 4) f32
    mesh_mask,        # (M,) bool — this pass's active meshes
    orig_ids=None,    # (T,) i32 original pool ids (compacted pools), or None
    *,
    width: int,
    height: int,
    has_morphs: bool,
    skin_sets: int,
    needs_clip: bool = True,
):
    """Returns (setup_rows (2T, NSETUP) f32, sort_key (2T,) i32) — or
    (T, NSETUP)/(T,) when needs_clip is False (host proved every visible
    AABB sits fully in front of the near plane, so the clipping machinery
    and the secondary output slots compile away; toggling the flag is a
    retrace, like any variant). The caller Morton-sorts the rows and
    transposes to the rasterizer's (NSETUP, T') layout (frame.py
    prep_setup)."""
    T = tri_mesh.shape[0]
    mesh = jnp.clip(tri_mesh, 0, mesh_info.shape[0] - 1)

    # per-triangle meta via one-hot matmuls (single fused fetch)
    # the pass mask rides the mesh-info one-hot fetch as an extra column —
    # a raw bool gather mesh_mask[mesh] measured 4.9 ms at 524k triangles
    minfo_f = onehot_gather(mesh, jnp.concatenate(
        [mesh_info.astype(jnp.float32),
         mesh_mask.astype(jnp.float32)[:, None]], axis=1))          # (T, K+1)
    tf_row = minfo_f[:, MI_TRANSFORM_ROW].astype(jnp.int32)
    mat_row = minfo_f[:, MI_MATERIAL_ROW]
    flags = minfo_f[:, MI_FLAGS].astype(jnp.int32)
    active = (minfo_f[:, -1] > 0.5) & (tri_mesh >= 0)

    pos = _corner_comps(c_pos, 3)      # [c][k] (T,)
    nrm = _corner_comps(c_norm, 3)
    tan = _corner_comps(c_tang, 4)
    uv0 = _corner_comps(c_uv0, 2)
    uv1 = _corner_comps(c_uv1, 2)
    vcol = _corner_comps(c_color, 4)

    # ---- morphs (reference: shared_wgsl/vertex/morph.wgsl:22-55) ----------
    if has_morphs:
        n_targets = minfo_f[:, MI_N_MORPH_TARGETS].astype(jnp.int32)
        stride = minfo_f[:, 4].astype(jnp.int32)  # MI_MORPH_STRIDE
        # unroll bound = weights-table width (a static shape): the table
        # widens in pow2 buckets to the scene's max target count
        # (core/meshes.py _ensure_morph_width), so arbitrary N works
        wts = onehot_gather(mesh, morph_weights)             # (T, bucket)
        for c in range(3):
            base_c = c_morph_base[c]
            for m in range(morph_weights.shape[1]):
                rows = jnp.clip(base_c + m * stride, 0, morph_deltas.shape[0] - 1)
                delta = morph_deltas[rows]                   # (T,10) gather
                mmask = ((m < n_targets) & (base_c >= 0)).astype(jnp.float32)
                wm = wts[:, m] * mmask
                for k in range(3):
                    pos[c][k] = pos[c][k] + wm * delta[:, k]
                    nrm[c][k] = nrm[c][k] + wm * delta[:, 3 + k]
                    tan[c][k] = tan[c][k] + wm * delta[:, 6 + k]
        # (tangent w is never morphed: deltas carry xyz only)

    # ---- model matrix: skin or node world (skin.wgsl:1-60 semantics) ------
    node_world = onehot_gather(tf_row, world.reshape(-1, 16))        # (T,16)
    node_nmat = onehot_gather(tf_row, normal_mat.reshape(-1, 9))     # (T,9)

    if skin_sets > 0:
        n_influences = 4 * skin_sets
        i_stride = c_joints.shape[0] // 3     # 4*MAX_SKIN_SETS rows/corner
        jm_flat = joint_matrices.reshape(-1, 16)
        is_skinned = minfo_f[:, MI_SKIN_SETS] > 0
        models = []
        for c in range(3):
            acc = None
            for i in range(n_influences):
                ji = jnp.clip(c_joints[c * i_stride + i], 0, jm_flat.shape[0] - 1)
                jm = jm_flat[ji]                              # (T,16) gather
                wi = c_weights[c * i_stride + i]
                term = jm * wi[:, None]
                acc = term if acc is None else acc + term
            models.append(jnp.where(is_skinned[:, None], acc, node_world))
    else:
        models = [node_world] * 3

    # ---- transform corners (pure (T,) madds) -------------------------------
    clip_c = []
    attrs = []
    for c in range(3):
        wp = _mat4_point(models[c], pos[c])
        clip_c.append(_const_mat4(view_proj, wp))
        if skin_sets > 0:
            nm = jnp.where((minfo_f[:, MI_SKIN_SETS] > 0)[:, None],
                           # skinned normal matrix = upper-left 3x3 of the
                           # skin matrix (reference uses the same shortcut)
                           jnp.concatenate([models[c][:, 0:3], models[c][:, 4:7],
                                            models[c][:, 8:11]], axis=1),
                           node_nmat)
        else:
            nm = node_nmat
        wn = _mat3_vec(nm, nrm[c])
        wt = _mat3_vec(
            jnp.concatenate([models[c][:, 0:3], models[c][:, 4:7],
                             models[c][:, 8:11]], axis=1),
            tan[c][:3])
        attrs.append([uv0[c][0], uv0[c][1], uv1[c][0], uv1[c][1],
                      vcol[c][0], vcol[c][1], vcol[c][2], vcol[c][3],
                      wn[0], wn[1], wn[2], wt[0], wt[1], wt[2], tan[c][3]])

    # ---- near-plane clipping (z_clip >= eps; [0,1] depth convention) -------
    if not needs_clip:
        return finish_setup(clip_c, attrs, active, mat_row, flags,
                            width, height, orig_ids=orig_ids)

    inside = [clip_c[c][2] > _Z_EPS for c in range(3)]
    n_in = (inside[0].astype(jnp.int32) + inside[1].astype(jnp.int32)
            + inside[2].astype(jnp.int32))
    first_in = jnp.where(inside[0], 0, jnp.where(inside[1], 1, 2))
    first_out = jnp.where(~inside[0], 0, jnp.where(~inside[1], 1, 2))
    rot = jnp.where(n_in == 1, first_in,
                    jnp.where(n_in == 2, first_out + 1, 0)) % 3

    def rotate3(per_corner):
        """Rotate corner lists by `rot` via selects (gathers are TPU-slow)."""
        cond1 = rot == 1
        cond2 = rot == 2
        out = []
        for c in range(3):
            comps = []
            for k in range(len(per_corner[0])):
                comps.append(jnp.where(
                    cond2, per_corner[(c + 2) % 3][k],
                    jnp.where(cond1, per_corner[(c + 1) % 3][k],
                              per_corner[c][k])))
            out.append(comps)
        return out

    a, b, c_ = rotate3(clip_c)
    aa_, ab_, ac_ = rotate3(attrs)
    za, zb, zcc = a[2], b[2], c_[2]

    def lerp_at(p, q, ap, aq, zp, zq):
        t = jnp.clip((_Z_EPS - zp)
                     / jnp.where(jnp.abs(zq - zp) > 1e-20, zq - zp, 1.0),
                     0.0, 1.0)
        pi = [pp + t * (qq - pp) for pp, qq in zip(p, q)]
        ai = [pp + t * (qq - pp) for pp, qq in zip(ap, aq)]
        return pi, ai

    i_ab, t_ab = lerp_at(a, b, aa_, ab_, za, zb)
    i_ac, t_ac = lerp_at(a, c_, aa_, ac_, za, zcc)
    i_bc, t_bc = lerp_at(b, c_, ab_, ac_, zb, zcc)

    one_in = n_in == 1
    two_in = n_in == 2

    def sel(cond, xs, ys):
        return [jnp.where(cond, x, y) for x, y in zip(xs, ys)]

    p0, pa0 = a, aa_
    p1 = sel(one_in, i_ab, b)
    pa1 = sel(one_in, t_ab, ab_)
    p2 = sel(one_in, i_ac, sel(two_in, i_bc, c_))
    pa2 = sel(one_in, t_ac, sel(two_in, t_bc, ac_))
    primary_active = active & (n_in > 0)
    s0, sa0 = a, aa_
    s1, sa1 = i_bc, t_bc
    s2, sa2 = i_ac, t_ac
    secondary_active = active & two_in

    rows_p, key_p = finish_setup([p0, p1, p2], [pa0, pa1, pa2],
                                 primary_active, mat_row, flags, width,
                                 height, orig_ids=orig_ids)
    rows_s, key_s = finish_setup([s0, s1, s2], [sa0, sa1, sa2],
                                 secondary_active, mat_row, flags,
                                 width, height, id_offset=T,
                                 orig_ids=orig_ids)
    return (jnp.concatenate([rows_p, rows_s], axis=0),      # (2T, NSETUP)
            jnp.concatenate([key_p, key_s], axis=0))
