"""Vertex stage: morph → skin → world → clip → near-plane clip → fat setup.

TPU-native replacement for the reference's geometry-pass vertex shader
(crates/renderer/src/render_passes/shared/shared_wgsl/vertex/apply_vertex.wgsl:25-120:
morphs → skins → instancing → model → view-proj) plus the fixed-function
triangle setup AND near-plane clipping the GPU rasterizer does in hardware.

TPU-first data flow (v2, gather-free):
- geometry arrives CORNER-MAJOR (3T, k) — exploded at asset insert like the
  reference's 52-byte visibility vertices (gltf/buffers/mesh/visibility.rs),
  because XLA gathers are the slowest primitive on TPU while reshapes are
  free. Per-corner reads are contiguous loads.
- small-table lookups (world matrices, normal matrices, per-mesh meta) go
  through ONE-HOT MATMULS on the MXU instead of gathers: onehot(T, cap) @
  table(cap, k) runs at matmul speed, ~100x the gather path for the table
  sizes a scene uses.
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
    MAX_MORPH_TARGETS,
    MI_FLAGS,
    MI_MATERIAL_ROW,
    MI_N_MORPH_TARGETS,
    MI_SKIN_SETS,
    MI_TRANSFORM_ROW,
    MESH_FLAG_DOUBLE_SIDED,
)

# ---- setup row indices (transposed SoA: (NSETUP, 2T)) ----------------------
S_X0, S_Y0, S_X1, S_Y1, S_X2, S_Y2 = 0, 1, 2, 3, 4, 5
S_Z0, S_Z1, S_Z2 = 6, 7, 8
S_IW0, S_IW1, S_IW2 = 9, 10, 11
S_BB_MINX, S_BB_MINY, S_BB_MAXX, S_BB_MAXY = 12, 13, 14, 15
S_VALID = 16
S_MAT_ROW = 17            # per-triangle material row (flat attribute)
# per-corner attributes (3 rows each per channel, corner-major: c0 c1 c2)
S_UV0 = 18                # u0,u1,u2, v0,v1,v2         (6 rows)
S_UV1 = 24                # 6 rows
S_COLOR = 30              # r*3, g*3, b*3, a*3         (12 rows)
S_NORMAL = 42             # nx*3, ny*3, nz*3           (9 rows)
S_TANGENT = 51            # tx*3, ty*3, tz*3, tw*3     (12 rows)
S_ORIG_ID = 63            # original setup-column id (f32, exact to 2^24) —
                          # rides through the Morton sort so the raster can
                          # emit original ids directly (no 2M-px remap gather)
NSETUP = 64

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



def _mat_corners(m, v, homogeneous: bool = False):
    """Per-triangle(/corner) matrix times corner vectors, elementwise.

    m: (T, 1|3, J, K) matrices (dim 1 broadcasts over corners);
    v: (T, 3, C) with C == K (or K-1 with homogeneous=True: implicit w=1).
    Returns (T, 3, J). Written as scalar-broadcast madds because XLA's TPU
    lowering of batched tiny dots (einsum "tcjk,tck->tcj") is ~20x slower.
    """
    J, K = m.shape[-2], m.shape[-1]
    C = v.shape[-1]
    comps = [v[..., k] for k in range(C)]
    outs = []
    for j in range(J):
        o = m[..., j, 0] * comps[0]
        for k in range(1, C):
            o = o + m[..., j, k] * comps[k]
        if homogeneous and C == K - 1:
            o = o + m[..., j, K - 1]
        outs.append(o)
    return jnp.stack(outs, axis=-1)


def _const_mat(m, v):
    """Constant (J,K) matrix times (..., K) vectors, elementwise madds."""
    J, K = m.shape
    comps = [v[..., k] for k in range(K)]
    return jnp.stack(
        [sum(m[j, k] * comps[k] for k in range(K)) for j in range(J)], axis=-1)


def finish_setup(c0, c1, c2, q0, q1, q2, act, mat_row, flags, width, height,
                 id_offset: int = 0):
    """Screen-map one output triangle set → (NSETUP, T) setup rows.

    c*: (T,4) clip-space corners; q*: (T,NA) per-corner attribute bundles;
    act: (T,) active mask; flags: per-triangle mesh flags (double-sided).
    """
    double_sided = (flags & MESH_FLAG_DOUBLE_SIDED) != 0
    cc = jnp.stack([c0, c1, c2], axis=1)       # (T,3,4)
    qq = jnp.stack([q0, q1, q2], axis=1)       # (T,3,NA)
    NA = qq.shape[-1]
    w = cc[..., 3]
    safe_w = jnp.where(jnp.abs(w) > 1e-20, w, 1e-20)
    inv_w = 1.0 / safe_w
    ndc = cc[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height    # y-down screen
    z = ndc[..., 2]

    # orientation: front faces are CW in y-down screen coords (negative
    # area here); swap corners 1<->2 so the rasterizer always sees
    # positive orientation (attributes swap along)
    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sx[:, 2] - sx[:, 0]
    ) * (sy[:, 1] - sy[:, 0])
    front = area2 < 0.0
    keep = (front | double_sided) & act & (jnp.abs(area2) > 1e-12)

    def swp(arr):
        return jnp.where(front[:, None], arr[:, jnp.array([0, 2, 1])], arr)

    sx_o = swp(sx)
    sy_o = swp(sy)
    z_o = swp(z)
    iw_o = swp(inv_w)
    q_o = jnp.where(front[:, None, None], qq[:, jnp.array([0, 2, 1])], qq)

    bb_minx = jnp.clip(jnp.min(sx_o, axis=1), 0.0, float(width))
    bb_maxx = jnp.clip(jnp.max(sx_o, axis=1), 0.0, float(width))
    bb_miny = jnp.clip(jnp.min(sy_o, axis=1), 0.0, float(height))
    bb_maxy = jnp.clip(jnp.max(sy_o, axis=1), 0.0, float(height))
    on_screen = (bb_maxx > bb_minx) & (bb_maxy > bb_miny)
    zmin = jnp.min(z_o, axis=1)
    zmax = jnp.max(z_o, axis=1)
    # triangles with any corner behind the near plane must have been
    # clipped before this point; reject any stragglers (w <= 0)
    w_ok = jnp.all(w > 0.0, axis=1)
    valid = keep & on_screen & w_ok & (zmax >= 0.0) & (zmin <= 1.0)
    big = jnp.float32(3.0e38)
    bb_minx = jnp.where(valid, bb_minx, big)
    bb_miny = jnp.where(valid, bb_miny, big)
    bb_maxx = jnp.where(valid, bb_maxx, -big)
    bb_maxy = jnp.where(valid, bb_maxy, -big)

    # Assemble (T, NSETUP) from 2D blocks, then ONE transpose. Stacking 64
    # separate (T,) rows makes XLA materialize each as a (1, T) buffer in a
    # column-major layout padded 128x on the unit dim (256 MB apiece at
    # Sponza scale — a 15 GB compile-time OOM).
    xy_interleaved = jnp.stack([sx_o, sy_o], axis=-1).reshape(-1, 6)  # x0 y0 x1 y1 x2 y2
    bbox = jnp.stack([bb_minx, bb_miny, bb_maxx, bb_maxy], axis=-1)   # (T, 4)
    scalars = jnp.stack([valid.astype(jnp.float32), mat_row], axis=-1)
    # attribute columns: channel-major, 3 corner entries per channel
    attrs_cols = jnp.swapaxes(q_o, 1, 2).reshape(-1, 3 * NA)          # (T, 3*NA)
    orig_id = (jnp.float32(id_offset)
               + jnp.arange(area2.shape[0], dtype=jnp.float32))[:, None]
    setup_t = jnp.concatenate(
        [xy_interleaved, z_o, iw_o, bbox, scalars, attrs_cols, orig_id], axis=1)
    return setup_t.T                                                   # (NSETUP, T)


@partial(
    jax.jit,
    static_argnames=("width", "height", "has_morphs", "skin_sets",
                     "needs_clip"),
)
def vertex_stage(
    c_pos,            # (3T, 3) f32 corner positions (corner-major)
    c_norm,           # (3T, 3) f32
    c_tang,           # (3T, 4) f32
    c_uv0,            # (3T, 2) f32
    c_uv1,            # (3T, 2) f32
    c_color,          # (3T, 4) f32
    c_joints,         # (3T, 4*MAX_SKIN_SETS) i32 (global joint rows)
    c_weights,        # (3T, 4*MAX_SKIN_SETS) f32
    c_morph_base,     # (3T,) i32 row into morph_deltas, -1 none
    morph_deltas,     # (MD, 10) f32
    tri_mesh,         # (T,) i32
    mesh_info,        # (M, MESH_INFO_I32) i32
    morph_weights,    # (M, MAX_MORPH_TARGETS) f32
    world,            # (TC, 4, 4) f32
    normal_mat,       # (TC, 3, 3) f32
    joint_matrices,   # (J, 4, 4) f32
    view_proj,        # (4, 4) f32
    mesh_mask,        # (M,) bool — this pass's active meshes
    *,
    width: int,
    height: int,
    has_morphs: bool,
    skin_sets: int,
    needs_clip: bool = True,
):
    """Returns setup (NSETUP, 2T) f32 — or (NSETUP, T) when needs_clip is
    False (host proved every visible AABB sits fully in front of the near
    plane, so the clipping machinery and the secondary output slots
    compile away; toggling the flag is a retrace, like any variant)."""
    T = tri_mesh.shape[0]
    mesh = jnp.clip(tri_mesh, 0, mesh_info.shape[0] - 1)

    # per-triangle meta via one-hot matmuls (single fused fetch)
    minfo_f = onehot_gather(mesh, mesh_info.astype(jnp.float32))     # (T, K)
    tf_row = minfo_f[:, MI_TRANSFORM_ROW].astype(jnp.int32)
    mat_row = minfo_f[:, MI_MATERIAL_ROW]
    flags = minfo_f[:, MI_FLAGS].astype(jnp.int32)
    active = mesh_mask[mesh] & (tri_mesh >= 0)

    pos = c_pos.reshape(T, 3, 3)
    nrm = c_norm.reshape(T, 3, 3)
    tan = c_tang.reshape(T, 3, 4)

    # ---- morphs (reference: shared_wgsl/vertex/morph.wgsl:22-55) ----------
    if has_morphs:
        mbase = c_morph_base.reshape(T, 3)
        n_targets = minfo_f[:, MI_N_MORPH_TARGETS].astype(jnp.int32)[:, None]
        stride = minfo_f[:, 4].astype(jnp.int32)[:, None]  # MI_MORPH_STRIDE
        w = onehot_gather(mesh, morph_weights)             # (T, MAXT)
        pos_f = pos
        nrm_f = nrm
        tan_f = tan
        for m in range(MAX_MORPH_TARGETS):
            rows = jnp.clip(mbase + m * stride, 0, morph_deltas.shape[0] - 1)
            delta = morph_deltas[rows]                     # (T,3,10) gather
            mmask = ((m < n_targets) & (mbase >= 0)).astype(pos.dtype)[..., None]
            wm = w[:, m][:, None, None] * mmask
            pos_f = pos_f + wm * delta[..., 0:3]
            nrm_f = nrm_f + wm * delta[..., 3:6]
            tan_f = tan_f.at[..., 0:3].add(wm * delta[..., 6:9])
        pos, nrm, tan = pos_f, nrm_f, tan_f

    # ---- model matrix: skin or node world (skin.wgsl:1-60 semantics) ------
    node_world = onehot_gather(tf_row, world.reshape(-1, 16)).reshape(T, 4, 4)
    node_nmat = onehot_gather(tf_row, normal_mat.reshape(-1, 9)).reshape(T, 3, 3)

    if skin_sets > 0:
        n_influences = 4 * skin_sets
        j = c_joints.reshape(T, 3, -1)[..., :n_influences]
        jw = c_weights.reshape(T, 3, -1)[..., :n_influences]
        jm = joint_matrices[jnp.clip(j, 0, joint_matrices.shape[0] - 1)]
        skin_mat = jnp.einsum("tci,tcijk->tcjk", jw, jm)   # (T,3,4,4)
        is_skinned = (minfo_f[:, MI_SKIN_SETS] > 0)[:, None, None, None]
        model = jnp.where(is_skinned, skin_mat, node_world[:, None])
        nmat = jnp.where(is_skinned, skin_mat[..., :3, :3], node_nmat[:, None])
    else:
        model = node_world[:, None]
        nmat = node_nmat[:, None]

    # ---- transform corners -------------------------------------------------
    # explicit scalar-broadcast madds, NOT einsum: XLA lowers batched tiny
    # (4,4)@(4,) dots catastrophically on TPU (measured ~10 ms at 524k
    # triangles; this form is ~0.5 ms — pure VPU elementwise work)
    world_pos = _mat_corners(model, pos, homogeneous=True)             # (T,3,4)
    clip = _const_mat(view_proj, world_pos)                            # (T,3,4)

    world_nrm = _mat_corners(nmat, nrm)                                # (T,3,3)
    world_tan_xyz = _mat_corners(model[..., :3, :3], tan[..., :3])
    world_tan = jnp.concatenate([world_tan_xyz, tan[..., 3:4]], axis=-1)

    # per-corner attribute bundle, lerped through clipping: (T, 3, A)
    attrs = jnp.concatenate(
        [c_uv0.reshape(T, 3, 2), c_uv1.reshape(T, 3, 2),
         c_color.reshape(T, 3, 4), world_nrm, world_tan], axis=-1)
    NA = attrs.shape[-1]   # 15

    # ---- near-plane clipping (z_clip >= eps; [0,1] depth convention) -------
    if not needs_clip:
        return finish_setup(
            clip[:, 0], clip[:, 1], clip[:, 2],
            attrs[:, 0], attrs[:, 1], attrs[:, 2], active,
            mat_row, flags, width, height)

    zc = clip[..., 2]
    inside = zc > _Z_EPS
    n_in = jnp.sum(inside.astype(jnp.int32), axis=1)

    first_in = jnp.argmax(inside, axis=1).astype(jnp.int32)
    first_out = jnp.argmax(~inside, axis=1).astype(jnp.int32)
    rot = jnp.where(n_in == 1, first_in, jnp.where(n_in == 2, first_out + 1, 0)) % 3

    def rotate3(arr):
        """Rotate corners by `rot` via selects (gathers are TPU-slow)."""
        r1 = arr[:, jnp.array([1, 2, 0])]
        r2 = arr[:, jnp.array([2, 0, 1])]
        cond1 = (rot == 1)[:, None, None]
        cond2 = (rot == 2)[:, None, None]
        return jnp.where(cond2, r2, jnp.where(cond1, r1, arr))

    corners = rotate3(clip)
    cattrs = rotate3(attrs)

    a, b, c = corners[:, 0], corners[:, 1], corners[:, 2]
    aa_, ab_, ac_ = cattrs[:, 0], cattrs[:, 1], cattrs[:, 2]
    za, zb, zcc = a[:, 2], b[:, 2], c[:, 2]

    def lerp_at(p, q, ap, aq, zp, zq):
        t = ((_Z_EPS - zp) / jnp.where(jnp.abs(zq - zp) > 1e-20, zq - zp, 1.0))[:, None]
        t = jnp.clip(t, 0.0, 1.0)
        return p + t * (q - p), ap + t * (aq - ap)

    i_ab, t_ab = lerp_at(a, b, aa_, ab_, za, zb)
    i_ac, t_ac = lerp_at(a, c, aa_, ac_, za, zcc)
    i_bc, t_bc = lerp_at(b, c, ab_, ac_, zb, zcc)

    def sel(cond, x, y):
        return jnp.where(cond[:, None], x, y)

    one_in = n_in == 1
    two_in = n_in == 2
    p0, pa0 = a, aa_
    p1 = sel(one_in, i_ab, b)
    pa1 = sel(one_in, t_ab, ab_)
    p2 = sel(one_in, i_ac, sel(two_in, i_bc, c))
    pa2 = sel(one_in, t_ac, sel(two_in, t_bc, ac_))
    primary_active = active & (n_in > 0)
    s0, sa0 = a, aa_
    s1, sa1 = i_bc, t_bc
    s2, sa2 = i_ac, t_ac
    secondary_active = active & two_in

    setup_primary = finish_setup(p0, p1, p2, pa0, pa1, pa2, primary_active,
                                 mat_row, flags, width, height)
    setup_secondary = finish_setup(s0, s1, s2, sa0, sa1, sa2, secondary_active,
                                   mat_row, flags, width, height,
                                   id_offset=clip.shape[0])
    return jnp.concatenate([setup_primary, setup_secondary], axis=1)  # (NSETUP, 2T)
