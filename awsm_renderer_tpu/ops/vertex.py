"""Vertex stage: morph → skin → world → clip → near-plane clip → setup.

TPU-native replacement for the reference's geometry-pass vertex shader
(crates/renderer/src/render_passes/shared/shared_wgsl/vertex/apply_vertex.wgsl:25-120:
morphs → skins → instancing → model → view-proj) plus the fixed-function
triangle setup AND near-plane clipping the GPU rasterizer does in hardware.
Everything here is plain jitted XLA: per-corner gathers + batched math.

Near-plane clipping under static shapes: every input triangle maps to TWO
output slots (primary at column i, secondary at column T+i) — a triangle
fully in front keeps slot 1 and wastes slot 2; a triangle crossing the
near plane emits 1 or 2 clipped sub-triangles. Sub-triangle corners carry
their barycentric coordinates IN THE ORIGINAL TRIANGLE (rows S_BU*/S_BV*),
so the rasterizer emits original-triangle barycentrics and attribute
interpolation stays exact — no clipped-attribute problem, and no separate
orientation-swap flag (the mapping rows swap along with the coords).

Static specialization flags (`has_morphs`, `skin_sets`) play the role of
the reference's shader-template variables (geometry/shader/cache_key.rs).

Output `setup` is SoA (NSETUP, 2T) f32 — lanes along triangles so the
rasterizer DMAs aligned 128-triangle chunks. Corner attribute outputs
(normals/tangents/world pos) stay per ORIGINAL triangle (T, 3, ...);
shading recovers the original id as `tri_id % T`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.meshes import (
    MAX_MORPH_TARGETS,
    MI_FLAGS,
    MI_MORPH_STRIDE,
    MI_N_MORPH_TARGETS,
    MI_SKIN_SETS,
    MI_TRANSFORM_ROW,
    MESH_FLAG_DOUBLE_SIDED,
)

# setup row indices (transposed SoA: (NSETUP, 2T))
S_X0, S_Y0, S_X1, S_Y1, S_X2, S_Y2 = 0, 1, 2, 3, 4, 5
S_Z0, S_Z1, S_Z2 = 6, 7, 8
S_IW0, S_IW1, S_IW2 = 9, 10, 11
S_BB_MINX, S_BB_MINY, S_BB_MAXX, S_BB_MAXY = 12, 13, 14, 15
S_VALID = 16
# per-corner barycentrics of the ORIGINAL triangle (u = corner1 weight,
# v = corner2 weight); identity (0,1,0)/(0,0,1) for unclipped triangles
S_BU0, S_BU1, S_BU2 = 17, 18, 19
S_BV0, S_BV1, S_BV2 = 20, 21, 22
NSETUP = 24

_Z_EPS = 1e-6


@partial(
    jax.jit,
    static_argnames=("width", "height", "has_morphs", "skin_sets"),
)
def vertex_stage(
    v_pos,            # (V, 3) f32
    v_norm,           # (V, 3) f32
    v_tang,           # (V, 4) f32
    v_morph_base,     # (V,) i32
    v_joints,         # (V, 4*MAX_SKIN_SETS) i32 (global joint rows)
    v_weights,        # (V, 4*MAX_SKIN_SETS) f32
    morph_deltas,     # (MD, 10) f32
    tri_v,            # (T, 3) i32
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
):
    """Returns (setup (NSETUP, 2T), corner_normal (T,3,3),
    corner_tangent (T,3,4), corner_world (T,3,3))."""
    T = tri_v.shape[0]
    mesh = tri_mesh                                # (T,)
    minfo = mesh_info[jnp.clip(mesh, 0, mesh_info.shape[0] - 1)]   # (T, K)
    active = mesh_mask[jnp.clip(mesh, 0, mesh_mask.shape[0] - 1)] & (mesh >= 0)

    vids = tri_v                                   # (T, 3)
    pos = v_pos[vids]                              # (T, 3, 3)
    nrm = v_norm[vids]                             # (T, 3, 3)
    tan = v_tang[vids]                             # (T, 3, 4)

    # ---- morphs (reference: shared_wgsl/vertex/morph.wgsl:22-55) ----------
    if has_morphs:
        mbase = v_morph_base[vids]                 # (T, 3)
        stride = minfo[:, MI_MORPH_STRIDE][:, None]
        n_targets = minfo[:, MI_N_MORPH_TARGETS][:, None]
        w = morph_weights[jnp.clip(mesh, 0, morph_weights.shape[0] - 1)]
        for m in range(MAX_MORPH_TARGETS):
            rows = jnp.clip(mbase + m * stride, 0, morph_deltas.shape[0] - 1)
            delta = morph_deltas[rows]             # (T, 3, 10)
            mmask = ((m < n_targets) & (mbase >= 0)).astype(pos.dtype)[..., None]
            wm = w[:, m][:, None, None] * mmask
            pos = pos + wm * delta[..., 0:3]
            nrm = nrm + wm * delta[..., 3:6]
            tan = tan.at[..., 0:3].add(wm * delta[..., 6:9])

    # ---- model matrix: skin or node world (skin.wgsl:1-60 semantics) ------
    world_rows = jnp.clip(minfo[:, MI_TRANSFORM_ROW], 0, world.shape[0] - 1)
    node_world = world[world_rows]                 # (T, 4, 4)
    node_nmat = normal_mat[world_rows]             # (T, 3, 3)

    if skin_sets > 0:
        n_influences = 4 * skin_sets
        j = v_joints[vids][..., :n_influences]     # (T, 3, I)
        jw = v_weights[vids][..., :n_influences]   # (T, 3, I)
        jm = joint_matrices[jnp.clip(j, 0, joint_matrices.shape[0] - 1)]
        skin_mat = jnp.einsum("tci,tcijk->tcjk", jw, jm)  # (T, 3, 4, 4)
        is_skinned = (minfo[:, MI_SKIN_SETS] > 0)[:, None, None, None]
        model = jnp.where(is_skinned, skin_mat, node_world[:, None])
        # normal matrix for skinned verts ~ skin matrix 3x3 (rigid/uniform
        # scale assumption, same as the reference's skin.wgsl)
        nmat = jnp.where(is_skinned, skin_mat[..., :3, :3], node_nmat[:, None])
    else:
        model = node_world[:, None]                # (T, 1, 4, 4) broadcast
        nmat = node_nmat[:, None]                  # (T, 1, 3, 3)

    # ---- transform corners -------------------------------------------------
    pos_h = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
    world_pos = jnp.einsum("tcjk,tck->tcj", jnp.broadcast_to(model, (T, 3, 4, 4)), pos_h)
    clip = jnp.einsum("jk,tck->tcj", view_proj, world_pos)               # (T,3,4)

    nmat_b = jnp.broadcast_to(nmat, (T, 3, 3, 3))
    world_nrm = jnp.einsum("tcjk,tck->tcj", nmat_b, nrm)
    model_b = jnp.broadcast_to(model, (T, 3, 4, 4))
    world_tan_xyz = jnp.einsum("tcjk,tck->tcj", model_b[..., :3, :3], tan[..., :3])
    world_tan = jnp.concatenate([world_tan_xyz, tan[..., 3:4]], axis=-1)

    # ---- near-plane clipping (z_clip >= eps; [0,1] depth convention) -------
    zc = clip[..., 2]                               # (T, 3)
    inside = zc > _Z_EPS                            # (T, 3)
    n_in = jnp.sum(inside.astype(jnp.int32), axis=1)

    # rotate corners so the canonical pattern holds:
    #   n_in==1 -> inside corner first; n_in==2 -> outside corner LAST
    idx3 = jnp.arange(3, dtype=jnp.int32)
    first_in = jnp.argmax(inside, axis=1).astype(jnp.int32)       # (T,)
    first_out = jnp.argmax(~inside, axis=1).astype(jnp.int32)
    rot = jnp.where(n_in == 1, first_in, jnp.where(n_in == 2, first_out + 1, 0))
    order = (rot[:, None] + idx3[None, :]) % 3                     # (T, 3)

    corners = jnp.take_along_axis(clip, order[..., None], axis=1)  # (T,3,4)
    # original-bary one-hots, rotated alongside
    eye3 = jnp.eye(3, dtype=clip.dtype)
    baries = jnp.take_along_axis(
        jnp.broadcast_to(eye3[None], (T, 3, 3)), order[..., None], axis=1
    )                                                              # (T,3,3)

    a, b, c = corners[:, 0], corners[:, 1], corners[:, 2]
    ba, bb, bc_ = baries[:, 0], baries[:, 1], baries[:, 2]
    za, zb, zcc = a[:, 2], b[:, 2], c[:, 2]

    def lerp_at(p, q, bp, bq, zp, zq):
        t = ((_Z_EPS - zp) / jnp.where(jnp.abs(zq - zp) > 1e-20, zq - zp, 1.0))[:, None]
        t = jnp.clip(t, 0.0, 1.0)
        return p + t * (q - p), bp + t * (bq - bp)

    i_ab, b_ab = lerp_at(a, b, ba, bb, za, zb)
    i_ac, b_ac = lerp_at(a, c, ba, bc_, za, zcc)
    i_bc, b_bc = lerp_at(b, c, bb, bc_, zb, zcc)

    def sel(cond, x, y):
        return jnp.where(cond[:, None], x, y)

    one_in = n_in == 1
    two_in = n_in == 2
    # primary: n==3 -> (a,b,c); n==1 -> (a, I_ab, I_ac); n==2 -> (a, b, I_bc)
    p0, pb0 = a, ba
    p1 = sel(one_in, i_ab, b)
    pb1 = sel(one_in, b_ab, bb)
    p2 = sel(one_in, i_ac, sel(two_in, i_bc, c))
    pb2 = sel(one_in, b_ac, sel(two_in, b_bc, bc_))
    primary_active = active & (n_in > 0)
    # secondary: n==2 -> (a, I_bc, I_ac); else invalid
    s0, sb0 = a, ba
    s1, sb1 = i_bc, b_bc
    s2, sb2 = i_ac, b_ac
    secondary_active = active & two_in

    double_sided = (minfo[:, MI_FLAGS] & MESH_FLAG_DOUBLE_SIDED) != 0

    def finish(c0, c1, c2, q0, q1, q2, act):
        """Screen-map one output triangle set → (NSETUP, T) rows."""
        cc = jnp.stack([c0, c1, c2], axis=1)       # (T,3,4)
        qq = jnp.stack([q0, q1, q2], axis=1)       # (T,3,3) orig barys
        w = cc[..., 3]
        safe_w = jnp.where(jnp.abs(w) > 1e-20, w, 1e-20)
        inv_w = 1.0 / safe_w
        ndc = cc[..., :3] * inv_w[..., None]
        sx = (ndc[..., 0] * 0.5 + 0.5) * width
        sy = (0.5 - ndc[..., 1] * 0.5) * height    # y-down screen
        z = ndc[..., 2]

        # orientation: front faces are CW in y-down screen coords (negative
        # area with this formula); swap corners 1<->2 so the rasterizer
        # always sees positive orientation. The bary mapping rows swap too,
        # so emitted barycentrics stay in original corner space.
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
        valid = keep & on_screen & (zmax >= 0.0) & (zmin <= 1.0)
        # invalid triangles get an EMPTY bbox so chunk- and subgroup-level
        # bbox culling in the rasterizer skips them without reading S_VALID
        big = jnp.float32(3.0e38)
        bb_minx = jnp.where(valid, bb_minx, big)
        bb_miny = jnp.where(valid, bb_miny, big)
        bb_maxx = jnp.where(valid, bb_maxx, -big)
        bb_maxy = jnp.where(valid, bb_maxy, -big)

        return jnp.stack(
            [
                sx_o[:, 0], sy_o[:, 0], sx_o[:, 1], sy_o[:, 1], sx_o[:, 2], sy_o[:, 2],
                z_o[:, 0], z_o[:, 1], z_o[:, 2],
                iw_o[:, 0], iw_o[:, 1], iw_o[:, 2],
                bb_minx, bb_miny, bb_maxx, bb_maxy,
                valid.astype(jnp.float32),
                q_o[:, 0, 1], q_o[:, 1, 1], q_o[:, 2, 1],   # S_BU*: corner-1 weight
                q_o[:, 0, 2], q_o[:, 1, 2], q_o[:, 2, 2],   # S_BV*: corner-2 weight
                jnp.zeros_like(area2),
            ],
            axis=0,
        )

    setup_primary = finish(p0, p1, p2, pb0, pb1, pb2, primary_active)
    setup_secondary = finish(s0, s1, s2, sb0, sb1, sb2, secondary_active)
    setup = jnp.concatenate([setup_primary, setup_secondary], axis=1)  # (NSETUP, 2T)

    return setup, world_nrm, world_tan, world_pos[..., :3]
