"""Vertex stage: morph → skin → world → clip → screen-space triangle setup.

TPU-native replacement for the reference's geometry-pass vertex shader
(crates/renderer/src/render_passes/shared/shared_wgsl/vertex/apply_vertex.wgsl:25-120:
morphs → skins → instancing → model → view-proj) plus the fixed-function
triangle setup the GPU rasterizer does in hardware. Everything here is
plain jitted XLA: per-corner gathers + one big batched transform.

Static specialization flags (`has_morphs`, `skin_sets`) play the role of
the reference's shader-template variables (geometry/shader/cache_key.rs) —
changing one retraces, exactly like a shader-cache miss.

Output `setup` is SoA (NSETUP, T_pad) f32 — lanes along triangles so the
rasterizer DMAs aligned (rows, 128-triangle) chunks.
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

# setup row indices (transposed SoA: (NSETUP, T))
S_X0, S_Y0, S_X1, S_Y1, S_X2, S_Y2 = 0, 1, 2, 3, 4, 5
S_Z0, S_Z1, S_Z2 = 6, 7, 8
S_IW0, S_IW1, S_IW2 = 9, 10, 11
S_BB_MINX, S_BB_MINY, S_BB_MAXX, S_BB_MAXY = 12, 13, 14, 15
S_VALID = 16
S_SWAPPED = 17  # 1.0 when corners 1<->2 were swapped for orientation
NSETUP = 18

_W_EPS = 1e-6


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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
    """Returns (setup (NSETUP, T), corner_normal (T,3,3), corner_tangent (T,3,4))."""
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
        stride = minfo[:, MI_MORPH_STRIDE][:, None]  # (T, 1)
        n_targets = minfo[:, MI_N_MORPH_TARGETS][:, None]
        w = morph_weights[jnp.clip(mesh, 0, morph_weights.shape[0] - 1)]  # (T, MAXT)
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
        jm = joint_matrices[jnp.clip(j, 0, joint_matrices.shape[0] - 1)]  # (T,3,I,4,4)
        skin_mat = jnp.einsum("tci,tcijk->tcjk", jw, jm)  # (T, 3, 4, 4)
        is_skinned = (minfo[:, MI_SKIN_SETS] > 0)[:, None, None, None]
        model = jnp.where(is_skinned, skin_mat, node_world[:, None])  # (T,3,4,4)
        # normal matrix for skinned verts ~ skin matrix 3x3 (rigid/uniform
        # scale assumption, same as the reference's skin.wgsl)
        nmat = jnp.where(is_skinned, skin_mat[..., :3, :3], node_nmat[:, None])
    else:
        model = node_world[:, None]                # (T, 1, 4, 4) broadcast
        nmat = node_nmat[:, None]                  # (T, 1, 3, 3)

    # ---- transform corners -------------------------------------------------
    pos_h = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)  # (T,3,4)
    world_pos = jnp.einsum("tcjk,tck->tcj", jnp.broadcast_to(model, (T, 3, 4, 4)), pos_h)
    clip = jnp.einsum("jk,tck->tcj", view_proj, world_pos)               # (T,3,4)

    nmat_b = jnp.broadcast_to(nmat, (T, 3, 3, 3))
    world_nrm = jnp.einsum("tcjk,tck->tcj", nmat_b, nrm)
    # tangents transform by the model matrix 3x3 (not normal matrix)
    model_b = jnp.broadcast_to(model, (T, 3, 4, 4))
    world_tan_xyz = jnp.einsum("tcjk,tck->tcj", model_b[..., :3, :3], tan[..., :3])
    world_tan = jnp.concatenate([world_tan_xyz, tan[..., 3:4]], axis=-1)

    # ---- perspective divide + viewport -------------------------------------
    w = clip[..., 3]                               # (T, 3)
    valid_w = jnp.all(w > _W_EPS, axis=1)          # near-plane reject (TODO: clip)
    safe_w = jnp.where(jnp.abs(w) > _W_EPS, w, _W_EPS)
    inv_w = 1.0 / safe_w
    ndc = clip[..., :3] * inv_w[..., None]
    sx = (ndc[..., 0] * 0.5 + 0.5) * width         # (T, 3)
    sy = (0.5 - ndc[..., 1] * 0.5) * height        # y-down screen
    z = ndc[..., 2]

    # ---- orientation: signed area in y-down screen space -------------------
    # glTF front face is CCW in NDC; after the y flip it is CW in screen
    # coords, so front faces have NEGATIVE area here. Swap corners 1<->2 for
    # front faces so the rasterizer always sees positive orientation; for
    # back faces of double-sided meshes, keep order (already positive).
    area2 = (sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) - (
        sx[:, 2] - sx[:, 0]
    ) * (sy[:, 1] - sy[:, 0])
    front = area2 < 0.0
    double_sided = (minfo[:, MI_FLAGS] & MESH_FLAG_DOUBLE_SIDED) != 0
    keep = front | double_sided
    nondegenerate = jnp.abs(area2) > 1e-12

    def swapped(a):
        return jnp.where(front[:, None], jnp.stack([a[:, 0], a[:, 2], a[:, 1]], axis=1), a)

    sx_o, sy_o, z_o, iw_o = swapped(sx), swapped(sy), swapped(z), swapped(inv_w)

    valid = active & valid_w & keep & nondegenerate
    # screen bbox, clamped
    bb_minx = jnp.clip(jnp.min(sx_o, axis=1), 0.0, float(width))
    bb_maxx = jnp.clip(jnp.max(sx_o, axis=1), 0.0, float(width))
    bb_miny = jnp.clip(jnp.min(sy_o, axis=1), 0.0, float(height))
    bb_maxy = jnp.clip(jnp.max(sy_o, axis=1), 0.0, float(height))
    on_screen = (bb_maxx > bb_minx) & (bb_maxy > bb_miny)
    # z fully behind [0,1] also rejects
    zmin = jnp.min(z_o, axis=1)
    zmax = jnp.max(z_o, axis=1)
    valid = valid & on_screen & (zmax >= 0.0) & (zmin <= 1.0)

    setup = jnp.stack(
        [
            sx_o[:, 0], sy_o[:, 0], sx_o[:, 1], sy_o[:, 1], sx_o[:, 2], sy_o[:, 2],
            z_o[:, 0], z_o[:, 1], z_o[:, 2],
            iw_o[:, 0], iw_o[:, 1], iw_o[:, 2],
            bb_minx, bb_miny, bb_maxx, bb_maxy,
            valid.astype(jnp.float32),
            front.astype(jnp.float32),  # S_SWAPPED
        ],
        axis=0,
    )  # (NSETUP, T)

    # corner attrs stay in ORIGINAL corner order; the shading pass un-swaps
    # raster barycentrics using S_SWAPPED before interpolating.
    return setup, world_nrm, world_tan, world_pos[..., :3]
