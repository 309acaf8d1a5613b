"""Mesh store: pooled vertex/triangle/morph device arrays + per-mesh records.

Mirrors reference behavior: crates/renderer/src/meshes.rs (mesh store over
shared geometry GPU buffers with buddy allocation, refcounted MeshResource
sharing, per-mesh meta) + meshes/morphs.rs (global morph weight/value
buffers) + meshes/meta.rs (per-mesh geometry/material meta).

TPU-first redesign notes:
- The reference explodes triangles into 52-byte visibility vertices
  (gltf/buffers/mesh/visibility.rs) because WebGPU vertex fetch needs
  per-corner data. A TPU gathers: vertices stay INDEXED in SoA pools and
  the vertex stage gathers per *triangle corner* via ``tri_v``, then
  transforms by ``tri_mesh``'s world matrix. That makes instancing =
  duplicating 4 i32 per triangle (EXT_mesh_gpu_instancing inserts one mesh
  record per instance sharing the same vertex-pool range) and keeps the
  heavy attribute pools deduplicated.
- Pools are capacity-padded numpy mirrors of device arrays; growth doubles
  capacity (a recompile trigger, like the reference's buffer-resize →
  bind-group-recreate events).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..utils.allocator import BuddyAllocator, SlotAllocator
from .bounds import Aabb

F = np.float32
I = np.int32

# mesh_info i32 columns (device-side per-mesh meta, analog of MeshMeta:
# reference meshes/meta.rs GeometryMeshMeta + MaterialMeshMeta)
MI_TRANSFORM_ROW = 0
MI_MATERIAL_ROW = 1
MI_FLAGS = 2
MI_N_MORPH_TARGETS = 3
MI_MORPH_STRIDE = 4       # vertex count of the resource (targets step by this)
MI_SKIN_SETS = 5          # number of 4-joint influence sets (0 = unskinned)
MESH_INFO_I32 = 8

# flag bits
MESH_FLAG_HIDDEN = 1
MESH_FLAG_HUD = 2
MESH_FLAG_DOUBLE_SIDED = 4
MESH_FLAG_TRANSPARENT = 8

MAX_MORPH_TARGETS = 8  # static unroll bound (reference morph.wgsl unrolls then loops)
MAX_SKIN_SETS = 2      # JOINTS_0/JOINTS_1 (reference supports multiple sets, skins.rs)


@dataclass
class MeshGeometry:
    """CPU-side geometry for one primitive (already converted, indexed).

    The glTF pipeline produces this (analog of the reference's
    gltf/buffers.rs conversion output, but indexed instead of exploded).
    """

    positions: np.ndarray                      # (V, 3) f32
    indices: np.ndarray                        # (T, 3) i32 (triangle list)
    normals: Optional[np.ndarray] = None       # (V, 3)
    tangents: Optional[np.ndarray] = None      # (V, 4)
    uv0: Optional[np.ndarray] = None           # (V, 2)
    uv1: Optional[np.ndarray] = None           # (V, 2)
    color0: Optional[np.ndarray] = None        # (V, 4)
    joints: Optional[np.ndarray] = None        # (V, 4*S) local joint indices
    weights: Optional[np.ndarray] = None       # (V, 4*S) f32
    # morph targets: (M, V, 3) each; tangent deltas are xyz only
    morph_positions: Optional[np.ndarray] = None
    morph_normals: Optional[np.ndarray] = None
    morph_tangents: Optional[np.ndarray] = None
    aabb: Optional[Aabb] = None

    def __post_init__(self):
        self.positions = np.ascontiguousarray(self.positions, dtype=F).reshape(-1, 3)
        self.indices = np.ascontiguousarray(self.indices, dtype=I).reshape(-1, 3)
        if self.aabb is None:
            self.aabb = Aabb.from_points(self.positions)

    @property
    def vertex_count(self) -> int:
        return self.positions.shape[0]

    @property
    def triangle_count(self) -> int:
        return self.indices.shape[0]

    @property
    def morph_target_count(self) -> int:
        return 0 if self.morph_positions is None else self.morph_positions.shape[0]


@dataclass
class _Resource:
    """Refcounted pool allocation (reference: meshes.rs:303 MeshResource)."""

    v_base: int
    v_count: int
    t_capacity_per_instance: int
    n_morph_targets: int
    morph_base: int  # row into morph pool, -1 if none
    skin_sets: int
    aabb: Aabb
    refcount: int = 0


@dataclass
class _Mesh:
    """Reference: meshes/mesh.rs Mesh record."""

    resource_key: int
    transform_key: int
    material_key: int
    t_base: int
    t_count: int
    double_sided: bool = False
    transparent: bool = False
    hud: bool = False
    hidden: bool = False
    skin_key: Optional[int] = None
    world_aabb: Aabb = field(default_factory=Aabb.empty)


def _grow(arr: np.ndarray, capacity: int, fill=0) -> np.ndarray:
    out = np.full((capacity,) + arr.shape[1:], fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


class Meshes:
    def __init__(self, vertex_capacity: int = 1 << 12, triangle_capacity: int = 1 << 12,
                 mesh_capacity: int = 64, morph_capacity: int = 256):
        self._v_alloc = BuddyAllocator(vertex_capacity, min_block=64)
        self._t_alloc = BuddyAllocator(triangle_capacity, min_block=64)
        self._m_alloc = BuddyAllocator(morph_capacity, min_block=64)
        self._mesh_alloc = SlotAllocator(mesh_capacity)
        self._res_alloc = SlotAllocator(16)

        vc, tc, mc = self._v_alloc.capacity, self._t_alloc.capacity, self._m_alloc.capacity
        self.v_pos = np.zeros((vc, 3), dtype=F)
        self.v_norm = np.zeros((vc, 3), dtype=F)
        self.v_tang = np.zeros((vc, 4), dtype=F)
        self.v_uv0 = np.zeros((vc, 2), dtype=F)
        self.v_uv1 = np.zeros((vc, 2), dtype=F)
        self.v_color0 = np.ones((vc, 4), dtype=F)
        self.v_joints = np.zeros((vc, 4 * MAX_SKIN_SETS), dtype=I)
        self.v_weights = np.zeros((vc, 4 * MAX_SKIN_SETS), dtype=F)
        self.v_morph_base = np.full(vc, -1, dtype=I)
        # morph pool: rows of [dpos(3), dnorm(3), dtan(3), pad] = 10 f32
        # (reference: 10 f32/target/vtx, gltf/buffers/morph.rs)
        self.morph_deltas = np.zeros((mc, 10), dtype=F)
        self.tri_v = np.zeros((tc, 3), dtype=I)
        self.tri_mesh = np.full(tc, -1, dtype=I)

        meshc = self._mesh_alloc.capacity
        self.mesh_info = np.zeros((meshc, MESH_INFO_I32), dtype=I)
        self.morph_weights = np.zeros((meshc, MAX_MORPH_TARGETS), dtype=F)

        self._resources: Dict[int, _Resource] = {}
        self._meshes: Dict[int, _Mesh] = {}
        self.gpu_dirty = True
        self.capacity_changed = True

    # ---- resource management (geometry sharing) ---------------------------

    def insert_resource(self, geo: MeshGeometry) -> int:
        """Upload geometry into the pools; returns a resource key."""
        V, T = geo.vertex_count, geo.triangle_count
        v_base = self._v_alloc.alloc(V)
        if self._v_alloc.take_needs_resize():
            vc = self._v_alloc.capacity
            for name in ("v_pos", "v_norm", "v_tang", "v_uv0", "v_uv1", "v_color0",
                         "v_joints", "v_weights"):
                setattr(self, name, _grow(getattr(self, name), vc))
            self.v_morph_base = _grow(self.v_morph_base, vc, fill=-1)
            self.capacity_changed = True

        sl = slice(v_base, v_base + V)
        self.v_pos[sl] = geo.positions
        if geo.normals is not None:
            self.v_norm[sl] = np.asarray(geo.normals, F).reshape(V, 3)
        if geo.tangents is not None:
            self.v_tang[sl] = np.asarray(geo.tangents, F).reshape(V, 4)
        else:
            self.v_tang[sl] = [1, 0, 0, 1]
        if geo.uv0 is not None:
            self.v_uv0[sl] = np.asarray(geo.uv0, F).reshape(V, 2)
        if geo.uv1 is not None:
            self.v_uv1[sl] = np.asarray(geo.uv1, F).reshape(V, 2)
        if geo.color0 is not None:
            self.v_color0[sl] = np.asarray(geo.color0, F).reshape(V, 4)
        else:
            self.v_color0[sl] = 1.0

        skin_sets = 0
        if geo.joints is not None and geo.weights is not None:
            j = np.asarray(geo.joints, I).reshape(V, -1)
            w = np.asarray(geo.weights, F).reshape(V, -1)
            skin_sets = min(MAX_SKIN_SETS, j.shape[1] // 4)
            self.v_joints[sl, : skin_sets * 4] = j[:, : skin_sets * 4]
            self.v_weights[sl, : skin_sets * 4] = w[:, : skin_sets * 4]

        # morph targets
        M = geo.morph_target_count
        morph_base = -1
        if M:
            M = min(M, MAX_MORPH_TARGETS)
            morph_base = self._m_alloc.alloc(M * V)
            if self._m_alloc.take_needs_resize():
                self.morph_deltas = _grow(self.morph_deltas, self._m_alloc.capacity)
                self.capacity_changed = True
            rows = np.zeros((M, V, 10), dtype=F)
            rows[:, :, 0:3] = geo.morph_positions[:M]
            if geo.morph_normals is not None:
                rows[:, :, 3:6] = geo.morph_normals[:M]
            if geo.morph_tangents is not None:
                rows[:, :, 6:9] = geo.morph_tangents[:M][..., :3]
            self.morph_deltas[morph_base : morph_base + M * V] = rows.reshape(M * V, 10)
            self.v_morph_base[sl] = morph_base + np.arange(V, dtype=I)
        else:
            self.v_morph_base[sl] = -1

        key = self._res_alloc.insert()
        self._res_alloc.take_needs_resize()
        self._resources[key] = _Resource(
            v_base=v_base, v_count=V, t_capacity_per_instance=T,
            n_morph_targets=M, morph_base=morph_base, skin_sets=skin_sets,
            aabb=geo.aabb,
        )
        # stash indices (local) for mesh insertion
        self._resources[key].local_indices = geo.indices  # type: ignore[attr-defined]
        self.gpu_dirty = True
        return key

    # ---- mesh records ------------------------------------------------------

    def insert(self, resource_key: int, transform_row: int, material_row: int,
               transform_key: int, material_key: int, *, double_sided: bool = False,
               transparent: bool = False, hud: bool = False, hidden: bool = False,
               skin_key: Optional[int] = None, skin_joint_rows: Optional[np.ndarray] = None,
               initial_morph_weights: Optional[np.ndarray] = None) -> int:
        """Create a renderable mesh over a resource (reference: meshes.rs:455).

        `skin_joint_rows`: (J,) global joint-pool rows for this skin; vertex
        joint indices (local) were uploaded at resource insert and are
        rebased here by writing v_joints only once per resource+skin combo.
        """
        res = self._resources[resource_key]
        T = res.t_capacity_per_instance
        t_base = self._t_alloc.alloc(T)
        if self._t_alloc.take_needs_resize():
            tc = self._t_alloc.capacity
            self.tri_v = _grow(self.tri_v, tc)
            self.tri_mesh = _grow(self.tri_mesh, tc, fill=-1)
            self.capacity_changed = True

        key = self._mesh_alloc.insert()
        if self._mesh_alloc.take_needs_resize():
            mc = self._mesh_alloc.capacity
            self.mesh_info = _grow(self.mesh_info, mc)
            self.morph_weights = _grow(self.morph_weights, mc)
            self.capacity_changed = True
        row = self._mesh_alloc.row_of(key)

        local = self._resources[resource_key].local_indices  # type: ignore[attr-defined]
        self.tri_v[t_base : t_base + T] = local + res.v_base
        self.tri_mesh[t_base : t_base + T] = row

        if skin_joint_rows is not None and res.skin_sets:
            # rebase local joint indices to global joint-pool rows
            sl = slice(res.v_base, res.v_base + res.v_count)
            rows = np.asarray(skin_joint_rows, I)
            local = np.clip(self.v_joints[sl, : res.skin_sets * 4], 0, len(rows) - 1)
            self.v_joints[sl, : res.skin_sets * 4] = rows[local]

        flags = (
            (MESH_FLAG_HIDDEN if hidden else 0)
            | (MESH_FLAG_HUD if hud else 0)
            | (MESH_FLAG_DOUBLE_SIDED if double_sided else 0)
            | (MESH_FLAG_TRANSPARENT if transparent else 0)
        )
        self.mesh_info[row] = 0
        self.mesh_info[row, MI_TRANSFORM_ROW] = transform_row
        self.mesh_info[row, MI_MATERIAL_ROW] = material_row
        self.mesh_info[row, MI_FLAGS] = flags
        self.mesh_info[row, MI_N_MORPH_TARGETS] = res.n_morph_targets
        self.mesh_info[row, MI_MORPH_STRIDE] = res.v_count
        self.mesh_info[row, MI_SKIN_SETS] = res.skin_sets
        if initial_morph_weights is not None:
            w = np.zeros(MAX_MORPH_TARGETS, dtype=F)
            n = min(len(initial_morph_weights), MAX_MORPH_TARGETS)
            w[:n] = initial_morph_weights[:n]
            self.morph_weights[row] = w
        else:
            self.morph_weights[row] = 0.0

        res.refcount += 1
        self._meshes[key] = _Mesh(
            resource_key=resource_key, transform_key=transform_key,
            material_key=material_key, t_base=t_base, t_count=T,
            double_sided=double_sided, transparent=transparent, hud=hud,
            hidden=hidden, skin_key=skin_key,
        )
        self.gpu_dirty = True
        return key

    def insert_geometry(self, geo: MeshGeometry, transform_row: int, material_row: int,
                        transform_key: int, material_key: int, **kw) -> int:
        """Convenience: insert_resource + insert in one call."""
        rk = self.insert_resource(geo)
        return self.insert(rk, transform_row, material_row, transform_key, material_key, **kw)

    def remove(self, key: int) -> None:
        mesh = self._meshes.pop(key)
        self.tri_mesh[mesh.t_base : mesh.t_base + mesh.t_count] = -1
        self._t_alloc.free(mesh.t_base)
        row = self._mesh_alloc.row_of(key)
        self.mesh_info[row] = 0
        self._mesh_alloc.remove(key)
        res = self._resources[mesh.resource_key]
        res.refcount -= 1
        if res.refcount == 0:
            self._v_alloc.free(res.v_base)
            if res.morph_base >= 0:
                self._m_alloc.free(res.morph_base)
            self._res_alloc.remove(mesh.resource_key)
            del self._resources[mesh.resource_key]
        self.gpu_dirty = True

    def get(self, key: int) -> _Mesh:
        return self._meshes[key]

    def row_of(self, key: int) -> int:
        return self._mesh_alloc.row_of(key)

    def set_hidden(self, key: int, hidden: bool) -> None:
        mesh = self._meshes[key]
        mesh.hidden = hidden
        row = self._mesh_alloc.row_of(key)
        if hidden:
            self.mesh_info[row, MI_FLAGS] |= MESH_FLAG_HIDDEN
        else:
            self.mesh_info[row, MI_FLAGS] &= ~MESH_FLAG_HIDDEN
        self.gpu_dirty = True

    def update_morph_weights(self, key: int, weights) -> None:
        """Reference: morphs.rs update_morph_weights_with."""
        row = self._mesh_alloc.row_of(key)
        w = np.zeros(MAX_MORPH_TARGETS, dtype=F)
        n = min(len(weights), MAX_MORPH_TARGETS)
        w[:n] = np.asarray(weights, F)[:n]
        self.morph_weights[row] = w
        self.gpu_dirty = True

    def items(self):
        return self._meshes.items()

    @property
    def count(self) -> int:
        return len(self._meshes)

    # ---- per-frame world AABB update (reference: meshes.rs:872) ------------

    def update_world(self, transforms, changed_keys=None) -> None:
        """Batch-recompute world AABBs for meshes whose transform changed
        (native transform_aabbs; reference recomputes per mesh in Rust)."""
        from ..utils import native

        affected = [
            (key, mesh) for key, mesh in self._meshes.items()
            if changed_keys is None or mesh.transform_key in changed_keys
        ]
        if not affected:
            return
        rows = np.array(
            [transforms.row_of(m.transform_key) for _, m in affected], dtype=I)
        mins = np.stack([self._resources[m.resource_key].aabb.min for _, m in affected])
        maxs = np.stack([self._resources[m.resource_key].aabb.max for _, m in affected])
        omin, omax = native.transform_aabbs(
            rows, transforms.world.reshape(-1, 16), mins, maxs)
        for i, (_, mesh) in enumerate(affected):
            mesh.world_aabb = Aabb(omin[i], omax[i])

    def world_bounds(self) -> Tuple[np.ndarray, np.ndarray, List[int]]:
        """(mins, maxs, keys) for vectorized frustum culling."""
        keys = list(self._meshes.keys())
        if not keys:
            return np.zeros((0, 3), F), np.zeros((0, 3), F), keys
        mins = np.stack([self._meshes[k].world_aabb.min for k in keys])
        maxs = np.stack([self._meshes[k].world_aabb.max for k in keys])
        return mins, maxs, keys

    @property
    def vertex_capacity(self) -> int:
        return self._v_alloc.capacity

    @property
    def triangle_capacity(self) -> int:
        return self._t_alloc.capacity

    @property
    def mesh_capacity(self) -> int:
        return self._mesh_alloc.capacity
