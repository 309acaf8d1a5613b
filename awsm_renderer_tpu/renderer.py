"""AwsmRendererTpu — the renderer facade.

Mirrors the reference facade (crates/renderer/src/lib.rs:77-381 AwsmRenderer
+ update.rs update_all + render.rs render + picker.rs pick): key-based
stores, per-frame dirty flush to device arrays (the write_gpu x10 block of
render.rs:73-97 becomes per-store device_put of changed mirrors), frustum
cull + pass bucketing host-side, then ONE jitted frame function.
"""

from __future__ import annotations

from typing import Dict, Optional

from .errors import ConfigError

import jax
import jax.numpy as jnp
import numpy as np

from .config import RendererConfig
from .core.animation import Animations
from .core.camera import CameraState
from .core.environment import Environment
from .core.frustum import Frustum
from .core.lights import LIGHT_F32, Lights
from .core.materials import Materials
from .core.meshes import (
    MESH_FLAG_HIDDEN, MESH_FLAG_HUD, MESH_FLAG_TRANSPARENT, Meshes, MeshGeometry,
)
from .core.skins import Skins
from .core.textures import Textures
from .core.transforms import Transform, Transforms
from .ops.brdf_lut import generate_brdf_lut
from .passes.frame import render_frame
from .utils.profiling import RenderTimings

# compaction-unit height of the opaque deferred shade: (th, 128) units.
# 8 = the native f32 tile. r4 MEASURED anti-lesson: th=1 strips LOSE
# (34.6 vs 31.0 ms on the stress bench) — coverage at 1x128 granularity
# is 61.3% vs 62.4% at 8x128 (the scene is horizontally dense; sky gaps
# are sub-128px), so 8x finer units shave ~1% of compact pixels while
# adding a 16k-key argsort + 16k-row take/scatter and losing the free
# 8-sublane tile relabeling (scripts/bench_pixel_compact.py --cov).
OPAQUE_TILE_ROWS = 8


class AwsmRendererTpu:
    def __init__(self, config: Optional[RendererConfig] = None):
        self.config = config or RendererConfig()
        self.transforms = Transforms()
        self.meshes = Meshes()
        self.materials = Materials()
        self.lights = Lights()
        self.textures = Textures()
        self.skins = Skins()
        self.animations = Animations()
        self.camera = CameraState()
        self.environment = Environment()
        self._device: Dict[str, object] = {}
        self._env_rows64 = None        # image-env quad rows appended to texels
        self._mask_cache: Dict[str, tuple] = {}  # name -> (np copy, device array)
        self._brdf_lut = None
        self._last_tri_id = None   # device plane kept for picking
        self._mesh_row_to_key: Dict[int, int] = {}
        self._tri_mesh_device_order = None  # compact-order tri->mesh map
        self._inst_tri_mesh = []            # per-group tri->mesh maps (appended)
        self._mega = None                   # lazy MegaTexture atlas collection
        self._skipped_renderables = set()   # §5.3 skip-and-warn bookkeeping
        self._mesh_flush_gen = 0            # bumps on every mesh flush
        self._content_epoch = 0             # non-camera store flush counter
        self._temporal = None               # TAA state: hist/age/prev_vp/epoch
        # per-pass spans gated like the reference's AwsmRendererLogging
        # { render_timings } (debug.rs:9-12; spans in render.rs:56-356)
        self.timings = RenderTimings(enabled=False)

    # ---- content helpers ----------------------------------------------------

    @property
    def mega_texture(self):
        """Atlas collection over the shared texel pool (reference:
        renderer-core texture/mega_texture.rs). Batch adds go through
        this directly (add_image ... then finalize()); one-off adds can
        use add_atlas_image below."""
        if self._mega is None:
            from .core.mega_texture import MegaTexture

            self._mega = MegaTexture(self.textures)
        return self._mega

    def add_atlas_image(self, image, ttype=None, wrap: bool = True):
        """Pack an image into the mega-texture atlas and return a
        TextureRef usable in any material texture slot (the entry's UV
        offset/scale ride the KHR-transform table; `wrap` keeps REPEAT
        semantics inside the sub-rect)."""
        from .core.mega_texture import TextureType

        entry = self.mega_texture.add_image(
            image, ttype if ttype is not None else TextureType.ALBEDO,
            wrap=wrap)
        self.mega_texture.finalize()
        return entry.texture_ref

    def add_mesh(
        self,
        geometry: MeshGeometry,
        material_key: int,
        transform: Optional[Transform] = None,
        parent: Optional[int] = None,
        transform_key: Optional[int] = None,
        *,
        hud: bool = False,
        hidden: bool = False,
        skin_key: Optional[int] = None,
        initial_morph_weights=None,
    ) -> int:
        """Insert geometry + mesh record; routes transparency from the
        material (reference: materials.rs is_transparency_pass)."""
        if transform_key is None:
            transform_key = self.transforms.insert(transform, parent)
            self.transforms.update_world()
        mat = self.materials.get(material_key)
        skin_rows = self.skins.joint_rows(skin_key) if skin_key is not None else None
        key = self.meshes.insert_geometry(
            geometry,
            self.transforms.row_of(transform_key),
            self.materials.row_of(material_key),
            transform_key,
            material_key,
            double_sided=getattr(mat, "double_sided", False),
            transparent=self.materials.is_transparency_pass(material_key),
            hud=hud,
            hidden=hidden,
            skin_key=skin_key,
            skin_joint_rows=skin_rows,
            initial_morph_weights=initial_morph_weights,
        )
        self.meshes.update_world(self.transforms, {transform_key})
        return key

    def add_instanced_mesh(self, geometry: MeshGeometry, material_key: int,
                           transforms) -> list:
        """Insert one geometry resource rendered under many transforms
        (reference: instances.rs + EXT_mesh_gpu_instancing — one shared
        MeshResource, one mesh record per instance)."""
        rk = self.meshes.insert_resource(geometry)
        mat = self.materials.get(material_key)
        tks = [self.transforms.insert(tr) for tr in transforms]
        self.transforms.update_world()
        keys = self.meshes.insert_instanced(
            rk, [(self.transforms.row_of(t), t) for t in tks],
            self.materials.row_of(material_key), material_key,
            double_sided=getattr(mat, "double_sided", False),
            transparent=self.materials.is_transparency_pass(material_key))
        self.meshes.update_world(self.transforms)
        return keys

    # ---- runtime reconfiguration (reference: anti_alias.rs set_anti_aliasing,
    # post_process.rs set_post_processing — pipeline rebuilds become retraces)

    def set_anti_aliasing(self, aa) -> None:
        from dataclasses import replace

        self.config = replace(self.config, anti_aliasing=aa)

    def set_post_processing(self, pp) -> None:
        from dataclasses import replace

        self.config = replace(self.config, post_processing=pp)

    @property
    def logging_timings(self) -> bool:
        return self.timings.enabled

    @logging_timings.setter
    def logging_timings(self, v: bool) -> None:
        self.timings.enabled = bool(v)

    def remove_all(self) -> None:
        """Clear the whole scene and rebuild renderer state (reference:
        lib.rs:117-128 remove_all). jit trace caches are process-global
        so recompiles are NOT paid again; the device-array dict and mask
        cache are rebuilt on the next flush."""
        cfg = self.config
        self.__init__(cfg)

    # ---- per-frame update (reference: update.rs:8-19) ------------------------

    def update_all(self, dt: float, view=None, projection=None) -> None:
        self.animations.update(dt, self.transforms, self.meshes)
        changed = self.transforms.update_world()
        if changed:
            self.meshes.update_world(self.transforms, changed)
            self.skins.update_transforms(self.transforms, changed)
        if view is not None and projection is not None:
            self.camera.update(view, projection)

    # ---- device flush (reference: render.rs:73-97 write_gpu block) ----------

    def _flush(self, jitter_px=None, prev_view_proj=None) -> Dict[str, object]:
        d = self._device
        # content epoch: bumped whenever any non-camera store reaches the
        # device this flush — the temporal history (render_frame_temporal)
        # is valid only while scene CONTENT is unchanged; camera motion is
        # what reprojection exists for and must NOT reset it
        self.skins.flush_pending(self.transforms)
        if (self.transforms.gpu_dirty or self.meshes.gpu_dirty
                or self.materials.gpu_dirty or self.lights.gpu_dirty
                or self.textures.gpu_dirty or self.environment.gpu_dirty
                or self.skins.gpu_dirty):
            self._content_epoch += 1
        if self._brdf_lut is None:
            self._brdf_lut = generate_brdf_lut(
                size=64 if jax.default_backend() == "cpu" else 256,
                samples=64 if jax.default_backend() == "cpu" else 512,
            )
            d["brdf_lut"] = self._brdf_lut

        t = self.transforms
        if t.gpu_dirty:
            d["world"] = jnp.asarray(t.world)
            d["normal_mat"] = jnp.asarray(t.normal)
            t.gpu_dirty = False

        m = self.meshes
        if m.gpu_dirty:
            # corner pools upload COMPONENT-MAJOR (3*C, T): the vertex
            # stage does all math on flat (T,) component rows (a strided
            # (3T,C)[:, c, k] slice measured 30 ms/frame at 524k tris;
            # a contiguous row is free). Host pools stay corner-major for
            # O(1) inserts; the transpose happens once per dirty upload.
            # Upload only LIVE triangle rows (stable-order compaction of
            # the buddy pool): the resolve gather, vertex stage and
            # binner all scale with the device pool extent, and pow2
            # block rounding leaves the pool ~2x the scene (491520-row
            # extent for 259404 live tris costs +23 ms/frame in the
            # resolve gather alone — see Meshes.live_triangle_rows).
            # The gather rides the transpose copy this upload already
            # pays; device tri ids are compact-order (picking goes
            # through the flushed tri_mesh, kept on self).
            mesh_span = self.timings.span("write_gpu/meshes")
            mesh_span.__enter__()
            corners = (
                ("c_pos", 3), ("c_norm", 3), ("c_tang", 4), ("c_uv0", 2),
                ("c_uv1", 2), ("c_color", 4),
                ("c_joints", None), ("c_weights", None),
            )

            def _slice_cm(name, c, rows):
                """(cnt,) host rows → component-major (3c, cnt) block."""
                arr = getattr(m, name)
                cc = c if c is not None else arr.shape[1]
                return np.ascontiguousarray(
                    arr.reshape(-1, 3, cc)[rows].transpose(1, 2, 0)
                    .reshape(3 * cc, rows.size))

            plan = m.device_updates()
            # triangle-layout generation: bump ONLY when the device pool
            # layout changed (full re-upload / append / tombstone / inst
            # edits) — a morph-weight or flag edit also sets gpu_dirty,
            # and bumping the gen for those forced the overlay tri-idx
            # cache (an np.isin scan over the whole pool, ~ms) to rebuild
            # EVERY animated frame
            if plan[0] == "full" or plan[1] or m.inst_groups_changed:
                self._mesh_flush_gen += 1
            if plan[0] == "full":
                _, idx, dead = plan
                for name, c in corners:
                    d[name] = jnp.asarray(_slice_cm(name, c, idx))
                d["c_morph_base"] = jnp.asarray(
                    np.ascontiguousarray(m.c_morph_base.reshape(-1, 3)[idx].T))
                tri_mesh_c = m.tri_mesh[idx].copy()
                tri_mesh_c[dead] = -1
                self._tri_mesh_device_order = tri_mesh_c
                d["tri_mesh"] = jnp.asarray(tri_mesh_c)
            else:
                # dirty-range updates: on-device dynamic_update_slice per
                # edited span (buffer/helpers.rs semantics) — the full-pool
                # host transpose + upload is NOT paid
                for s, rows, dead in plan[1]:
                    if rows is None:       # tombstone: mask the stale rows
                        n = dead
                        self._tri_mesh_device_order[s : s + n] = -1
                        d["tri_mesh"] = jax.lax.dynamic_update_slice(
                            d["tri_mesh"], jnp.full((n,), -1, jnp.int32), (s,))
                        continue
                    for name, c in corners:
                        d[name] = jax.lax.dynamic_update_slice(
                            d[name], jnp.asarray(_slice_cm(name, c, rows)),
                            (0, s))
                    d["c_morph_base"] = jax.lax.dynamic_update_slice(
                        d["c_morph_base"],
                        jnp.asarray(np.ascontiguousarray(
                            m.c_morph_base.reshape(-1, 3)[rows].T)), (0, s))
                    tri_mesh_c = m.tri_mesh[rows].copy()
                    tri_mesh_c[dead] = -1
                    self._tri_mesh_device_order[s : s + rows.size] = tri_mesh_c
                    d["tri_mesh"] = jax.lax.dynamic_update_slice(
                        d["tri_mesh"], jnp.asarray(tri_mesh_c), (s,))
            if m.morph_pool_dirty or "morph_deltas" not in d:
                d["morph_deltas"] = jnp.asarray(m.morph_deltas)
                m.morph_pool_dirty = False
            for name in ("mesh_info", "morph_weights"):
                d[name] = jnp.asarray(getattr(m, name))

            # instanced groups: ONE corner upload per group + a tiny
            # per-instance mesh-row vector (instances.rs: one instance
            # buffer, shared geometry). The frame tiles these at trace
            # time (passes/frame.py::_combined_geometry).
            if m.inst_groups_changed:
                live_gids = {gid for gid, _ in m.inst_group_items()}
                for k in [k for k in d
                          if k.startswith("inst") and "_" in k
                          and k[4:].split("_", 1)[0].isdigit()
                          and int(k[4:].split("_", 1)[0]) not in live_gids]:
                    del d[k]
                m.inst_groups_changed = False
            self._inst_tri_mesh = []
            for gid, grp in m.inst_group_items():
                rows = np.array(
                    [m._mesh_alloc.row_of(k) for k in grp.mesh_keys], np.int32)
                if grp.dirty or f"inst{gid}_rows" not in d:
                    for name, arr in grp.corners.items():
                        d[f"inst{gid}_{name}"] = jnp.asarray(arr)
                    d[f"inst{gid}_live"] = jnp.asarray(grp.livemask)
                    d[f"inst{gid}_rows"] = jnp.asarray(rows)
                    grp.dirty = False
                # host mirror for picking: device tri order appends the
                # groups after the pool, instances in row order
                tpl = np.where(grp.livemask, 0, -1).astype(np.int32)
                self._inst_tri_mesh.append(
                    np.where(np.tile(tpl, rows.size) < 0, -1,
                             np.repeat(rows, grp.livemask.size)))
            m.gpu_dirty = False
            self._mesh_row_to_key = {row: key for key, row in m._mesh_alloc.items()}
            mesh_span.__exit__(None, None, None)

        mats = self.materials
        if mats.gpu_dirty:
            d["mat_float"] = jnp.asarray(mats.float_data)
            d["mat_tex"] = jnp.asarray(mats.tex_slots)
            d["mat_flags"] = jnp.asarray(mats.flags)
            mats.gpu_dirty = False

        if self.lights.gpu_dirty or "lights" not in d:
            cap = max(8, 1 << (max(self.lights.count, 1) - 1).bit_length())
            d["lights"] = jnp.asarray(self.lights.packed(cap))
            d["n_lights"] = jnp.int32(self.lights.count)
            self.lights.gpu_dirty = False

        tx = self.textures
        e = self.environment
        if tx.gpu_dirty or e.gpu_dirty or "texels" not in d:
            if e.gpu_dirty or "skybox" not in d:
                from .ops.cubemap import pack_cubemap

                sky_p = pack_cubemap(e.skybox)
                irr_p = pack_cubemap(e.irradiance)
                pref_p = pack_cubemap(e.prefiltered)
                d["skybox"] = jnp.asarray(sky_p)
                d["prefiltered"] = jnp.asarray(pref_p)
                d["irradiance"] = jnp.asarray(irr_p)
                if e.is_solid:
                    # solid env: shading reads face-0 constants; nothing
                    # rides the texel pool
                    self._env_rows64 = None
                else:
                    # image env: the same quad rows, widened to texel-row
                    # width (bf16 — the reference's KTX2 env path is
                    # Rg11b10ufloat, cubemap/ktx.rs, so bf16 ≥ parity),
                    # appended to the texel pool below: ONE promoted
                    # gather table for material + env taps (shade reads
                    # them via ds["env_pool_base"])
                    from .core.textures import TEXEL_COLS

                    env16 = np.concatenate(
                        [sky_p, irr_p, pref_p.reshape(-1, 16)], axis=0)
                    blk = np.zeros((env16.shape[0], TEXEL_COLS),
                                   dtype=tx.texels_packed.dtype)
                    blk[:, :16] = env16
                    self._env_rows64 = blk
                e.gpu_dirty = False
            if tx.gpu_dirty:
                d["tex_desc"] = jnp.asarray(tx.descriptors)
                d["tex_transforms"] = jnp.asarray(tx.tex_transforms)
                tx.gpu_dirty = False
            if self._env_rows64 is None:
                d.pop("env_pool_base", None)
                d["texels"] = jnp.asarray(tx.texels_packed)
            else:
                d["env_pool_base"] = jnp.int32(tx.texels_packed.shape[0])
                d["texels"] = jnp.asarray(np.concatenate(
                    [tx.texels_packed, self._env_rows64], axis=0))

        if self.skins.gpu_dirty or "joint_matrices" not in d:
            d["joint_matrices"] = jnp.asarray(self.skins.joint_matrices)
            self.skins.gpu_dirty = False

        # temporal mode repacks every frame (the jitter and prev matrices
        # change per frame); toggling it also forces a repack so the
        # camera pytree structure tracks the mode
        want_nj = jitter_px is not None
        have_nj = "view_proj_nj" in d.get("camera", {})
        if (self.camera.gpu_dirty or "camera" not in d or want_nj
                or have_nj != want_nj):
            cam = self.camera.packed(
                viewport=(self.config.width, self.config.height),
                jitter_px=jitter_px)
            if prev_view_proj is not None:
                cam["prev_view_proj"] = prev_view_proj
            d["camera"] = {k: jnp.asarray(v) for k, v in cam.items()}
            self.camera.gpu_dirty = False
        return d

    # ---- pass bucketing (reference: renderable.rs collect_renderables) ------

    def _mesh_masks(self) -> Dict[str, np.ndarray]:
        """Frustum cull + pass bucketing, fully vectorized over the
        cached world-bounds arrays (the per-mesh python loop cost
        ~3 ms/frame at 237 meshes on the animated bench — reference
        collect_renderables is an O(meshes) Rust loop, ours must not be
        an O(meshes) interpreter loop)."""
        cap = self.meshes.mesh_capacity
        opaque = np.zeros(cap, dtype=bool)
        transparent = np.zeros(cap, dtype=bool)
        hud = np.zeros(cap, dtype=bool)
        needs_clip = False
        mins, maxs, keys = self.meshes.world_bounds()
        if keys:
            rows = self.meshes.world_rows()
            info = self.meshes.mesh_info
            frustum = Frustum(self.camera.view_projection)
            visible = frustum.intersects_aabbs(mins, maxs)
            in_front = frustum.fully_in_front_of_near(mins, maxs)
            needs_clip = bool((~in_front).any())
            # per-renderable failure recovery (SURVEY §5.3; reference
            # render.rs warns and skips a renderable it cannot draw
            # rather than killing the frame): bad bounds (NaN world
            # matrix / degenerate geometry) or dangling store rows skip
            # THAT mesh with a one-time warning
            finite = (np.isfinite(mins).all(axis=1)
                      & np.isfinite(maxs).all(axis=1))
            mat_ok = ((info[rows, 1] >= 0)
                      & (info[rows, 1] < max(self.materials.capacity, 1)))
            tf_ok = ((info[rows, 0] >= 0)
                     & (info[rows, 0] < max(self.transforms.capacity, 1)))
            ok = finite & mat_ok & tf_ok
            if not ok.all():
                import warnings

                for i in np.nonzero(~ok)[0]:
                    key = keys[i]
                    if key in self._skipped_renderables:
                        continue
                    self._skipped_renderables.add(key)
                    bad = ("non-finite world bounds" if not finite[i]
                           else (f"material row {info[rows[i], 1]} out of "
                                 f"range" if not mat_ok[i]
                                 else f"transform row {info[rows[i], 0]} "
                                      f"out of range"))
                    warnings.warn(
                        f"skipping mesh {key}: {bad} (frame continues "
                        f"without it)", RuntimeWarning, stacklevel=3)
            if self._skipped_renderables:
                self._skipped_renderables &= {
                    keys[i] for i in np.nonzero(~ok)[0]}
            flags = info[rows, 2]
            hidden = (flags & MESH_FLAG_HIDDEN) != 0
            hud_f = (flags & MESH_FLAG_HUD) != 0
            transp = (flags & MESH_FLAG_TRANSPARENT) != 0
            live = ok & ~hidden
            hud[rows[live & hud_f]] = True
            vis_live = live & ~hud_f & visible
            transparent[rows[vis_live & transp]] = True
            opaque[rows[vis_live & ~transp]] = True
        return {"opaque": opaque, "transparent": transparent, "hud": hud,
                "needs_clip": needs_clip}

    def _overlay_tri_idx(self, masks):
        """Compacted overlay triangle ids: pool indices of every triangle
        belonging to a transparent/HUD mesh, power-of-2 padded with -1
        (static-bucketed, so growth retraces at most log2(T) times).
        Returns None (= use the full pool) when an overlay mesh lives in
        an instanced group, or nothing is live. Cached by mask content —
        the np.isin scan over the pool costs ~ms and masks are static
        between scene edits."""
        mask = masks["transparent"] | masks["hud"]
        tm = self._tri_mesh_device_order
        if tm is None or not mask.any():
            return None
        rows = np.where(mask)[0]
        if self._inst_tri_mesh and any(
                np.isin(g, rows).any() for g in self._inst_tri_mesh):
            return None
        cached = self._mask_cache.get("ov_tri_idx")
        if (cached is not None and cached[1] == self._mesh_flush_gen
                and np.array_equal(cached[0], mask)):
            return cached[2]
        sel = np.where(np.isin(tm, rows))[0].astype(np.int32)
        if sel.size == 0:
            return None
        cap = max(128, 1 << (int(sel.size) - 1).bit_length())
        out = np.full(cap, -1, np.int32)
        out[: sel.size] = sel
        dev = jnp.asarray(out)
        self._mask_cache["ov_tri_idx"] = (mask.copy(), self._mesh_flush_gen, dev)
        return dev

    def _anim_tri_idx(self):
        """Pool triangle indices of every mesh with morph targets or a
        skin, pow2-padded with -1 — the animated-subset vertex split
        (passes/frame.py _run_vertex): morph/skin vertex math gathers
        scale with the POOL size (+33 ms/frame at 262k tris measured on
        the r4 animated bench), so only this compact subset pays them,
        like the reference's per-mesh morph/skin shader variants
        (geometry/pipeline.rs). None = nothing animated, no device
        layout yet, or an animated mesh lives in an instanced group
        (whose corners aren't pool-indexable). Cached per mesh-layout
        generation — weight/pose changes don't alter the SET."""
        cached = self._mask_cache.get("anim_tri_idx")
        if cached is not None and cached[0] == self._mesh_flush_gen:
            return cached[1]
        info = self.meshes.mesh_info
        anim_rows = np.where((info[:, 3] > 0) | (info[:, 5] > 0))[0]
        tm = self._tri_mesh_device_order
        if anim_rows.size == 0 or tm is None:
            self._mask_cache["anim_tri_idx"] = (self._mesh_flush_gen, None)
            return None
        if self._inst_tri_mesh and any(
                np.isin(g, anim_rows).any() for g in self._inst_tri_mesh):
            self._mask_cache["anim_tri_idx"] = (self._mesh_flush_gen, None)
            return None
        sel = np.where(np.isin(tm, anim_rows))[0].astype(np.int32)
        if sel.size == 0:
            dev = None
        else:
            cap = max(128, 1 << (int(sel.size) - 1).bit_length())
            out = np.full(cap, -1, np.int32)
            out[: sel.size] = sel
            dev = jnp.asarray(out)
        self._mask_cache["anim_tri_idx"] = (self._mesh_flush_gen, dev)
        return dev

    def _overlay_crop(self, masks):
        """Screen row band covered by transparent/HUD geometry:
        (y0 row offset, bucketed static band height), or None = full.

        Projects the bucket's world AABB corners through the camera and
        quantizes the row range to 32-row multiples with a power-of-2
        height bucket, so camera motion changes only a TRACED offset and
        band growth retraces at most log2(H) times. Any AABB touching or
        crossing the near plane disables cropping (its screen extent is
        unbounded)."""
        mask = masks["transparent"] | masks["hud"]
        rh1 = ((self.config.height + 7) // 8) * 8
        mins, maxs, keys = self.meshes.world_bounds()
        if not keys:
            return None
        sel = np.nonzero(mask[self.meshes.world_rows()])[0]
        if sel.size == 0:
            return None
        mn = mins[sel]
        mx = maxs[sel]
        # 8 corners per box: (N, 8, 3)
        corners = np.stack([
            np.stack([np.where(b & 1, mx[:, 0], mn[:, 0]),
                      np.where(b & 2, mx[:, 1], mn[:, 1]),
                      np.where(b & 4, mx[:, 2], mn[:, 2])], axis=-1)
            for b in range(8)], axis=1)
        vp = np.asarray(self.camera.view_projection, np.float32)
        h = corners.reshape(-1, 3)
        clip = h @ vp[:3, :3].T + vp[:3, 3]
        w = h @ vp[3, :3] + vp[3, 3]
        if (w <= 1e-6).any():
            return None
        sy = (0.5 - 0.5 * clip[:, 1] / w) * rh1
        y0 = int(np.clip(np.floor(sy.min()), 0, rh1))
        y1 = int(np.clip(np.ceil(sy.max()), 0, rh1))
        y0q = (y0 // 32) * 32
        y1q = -(-y1 // 32) * 32
        b = 32
        while b < y1q - y0q:
            b *= 2
        if b >= rh1:
            return None
        y0q = max(0, min(y0q, rh1 - b))
        return y0q, b

    def _transparent_layer_bound(self, masks):
        """PROVEN upper bound on per-pixel transparent depth complexity,
        or None when unprovable: every visible transparent mesh must be
        a verified-convex resource (core/meshes._is_convex), so it
        contributes at most 1 front-facing fragment per ray (2 when
        double-sided); the bound is then the max point-stab of the
        multiplicity-weighted projected-AABB screen rects (the
        _bucket_tile_cap 2-D stamp, max instead of popcount). Drives a
        static clamp of the K-layer peel: peels the bound proves empty
        (and their runtime skip conds) compile away — on the stress
        bench the 12-pane glass ring proves depth<=2, halving K=4. This
        is exact, not approximate: layers beyond the bound cannot
        receive fragments, so the clamped composite is bit-identical."""
        mask = masks["transparent"]
        mins, maxs, keys = self.meshes.world_bounds()
        if not keys:
            return None
        sel = np.nonzero(mask[self.meshes.world_rows()])[0]
        if sel.size == 0:
            return None
        mult = []
        for i in sel:
            mesh = self.meshes.get(keys[i])
            res = self.meshes._resources.get(mesh.resource_key)
            if res is None or not res.convex:
                return None
            mult.append(2 if mesh.double_sided else 1)
        mn, mx = mins[sel], maxs[sel]
        corners = np.stack([
            np.stack([np.where(b & 1, mx[:, 0], mn[:, 0]),
                      np.where(b & 2, mx[:, 1], mn[:, 1]),
                      np.where(b & 4, mx[:, 2], mn[:, 2])], axis=-1)
            for b in range(8)], axis=1)
        vp = np.asarray(self.camera.view_projection, np.float32)
        h = corners.reshape(-1, 3)
        clip = h @ vp[:3, :3].T + vp[:3, 3]
        w = h @ vp[3, :3] + vp[3, 3]
        if (w <= 1e-6).any():
            return None     # near-plane crossing: unbounded screen rect
        WW = max(self.config.width, 1)
        HH = max(self.config.height, 1)
        sx = ((0.5 + 0.5 * clip[:, 0] / w) * WW).reshape(-1, 8)
        sy = ((0.5 - 0.5 * clip[:, 1] / w) * HH).reshape(-1, 8)
        # 8px-grid point-stab stamp (1px safety pad); over-counting is
        # safe (rects only ever EXPAND onto grid cells)
        gx = max(WW // 8, 1)
        gy = max(HH // 8, 1)
        x0 = np.clip(np.floor((sx.min(1) - 1) / 8), 0, gx - 1).astype(int)
        x1 = np.clip(np.floor((sx.max(1) + 1) / 8), 0, gx - 1).astype(int)
        y0 = np.clip(np.floor((sy.min(1) - 1) / 8), 0, gy - 1).astype(int)
        y1 = np.clip(np.floor((sy.max(1) + 1) / 8), 0, gy - 1).astype(int)
        m = np.asarray(mult, np.int32)
        acc = np.zeros((gy + 1, gx + 1), np.int32)
        np.add.at(acc, (y0, x0), m)
        np.add.at(acc, (y0, x1 + 1), -m)
        np.add.at(acc, (y1 + 1, x0), -m)
        np.add.at(acc, (y1 + 1, x1 + 1), m)
        return int(acc.cumsum(0).cumsum(1)[:-1, :-1].max())

    def _bucket_tile_cap(self, masks, bucket: str,
                         tile_h: int = 8, tile_w: int = 128):
        """Upper bound on the (tile_h x tile_w) raster tiles one pass
        bucket can cover: per-mesh projected-AABB screen rects,
        tile-quantized (1 px safety pad), union-counted — over-counting
        is always safe — then quantized so camera motion retraces
        boundedly. Transparent buckets round up to the next power of two
        (few covered tiles, log2(n_tiles) retraces max); the opaque
        bucket typically covers 40-75% of the frame, so it quantizes in
        ~n_tiles/16 steps instead (a pow2 round-up past 50% would always
        clear the worth-it bar). Drives the covered-tile compaction of
        the K-layer transparent peel+shade (32x32 binned-raster tiles,
        rasterize_layers_compact / shade_transparent_compact32) and the
        deferred opaque shade (8x128 native tiles,
        shade_deferred_compact_c). None = empty bucket, a mesh crosses
        the near plane (unbounded screen extent), or the bound would not
        pay for itself."""
        mask = masks[bucket]
        rw1 = ((self.config.width + 127) // 128) * 128
        rh1 = ((self.config.height + 7) // 8) * 8
        # tile grid over the raster-padded viewport (the 32x32 binned
        # grid pads rows to a 32-multiple; rw1 is already one for cols)
        rh_t = -(-rh1 // tile_h) * tile_h
        n_tiles = (rh_t // tile_h) * (rw1 // tile_w)
        mins, maxs, keys = self.meshes.world_bounds()
        if not keys:
            return None
        sel = np.nonzero(mask[self.meshes.world_rows()])[0]
        if sel.size == 0:
            return None
        mn, mx = mins[sel], maxs[sel]
        corners = np.stack([
            np.stack([np.where(b & 1, mx[:, 0], mn[:, 0]),
                      np.where(b & 2, mx[:, 1], mn[:, 1]),
                      np.where(b & 4, mx[:, 2], mn[:, 2])], axis=-1)
            for b in range(8)], axis=1)                      # (N, 8, 3)
        vp = np.asarray(self.camera.view_projection, np.float32)
        h = corners.reshape(-1, 3)
        clip = h @ vp[:3, :3].T + vp[:3, 3]
        w = h @ vp[3, :3] + vp[3, 3]
        if (w <= 1e-6).any():
            return None
        sx = ((0.5 + 0.5 * clip[:, 0] / w) * rw1).reshape(-1, 8)
        sy = ((0.5 - 0.5 * clip[:, 1] / w) * rh1).reshape(-1, 8)
        ntx, nty = rw1 // tile_w, rh_t // tile_h
        # the overlay band's tile grid can sit up to (tile_h - 8) rows
        # off this frame-aligned grid (_overlay_crop clamps y0 to
        # rh1 - band_h, an 8-multiple); expand the rects by that slack
        # so the count still bounds the band-grid coverage. Sub-8-row
        # units (the strip-compacted opaque shade) are frame-aligned:
        # no slack, and never negative.
        slack = max(0, tile_h - 8)
        tx0 = np.clip(np.floor((sx.min(1) - 1) / tile_w), 0, ntx - 1).astype(int)
        tx1 = np.clip(np.floor((sx.max(1) + 1) / tile_w), 0, ntx - 1).astype(int)
        ty0 = np.clip(np.floor((sy.min(1) - 1 - slack) / tile_h), 0, nty - 1).astype(int)
        ty1 = np.clip(np.floor((sy.max(1) + 1 + slack) / tile_h), 0, nty - 1).astype(int)
        # union of the per-mesh tile rects (overlapping meshes — e.g. a
        # ring of panes around the camera target — over-count a plain
        # rect-area sum by several x); 2-D prefix-sum stamp, then popcount
        acc = np.zeros((nty + 1, ntx + 1), np.int32)
        np.add.at(acc, (ty0, tx0), 1)
        np.add.at(acc, (ty0, tx1 + 1), -1)
        np.add.at(acc, (ty1 + 1, tx0), -1)
        np.add.at(acc, (ty1 + 1, tx1 + 1), 1)
        cap = int(np.count_nonzero(
            acc.cumsum(axis=0).cumsum(axis=1)[:-1, :-1]))
        if cap <= 0:
            return None
        if bucket == "opaque":
            # ~n_tiles/32 steps: at 1080p the AABB union runs ~130 tiles
            # over the true coverage, and the pow2-of-n/16 step added up
            # to another 127 — the finer step shaves ~6% of compact-shade
            # pixels for at most one extra retrace bucket
            step = max(64, 1 << max(0, (n_tiles // 32 - 1)).bit_length())
            capb = -(-cap // step) * step
            if capb * 8 >= n_tiles * 7:   # <12.5% sky: not worth a retrace
                return None
            return capb
        # geometric 1.25x buckets (32-aligned) instead of pow2: the K-layer
        # compact peel + shade scale with this cap, and a pow2 round-up
        # wastes up to 2x; ~34 buckets over a 2k-tile grid keeps retraces
        # as bounded as the old log2 scheme in practice
        capb = 64
        while capb < cap:
            capb = -(-(capb * 5 // 4) // 32) * 32
        if capb * 4 >= n_tiles * 3:
            return None
        return capb

    # ---- render (reference: render.rs:53-383) --------------------------------

    def _bucket_mat_rows(self, mesh_mask: np.ndarray) -> np.ndarray:
        """Material rows referenced by the meshes in one pass bucket —
        the basis for per-pass shading specialization (the reference
        specializes its transparent pipelines per (buffer_info, material):
        material_transparent/shader/cache_key.rs)."""
        info = self.meshes.mesh_info
        m = mesh_mask[: info.shape[0]]
        rows = np.unique(info[m, 1])
        return rows[(rows >= 0) & (rows < max(self.materials.capacity, 1))]

    def _ext_mask(self, mat_rows: Optional[np.ndarray] = None) -> tuple:
        """Which material extensions any scene material uses — static
        shading specialization (extension WGSL is feature-gated in the
        reference; here unused extensions compile away). mat_rows
        restricts the scan to one pass bucket's materials."""
        from .core import materials as M

        if mat_rows is not None and mat_rows.size == 0:
            return (False,) * 6
        f = self.materials.float_data
        slots = self.materials.tex_slots[:, :, 0]
        if mat_rows is not None:
            f = f[mat_rows]
            slots = slots[mat_rows]
        return (
            bool((f[:, M.MF_CLEARCOAT] > 0).any() or (slots[:, M.TS_CLEARCOAT] >= 0).any()),
            bool((f[:, M.MF_SHEEN_COLOR:M.MF_SHEEN_COLOR + 3] > 0).any()),
            bool((f[:, M.MF_IRIDESCENCE] > 0).any()),
            bool((np.abs(f[:, M.MF_ANISOTROPY_STRENGTH]) > 0).any()),
            bool((f[:, M.MF_TRANSMISSION] > 0).any()
                 or (slots[:, M.TS_TRANSMISSION] >= 0).any()),
            # volume: thickness > 0 enables the screen-space refraction
            # gather (KHR_materials_volume; fragment.wgsl:40-66)
            bool((f[:, M.MF_THICKNESS] > 0).any()),
        )

    def _slot_mask(self, mat_rows: Optional[np.ndarray] = None) -> tuple:
        """Which texture slots ANY material binds — a static shading
        specialization (the reference's shader-template variables;
        changing the set retraces, like a shader-cache miss). mat_rows
        restricts the scan to one pass bucket's materials: a transparent
        pass whose materials bind no textures compiles its whole
        K-layer-batched texel gather away (~50 ms at 1080p/K=4)."""
        slots = self.materials.tex_slots[:, :, 0]
        if mat_rows is not None:
            if mat_rows.size == 0:
                return (False,) * slots.shape[1]
            slots = slots[mat_rows]
        bound = (slots >= 0).any(axis=0)
        return tuple(bool(b) for b in bound)

    def _device_mask(self, name: str, arr: np.ndarray):
        """Upload a per-frame mask only when it changed (device_put has
        real latency on a remote-attached TPU; masks are usually static
        frame-to-frame)."""
        cached = self._mask_cache.get(name)
        if cached is not None and np.array_equal(cached[0], arr):
            return cached[1]
        dev = jnp.asarray(arr)
        self._mask_cache[name] = (arr.copy(), dev)
        return dev

    def _dof_ring_set(self, masks=None):
        """Static DoF ring specialization from a host-side CoC bound
        (ops/effects.py dof_max_coc / dof_active_rings): view-distance
        range = [nearest AABB point across the VISIBLE meshes (floored
        at the near plane), far plane] — sky pixels sit at the far
        plane, a mesh crossing the near plane floors dmin there. Only
        visible meshes produce depth-plane pixels, so culled ones must
        not tighten the bound (r4: an off-screen box BESIDE the camera
        put dmin at ~1 and fired all 3 rings, +3.5 ms/frame on the
        stress bench). Rings the bound proves weightless compile out;
        () compiles DoF out entirely (the WGSL coc<0.5 early-out at
        specialization time). Changes only when the camera/aperture
        crosses a ring threshold (4 possible sets), like every other
        variant key."""
        import numpy as _np

        from .ops.effects import (
            dof_active_rings, dof_max_coc, linearize_depth_host,
        )

        proj = _np.asarray(self.camera.projection, _np.float64)
        near_d = linearize_depth_host(0.0, proj)
        far_d = linearize_depth_host(1.0, proj)
        mins, maxs, keys = self.meshes.world_bounds()
        if masks is not None and len(mins):
            vis = masks["opaque"] | masks["transparent"] | masks["hud"]
            sel = np.nonzero(vis[self.meshes.world_rows()])[0]
            mins, maxs = mins[sel], maxs[sel]
        if len(mins):
            # exact min VIEW depth (what linearize_depth returns), not the
            # Euclidean camera distance: off-axis geometry sits closer in
            # view z than in Euclidean distance by up to cos(half-FOV), and
            # CoC grows as depth shrinks below focus — a Euclidean dmin
            # would under-bound the CoC and wrongly compile out live rings.
            # View depth is linear in p, so its min over an AABB is the min
            # over the 8 corners: depth(p) = -(view[2,:3]·p + view[2,3]).
            view = _np.asarray(self.camera.view, _np.float64)
            corners = _np.stack([
                _np.stack([_np.where(b & 1, maxs[:, 0], mins[:, 0]),
                           _np.where(b & 2, maxs[:, 1], mins[:, 1]),
                           _np.where(b & 4, maxs[:, 2], mins[:, 2])],
                          axis=-1)
                for b in range(8)], axis=1)          # (N, 8, 3)
            vz = -(corners.reshape(-1, 3) @ view[2, :3] + view[2, 3])
            dmin = max(float(vz.min()), min(near_d, far_d))
        else:
            dmin = min(near_d, far_d)
        dmax = max(far_d, dmin)
        coc_max = dof_max_coc(
            [self.camera.dof.focus_distance, self.camera.dof.aperture],
            float(proj[1, 1]), dmin, dmax, self.config.height)
        return dof_active_rings(coc_max)

    def _log_retrace(self, static_kwargs: dict, ds, ov_idx, hooks) -> None:
        """Emit a one-line 'retrace: <reasons>' note when the frame's jit
        specialization key changed — the user-visible analog of the
        reference's shader/pipeline-cache misses (set_anti_aliasing /
        set_post_processing / texture-pool-growth rebuilds, §3.5). The
        signature covers every static arg of render_frame plus the trace-
        relevant shapes (scene-capacity buckets, the compacted overlay
        column count): any change means the next dispatch stalls on a
        compile (or a persistent-cache load)."""
        import jax

        sig = dict(static_kwargs)
        sig["overlay_tri_idx_shape"] = (
            None if ov_idx is None else tuple(ov_idx.shape))
        sig["ds_shapes"] = tuple(
            tuple(leaf.shape) if hasattr(leaf, "shape") else leaf
            for leaf in jax.tree_util.tree_leaves(ds))
        sig["hooks"] = hooks
        prev = getattr(self, "_last_trace_sig", None)
        self._last_trace_sig = sig
        if prev is None:
            return  # first frame always compiles; not a "re"-trace
        changed = sorted(
            k for k in sig
            if prev.get(k, "<missing>") != sig[k])
        if changed:
            self.timings.note("retrace: " + ", ".join(changed))

    def warmup(self, variants: Optional[list] = None) -> int:
        """Pre-compile frame variants through jit (and the persistent
        compile cache, __init__.py) so runtime toggles don't stall the
        render loop — the analog of the reference compiling its shader
        template variants at init (shaders.rs:42-69).

        variants: list of dicts of config overrides; keys may name any
        field of RendererConfig, AntiAliasing or PostProcessing (e.g.
        [{}, {"bloom": True}, {"msaa": False, "smaa": True}]). Each
        variant is rendered once on-device (no host readback). The
        current config always compiles first. Returns the number of
        frames dispatched."""
        import dataclasses

        cfg0 = self.config
        aa_fields = {f.name for f in dataclasses.fields(cfg0.anti_aliasing)}
        pp_fields = {f.name for f in dataclasses.fields(cfg0.post_processing)}
        top_fields = {f.name for f in dataclasses.fields(cfg0)}
        n = 0
        try:
            for over in [{}] + list(variants or []):
                aa = {k: v for k, v in over.items() if k in aa_fields}
                pp = {k: v for k, v in over.items() if k in pp_fields}
                top = {k: v for k, v in over.items()
                       if k in top_fields and k not in ("anti_aliasing",
                                                        "post_processing")}
                unknown = set(over) - aa_fields - pp_fields - top_fields
                if unknown:
                    raise ConfigError(
                        f"warmup: unknown config fields {sorted(unknown)}")
                self.config = dataclasses.replace(
                    cfg0,
                    anti_aliasing=dataclasses.replace(
                        cfg0.anti_aliasing, **aa),
                    post_processing=dataclasses.replace(
                        cfg0.post_processing, **pp),
                    **top,
                )
                self.render_device()
                n += 1
        finally:
            self.config = cfg0
        return n

    def _scene_signature(self, cfg=None):
        """Cheap content signature of everything a rendered frame depends
        on: store mutation counters + camera + config. Used both as the
        per-frame derived-state memo key and as the pick-staleness epoch
        (pick() re-renders when the scene changed since the cached
        tri_id plane — reference picking is an any-time 1x1 dispatch of
        CURRENT state, picker.rs:56-115)."""
        return (
            getattr(self.meshes, "mutation_count", 0),
            getattr(self.materials, "mutation_count", 0),
            getattr(self.transforms, "mutation_count", 0),
            self.skins.gpu_dirty, self.environment.gpu_dirty,
            self.textures.gpu_dirty, self.lights.gpu_dirty,
            self.camera.view.tobytes(), self.camera.projection.tobytes(),
            self.camera.dof.focus_distance, self.camera.dof.aperture,
            cfg if cfg is not None else self.config,
        )

    def render_device(self, debug_mode: str = "none", hooks=None):
        """Render one frame; returns the (H, W, 4) f32 sRGB display image
        as a DEVICE array (the analog of the swapchain texture staying on
        GPU — no host readback)."""
        if hooks is not None and getattr(hooks, "pre_render", None):
            hooks.pre_render(self)   # host hook, before the dirty flush
        # snapshot config AFTER pre_render: mutating renderer.config from
        # a pre-flush host hook is a natural use and takes effect THIS
        # frame (ADVICE r3: the pre-hook snapshot applied it a frame late)
        cfg = self.config
        if debug_mode == "edges" and not cfg.anti_aliasing.msaa:
            raise ConfigError(
                "debug_mode 'edges' visualizes MSAA per-sample coverage "
                "and requires AntiAliasing(msaa=True)")
        self.camera.next_frame()
        if debug_mode == "none":
            # any material carrying a debug bitmask switches the shade
            # specialization to the per-material debug variant (reference:
            # PbrMaterialDebug recompiles the opaque shader template)
            from .core import materials as _M

            if (self.materials.flags[:, _M.MI_DEBUG_MASK] != 0).any():
                debug_mode = "material"
        # temporal reuse engages when configured and nothing reshapes the
        # opaque stage (debug views and opaque-stage hooks fall back to
        # the full frame; AA modes are mutually exclusive by config)
        aa = cfg.anti_aliasing
        use_temporal = (
            aa.temporal and debug_mode == "none"
            and not aa.supersample and not aa.msaa
            and not (hooks is not None
                     and (getattr(hooks, "first_pass", None)
                          or getattr(hooks, "after_geometry", None))))
        # spans mirror the reference's render() tracing (render.rs:56-69:
        # one span per write_gpu + per pass); the jitted frame is a single
        # dispatch here, so in-frame pass splits live in the XLA profile
        # (jax.profiler.trace + the TraceAnnotation these spans emit)
        with self.timings.span("write_gpu"):
            if use_temporal:
                from .core.camera import get_halton_jitter

                jit_px = get_halton_jitter((self.camera.frame_count % 8) + 1)
                prev_vp = (self._temporal["prev_vp"]
                           if self._temporal is not None
                           else self.camera.view_projection)
                ds = self._flush(jitter_px=jit_px, prev_view_proj=prev_vp)
            else:
                self._temporal = None
                ds = self._flush()
        # per-frame derived state (cull masks, pass specializations, tile
        # caps, crops, DoF rings): ~9 ms of host numpy per frame on a
        # small host, re-derivable only from (meshes, materials, camera,
        # config) — memoized on their mutation counters so a static
        # scene/camera pays it once (the reference's analog: bind-group
        # recreate lists are drained, not rebuilt, on clean frames)
        prep_key = self._scene_signature(cfg)
        cached = getattr(self, "_prep_cache", None)
        if cached is not None and cached[0] == prep_key:
            prep = cached[1]
            masks = prep["masks"]
        else:
            with self.timings.span("collect_renderables"):
                masks = self._mesh_masks()
            has_transparent = bool(masks["transparent"].any())
            has_hud = bool(masks["hud"].any())
            # per-pass shading specialization: the overlay (transparent +
            # HUD) shade compiles only against the texture slots /
            # extensions its OWN materials use (reference: per-
            # (buffer_info, material) transparent pipelines,
            # material_transparent shader/cache_key.rs)
            if has_transparent or has_hud:
                ov_rows = self._bucket_mat_rows(
                    masks["transparent"] | masks["hud"])
                ov_slot_mask = self._slot_mask(ov_rows)
                ov_ext = self._ext_mask(ov_rows)
                ov_crop = self._overlay_crop(masks)
                ov_idx = self._overlay_tri_idx(masks)
                # 32x32 units: the transparent cap drives the compacted
                # PEEL grid (binned-raster tiles), not the 8x128 shade tiles
                ov_tile_cap = (self._bucket_tile_cap(masks, "transparent",
                                                     tile_h=32, tile_w=32)
                               if has_transparent else None)
                layer_bound = (self._transparent_layer_bound(masks)
                               if has_transparent else None)
            else:
                ov_slot_mask = None
                ov_ext = None
                ov_crop = None
                ov_idx = None
                ov_tile_cap = None
                layer_bound = None
            op_rows = self._bucket_mat_rows(masks["opaque"])
            # opaque covered-tile compaction: MSAA path (solid envs fill
            # skipped tiles with the constant; image envs sample sky from
            # the texel-pool env rows — frame.py _opaque_band_msaa gates
            # identically on the traced side). Unit height is
            # OPAQUE_TILE_ROWS (8 — see the constant's measured
            # anti-lesson for why finer strips lose).
            op_tile_cap = (self._bucket_tile_cap(
                masks, "opaque", tile_h=OPAQUE_TILE_ROWS, tile_w=128)
                if cfg.anti_aliasing.msaa else None)
            dof_rings = (self._dof_ring_set(masks)
                         if cfg.post_processing.dof else None)
            prep = dict(
                masks=masks, has_transparent=has_transparent,
                has_hud=has_hud, ov_slot_mask=ov_slot_mask, ov_ext=ov_ext,
                ov_crop=ov_crop, ov_idx=ov_idx, ov_tile_cap=ov_tile_cap,
                # static K clamp: peels a PROVEN depth-complexity bound
                # shows empty compile away along with their skip conds
                n_layers=(min(cfg.max_transparent_layers, layer_bound)
                          if layer_bound else cfg.max_transparent_layers),
                op_rows=op_rows, op_tile_cap=op_tile_cap,
                dof_rings=dof_rings,
                op_slot_mask=self._slot_mask(op_rows),
                op_ext=self._ext_mask(op_rows),
                has_morphs=bool(np.any(self.meshes.mesh_info[:, 3] > 0)),
                skin_sets=(int(self.meshes.mesh_info[:, 5].max())
                           if self.meshes.count else 0),
            )
            self._prep_cache = (prep_key, prep)
        has_transparent = prep["has_transparent"]
        has_hud = prep["has_hud"]
        ov_slot_mask = prep["ov_slot_mask"]
        ov_ext = prep["ov_ext"]
        ov_crop = prep["ov_crop"]
        ov_idx = prep["ov_idx"]
        ov_tile_cap = prep["ov_tile_cap"]
        op_tile_cap = prep["op_tile_cap"]
        dof_rings = prep["dof_rings"]
        static_kwargs = dict(
            width=cfg.width,
            height=cfg.height,
            supersample=cfg.anti_aliasing.supersample,
            msaa=cfg.anti_aliasing.msaa,
            tonemap=cfg.post_processing.tonemapping,
            use_mips=cfg.anti_aliasing.mipmap,
            has_morphs=prep["has_morphs"],
            skin_sets=prep["skin_sets"],
            has_transparent=has_transparent,
            has_hud=has_hud,
            n_transparent_layers=prep["n_layers"],
            slot_mask=prep["op_slot_mask"],
            solid_env=self.environment.is_solid,
            has_nearest=bool(
                (self.textures.descriptors[:, 5] == 0).any()
                and self.textures.descriptor_capacity > 0),
            needs_clip=masks["needs_clip"],
            ext=prep["op_ext"],
            overlay_slot_mask=ov_slot_mask,
            overlay_ext=ov_ext,
            overlay_crop_h=(ov_crop[1] if ov_crop else None),
            overlay_tile_cap=ov_tile_cap,
            opaque_tile_cap=op_tile_cap,
            opaque_tile_rows=OPAQUE_TILE_ROWS,
            has_uv1=bool((self.materials.tex_slots[:, :, 1] == 1).any()),
            has_color=self.meshes.uses_vertex_colors,
            # tiled light lists (the pass the reference stubbed) engage
            # once the dense capacity loop would dominate: per-128-px
            # units shade only the lights whose sphere reaches them.
            # cfg.light_tiles overrides the auto rule (None = auto);
            # _force_dense_lights is a legacy bench/test escape hatch.
            light_tiles=(cfg.light_tiles if cfg.light_tiles is not None
                         else (self.lights.count > 8
                               and not getattr(self, "_force_dense_lights",
                                               False))),
            debug_mode=debug_mode,
            bloom=cfg.post_processing.bloom,
            dof=cfg.post_processing.dof,
            dof_rings=dof_rings,
            smaa=cfg.anti_aliasing.smaa,
        )
        # animated-subset vertex split: ship the (cached) animated
        # triangle set; its presence/shape in ds is part of the trace key
        anim_idx = (self._anim_tri_idx()
                    if (prep["has_morphs"] or prep["skin_sets"]) else None)
        if anim_idx is not None:
            ds["anim_tri_idx"] = anim_idx
        else:
            ds.pop("anim_tri_idx", None)
        # host-only hooks (pre/post_render) must not reach the jit static
        # key — swapping them would needlessly retrace the frame
        jit_hooks = hooks
        if hooks is not None and (getattr(hooks, "pre_render", None)
                                  or getattr(hooks, "post_render", None)):
            import dataclasses as _dc

            jit_hooks = _dc.replace(hooks, pre_render=None, post_render=None)
            if all(getattr(jit_hooks, f.name) is None
                   for f in _dc.fields(jit_hooks)):
                jit_hooks = None
        if use_temporal:
            from .ops.raster import TILE_H, TILE_W
            from .ops.temporal import reset_history
            from .passes.frame import _pad_to, render_frame_temporal

            rw1 = _pad_to(cfg.width, TILE_W)
            rh1 = _pad_to(cfg.height, TILE_H)
            n_units = (rh1 // 8) * (rw1 // 128)
            tp = cfg.temporal
            st = self._temporal
            # history survives camera motion (that is the point); any
            # content flush or resize resets it. The reset frame shades
            # EVERY unit (full cap) so the next frame starts converged.
            reset = (st is None or st["epoch"] != self._content_epoch
                     or st["shape"] != (rh1, rw1))
            if reset:
                hist = reset_history(rh1, rw1)
                age = jnp.full((n_units,), 1 << 20, jnp.int32)
                cap = n_units
            else:
                hist, age = st["hist"], st["age"]
                cap = max(1, min(n_units,
                                 int(round(tp.cap_frac * n_units))))
            for k in ("supersample", "msaa", "opaque_tile_cap",
                      "opaque_tile_rows", "debug_mode"):
                static_kwargs.pop(k)
            static_kwargs["shade_cap"] = cap
            static_kwargs["alpha"] = tp.alpha
            self._log_retrace(static_kwargs, ds, ov_idx, jit_hooks)
            frame_span = self.timings.span("render_frame/dispatch")
            frame_span.__enter__()
            ldr, tri_id, depth, hist, age = render_frame_temporal(
                ds,
                self._device_mask("opaque", masks["opaque"]),
                self._device_mask("transparent", masks["transparent"])
                if has_transparent else None,
                self._device_mask("hud", masks["hud"]) if has_hud else None,
                hist, age,
                overlay_crop_y0=(jnp.int32(ov_crop[0]) if ov_crop else None),
                overlay_tri_idx=ov_idx,
                hooks=jit_hooks,
                **static_kwargs,
            )
            frame_span.__exit__(None, None, None)
            self._temporal = dict(
                hist=hist, age=age,
                prev_vp=self.camera.view_projection.copy(),
                epoch=self._content_epoch, shape=(rh1, rw1))
        else:
            # record the STRIPPED hooks (the actual jit static arg):
            # swapping only host-side pre/post hooks must not log a
            # spurious retrace
            self._log_retrace(static_kwargs, ds, ov_idx, jit_hooks)
            frame_span = self.timings.span("render_frame/dispatch")
            frame_span.__enter__()
            ldr, tri_id, depth = render_frame(
                ds,
                self._device_mask("opaque", masks["opaque"]),
                self._device_mask("transparent", masks["transparent"]) if has_transparent else None,
                self._device_mask("hud", masks["hud"]) if has_hud else None,
                overlay_crop_y0=(jnp.int32(ov_crop[0]) if ov_crop else None),
                overlay_tri_idx=ov_idx,
                hooks=jit_hooks,
                **static_kwargs,
            )
            frame_span.__exit__(None, None, None)
        self.timings.end_frame()
        self._last_tri_id = tri_id
        self._rendered_sig = prep_key   # pick-staleness epoch
        # pick()'s staleness re-render must reproduce THIS frame's
        # configuration — a hookless re-render would pick against a
        # frame the app never displayed (r4 review finding)
        self._last_render_call = (debug_mode, hooks)
        if hooks is not None and getattr(hooks, "post_render", None):
            hooks.post_render(self)  # host hook, after the dispatch
        return ldr

    def render(self, debug_mode: str = "none", hooks=None) -> np.ndarray:
        """Render one frame and read it back to host (H, W, 4) f32 sRGB.

        debug_mode: "none" | "normals" | "ibl" | "punctual" |
        "edges" (MSAA edge-detect view; requires msaa) |
        "channel:<name>" (global material-channel isolation,
        ops/shade.py DEBUG_CHANNELS) — the reference's shader debug
        template variants (template.rs:46-65, materials/pbr.rs:54-79,
        helpers/debug_to_copy.wgsl).
        The readback is the expensive part on a remote-attached TPU; use
        render_device() for benchmarking / on-device consumers."""
        return np.asarray(self.render_device(debug_mode=debug_mode, hooks=hooks))

    def render_u8(self) -> np.ndarray:
        return (np.clip(self.render(), 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

    # ---- picking (reference: picker.rs:56-115) -------------------------------

    def pick(self, x: int, y: int) -> Optional[int]:
        """Returns the mesh key under pixel (x, y), or None.

        Reference semantics (picker.rs:56-115): picking is an
        independent any-time dispatch against the CURRENT scene. The
        tri_id plane is cached from the last render, so if the scene,
        camera or config changed since (tracked by _scene_signature),
        the plane is STALE — re-render device-side first instead of
        returning a stale (or missing) result. Cost on a clean scene is
        unchanged: one signature compare.

        The refresh replays the last render's JIT-VISIBLE hooks (they
        are frame content — a hookless re-render would pick against a
        frame the app never displayed) but strips the host-side
        pre/post_render callbacks: a nominally read-only pick must not
        fire user host side effects (r4 advisor finding)."""
        if (self._last_tri_id is None
                or getattr(self, "_rendered_sig", None)
                != self._scene_signature()):
            if self.meshes.count == 0:
                return None
            dm, hk = getattr(self, "_last_render_call", ("none", None))
            if hk is not None and (getattr(hk, "pre_render", None)
                                   or getattr(hk, "post_render", None)):
                import dataclasses as _dc

                hk = _dc.replace(hk, pre_render=None, post_render=None)
            self.render_device(debug_mode=dm, hooks=hk)
        h, w = self._last_tri_id.shape
        if not (0 <= x < w and 0 <= y < h):
            return None
        tid = int(np.asarray(self._last_tri_id[y, x]))
        if tid < 0:
            return None
        # tri ids are device (compact) order — map through the flushed
        # tri_mesh, not the pool-order host mirror; instanced groups
        # append after the pool in gid order (_combined_geometry)
        tm = self._tri_mesh_device_order
        if tm is None:
            return None
        if tid >= tm.size and self._inst_tri_mesh:
            tm = np.concatenate([tm] + self._inst_tri_mesh)
        if tid >= tm.size:
            return None
        mesh_row = int(tm[tid])
        return self._mesh_row_to_key.get(mesh_row)
