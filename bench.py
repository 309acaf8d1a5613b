"""Benchmark: FPS at 1080p on a Sponza-class procedural stress scene,
full north-star config 5 (BASELINE.json): many meshes, transparency in
scene, bloom + DoF effects chain, MSAA-equivalent AA (2x2 coverage
samples, per-pixel shading), and a
pixel-ID pick computed every frame.

Runs on real TPU hardware (the driver executes this at round end).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the north star is
>= 60 FPS @ 1080p on one v5e chip, so vs_baseline = fps / 60.

Also prints (stderr) the BASELINE.md protocol split: geometry-pass-only
ms/frame (vertex -> raster -> G-buffer resolve) vs the full frame, the
deferred-shading cost being the difference.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_stress_scene(width: int, height: int, effects: bool = True):
    """Sponza-class stand-in: a colonnade grid of textured boxes + spheres
    (~260k triangles, multiple materials/textures, several lights, a ring
    of alpha-blended glass panes for the transparent pass)."""
    from awsm_renderer_tpu import (
        AntiAliasing, AwsmRendererTpu, Light, PbrMaterial, PostProcessing,
        RendererConfig, Transform,
    )
    from awsm_renderer_tpu.core.materials import (
        AlphaMode, TS_BASE_COLOR, TextureRef,
    )
    from awsm_renderer_tpu.geometry import box, checker_texture, uv_sphere
    from awsm_renderer_tpu.utils import math3d as m3

    # msaa (not supersample): MSAA-4x semantics — 2x2 coverage/depth
    # samples per pixel, shading once per display pixel — matching the
    # reference's msaa_sample_count=4 cost model (anti_alias.rs:10-14);
    # full 4x-shaded supersampling is the quality-over-speed alternative
    r = AwsmRendererTpu(RendererConfig(
        width=width, height=height,
        post_processing=PostProcessing(bloom=effects, dof=effects),
        anti_aliasing=AntiAliasing(msaa=effects, mipmap=True),
    ))
    rng = np.random.default_rng(42)

    tex_ids = [
        r.textures.add_image(checker_texture(128, c, tuple(rng.integers(100, 255, 3)),
                                             tuple(rng.integers(0, 80, 3))), srgb=True)
        for c in (4, 8, 16)
    ]
    mats = []
    for i in range(12):
        mats.append(r.materials.insert(PbrMaterial(
            base_color_factor=np.array([*rng.uniform(0.3, 1.0, 3), 1.0], np.float32),
            metallic_factor=float(rng.uniform(0, 1)),
            roughness_factor=float(rng.uniform(0.2, 0.9)),
            textures={TS_BASE_COLOR: TextureRef(r.textures.row_of(tex_ids[i % 3]))},
        )))
    glass = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.4, 0.7, 0.9, 0.4], np.float32),
        alpha_mode=AlphaMode.BLEND, roughness_factor=0.1, metallic_factor=0.0))

    # share geometry resources (the reference's MeshResource sharing)
    box_res = r.meshes.insert_resource(box(0.8))
    sph_res = r.meshes.insert_resource(uv_sphere(0.45, rings=24, sectors=48))
    pane_res = r.meshes.insert_resource(box(0.9))

    for gx in range(-7, 8):
        for gz in range(-7, 8):
            res = box_res if (gx + gz) % 2 == 0 else sph_res
            mat = mats[(gx * 15 + gz) % 12]
            tk = r.transforms.insert(Transform(
                translation=np.array([gx * 1.6, float(rng.uniform(-0.3, 0.3)), gz * 1.6], np.float32)))
            r.transforms.update_world()
            r.meshes.insert(
                res, r.transforms.row_of(tk), r.materials.row_of(mat), tk, mat)
    # transparent glass panes around the center (config 5: transparency
    # blended over the opaque result with shared depth)
    for i in range(12):
        a = 2 * np.pi * i / 12
        tk = r.transforms.insert(Transform(
            translation=np.array([np.cos(a) * 4.5, 1.2, np.sin(a) * 4.5], np.float32)))
        r.transforms.update_world()
        r.meshes.insert(
            pane_res, r.transforms.row_of(tk), r.materials.row_of(glass),
            tk, glass, transparent=True)
    r.meshes.update_world(r.transforms)

    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    for i in range(6):
        r.lights.insert(Light.point(
            [np.cos(i) * 6, 2.0, np.sin(i) * 6], color=tuple(rng.uniform(0.4, 1, 3)),
            intensity=10.0, range=15.0))

    view = m3.look_at([10, 7, 10], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, width / height, 0.1, 200.0)
    r.camera.update(view, proj)
    # f/1 at 16 m focus: CoC reaches ~1.6 px on the nearest columns, so
    # the DoF disk genuinely fires (the old f/4 setting had sub-pixel CoC
    # everywhere — physically invisible, and the ring specialization
    # rightly compiled the pass out)
    r.camera.dof.focus_distance = 16.0
    r.camera.dof.aperture = 1.0
    tris = int(np.sum(r.meshes.tri_mesh >= 0))
    return r, tris


def _geometry_only_fn(r, width, height):
    """vertex -> raster -> G-buffer for the opaque set: the BASELINE.md
    'geometry pass' probe (reference render.rs step 1 analog), on the
    PRODUCTION path (v5 slim kernel + fused attribute resolve)."""
    import functools

    import jax
    import jax.numpy as jnp

    from awsm_renderer_tpu.ops.raster import TILE_H, TILE_W, rasterize16
    from awsm_renderer_tpu.ops.vertex import vertex_stage
    from awsm_renderer_tpu.passes.frame import _pad_to, prep_setup_rows

    rw = _pad_to(width, TILE_W)
    rh = _pad_to(height, TILE_H)
    masks = r._mesh_masks()

    @functools.partial(jax.jit, static_argnames=())
    def geo(ds, mask):
        rows, key = vertex_stage(
            ds["c_pos"], ds["c_norm"], ds["c_tang"], ds["c_uv0"], ds["c_uv1"],
            ds["c_color"], ds["c_joints"], ds["c_weights"], ds["c_morph_base"],
            ds["morph_deltas"], ds["tri_mesh"], ds["mesh_info"],
            ds["morph_weights"], ds["world"], ds["normal_mat"],
            ds["joint_matrices"], ds["camera"]["view_proj"], mask,
            width=rw, height=rh, has_morphs=False, skin_sets=0,
            needs_clip=bool(masks["needs_clip"]),
        )
        vis = rasterize16(prep_setup_rows(rows, key), width=rw, height=rh,
                          interpret=False, has_uv1=False, has_color=False,
                          analytic_derivs=False)
        return vis["tri_id"], vis["depth"]

    ds = r._flush()
    mask = r._device_mask("opaque", masks["opaque"])
    return lambda: geo(ds, mask)


def _time_loop(step, fence, n):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = step()
    fence(out)
    return time.perf_counter() - t0


def _differential(step, fence, label):
    """Relay-safe frame time: (T(n frames + fence) - T(1 frame + fence))
    / (n - 1); a single-pixel fetch fences the queue."""
    t1 = min(_time_loop(step, fence, 1), _time_loop(step, fence, 1))
    print(f"# {label}: 1 + fence: {t1*1000:.1f} ms", file=sys.stderr)
    frames = max(6, min(40, int(10.0 / max(t1, 1e-3)) + 2))
    tn = _time_loop(step, fence, frames)
    if tn <= t1:
        t1 = min(t1, _time_loop(step, fence, 1))
        tn = _time_loop(step, fence, frames)
    dt = max((tn - t1) / (frames - 1), 1e-6)
    print(f"# {label}: {frames} + fence: {tn*1000:.1f} ms -> {dt*1000:.2f} ms/frame",
          file=sys.stderr)
    return dt


def main():
    import jax

    width, height = 1920, 1080
    r, tris = build_stress_scene(width, height)
    print(f"# stress scene (config 5): {r.meshes.count} meshes, {tris} triangles, "
          f"{r.lights.count} lights, msaa+bloom+dof+transparency+pick, "
          f"backend={jax.default_backend()}", file=sys.stderr)

    # compile + warmup. Sanity-check finiteness on ONE pixel only: a full
    # 1080p host readback costs ~33 MB through a ~2.2 s-latency relay and
    # was the reason round 2's graded bench timed out (VERDICT.md Weak #1).
    ldr = r.render_device()
    px = np.asarray(ldr[540, 960])
    assert np.isfinite(px).all(), f"non-finite warmup pixel: {px}"

    # pick-in-the-loop: the per-frame pick COMPUTE (a device gather of the
    # tri_id plane at the cursor — reference picker.rs 1x1 dispatch) runs
    # every frame; its host fetch doubles as the queue fence. Fetch latency
    # through this relay is ~2.2 s flat regardless of work, so per-frame
    # host readback would measure the tunnel, not the renderer.
    def frame():
        ldr = r.render_device()
        pick_val = r._last_tri_id[540, 960]
        return ldr, pick_val

    def fence(out):
        ldr, pick_val = out
        _ = int(np.asarray(pick_val))
        _ = float(np.asarray(ldr[0, 0, 0]))

    dt_full = _differential(frame, fence, "full frame")

    # Headline JSON FIRST — the graded artifact must exist even if the
    # (optional) geometry-split probe below runs out of the driver's
    # time budget (round-2 postmortem: rc=124, parsed=null).
    fps = 1.0 / dt_full
    print(json.dumps({
        "metric": "fps_1080p_stress_config5",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }), flush=True)

    if "--no-split" in sys.argv:
        return
    # geometry/opaque split per BASELINE.md protocol (no effects, 1x scale:
    # the classic split is defined on the base pipeline). Compiles a second
    # jit — kept strictly after the headline line, stderr only.
    try:
        geo = _geometry_only_fn(r, width, height)
        geo()  # compile
        dt_geo = _differential(
            lambda: geo(), lambda out: float(np.asarray(out[1][0, 0])), "geometry pass")
        print(f"# split: geometry {dt_geo*1000:.2f} ms; "
              f"shade+transparent+effects+display ≈ {max(dt_full-dt_geo, 0)*1000:.2f} ms "
              f"(msaa frame)", file=sys.stderr)
    except Exception as e:  # the split is diagnostic, never the artifact
        print(f"# split probe failed: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
