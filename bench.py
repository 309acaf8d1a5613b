"""Benchmark: FPS at 1080p on a Sponza-class procedural stress scene.

Runs on real TPU hardware (the driver executes this at round end).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the north star is
>= 60 FPS @ 1080p on one v5e chip, so vs_baseline = fps / 60.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_stress_scene(width: int, height: int):
    """Sponza-class stand-in: a colonnade grid of textured boxes + spheres
    (~120k triangles, multiple materials/textures, several lights)."""
    from awsm_renderer_tpu import (
        AwsmRendererTpu, Light, PbrMaterial, RendererConfig, Transform,
    )
    from awsm_renderer_tpu.core.materials import TS_BASE_COLOR, TextureRef
    from awsm_renderer_tpu.geometry import box, checker_texture, uv_sphere
    from awsm_renderer_tpu.utils import math3d as m3

    r = AwsmRendererTpu(RendererConfig(width=width, height=height))
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

    # share geometry resources (the reference's MeshResource sharing)
    box_res = r.meshes.insert_resource(box(0.8))
    sph_res = r.meshes.insert_resource(uv_sphere(0.45, rings=24, sectors=48))

    n = 0
    for gx in range(-7, 8):
        for gz in range(-7, 8):
            res = box_res if (gx + gz) % 2 == 0 else sph_res
            mat = mats[(gx * 15 + gz) % 12]
            tk = r.transforms.insert(Transform(
                translation=np.array([gx * 1.6, float(rng.uniform(-0.3, 0.3)), gz * 1.6], np.float32)))
            r.transforms.update_world()
            r.meshes.insert(
                res, r.transforms.row_of(tk), r.materials.row_of(mat), tk, mat)
            n += 1
    r.meshes.update_world(r.transforms)

    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    for i in range(6):
        r.lights.insert(Light.point(
            [np.cos(i) * 6, 2.0, np.sin(i) * 6], color=tuple(rng.uniform(0.4, 1, 3)),
            intensity=10.0, range=15.0))

    view = m3.look_at([10, 7, 10], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, width / height, 0.1, 200.0)
    r.camera.update(view, proj)
    tris = int(np.sum(r.meshes.tri_mesh >= 0))
    return r, tris


def main():
    import jax

    width, height = 1920, 1080
    r, tris = build_stress_scene(width, height)
    print(f"# stress scene: {r.meshes.count} meshes, {tris} triangles, "
          f"{r.lights.count} lights, backend={jax.default_backend()}", file=sys.stderr)

    img = r.render()  # compile + warmup (one host readback sanity check)
    assert np.isfinite(img).all()

    # Differential timing: this environment reaches the TPU through a
    # relay where any host readback costs seconds and block_until_ready is
    # unreliable, so frame time = (T(n frames + 1 fetch) - T(1 frame +
    # 1 fetch)) / (n - 1). The fetch of a single pixel fences the queue.
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = r.render_device()
        _ = float(np.asarray(out[0, 0, 0]))
        return time.perf_counter() - t0

    # the relay occasionally stalls for seconds on one fetch; take the best
    # of two singles and retry the batch if the differential comes out
    # non-positive (a stalled t1 poisons it)
    t1 = min(run(1), run(1))
    print(f"# 1 frame + fence: {t1*1000:.1f} ms", file=sys.stderr)
    frames = max(6, min(40, int(10.0 / max(t1, 1e-3)) + 2))
    tn = run(frames)
    if tn <= t1:
        t1 = min(t1, run(1))
        tn = run(frames)
    dt = max((tn - t1) / (frames - 1), 1e-6)
    print(f"# {frames} frames + fence: {tn*1000:.1f} ms -> {dt*1000:.2f} ms/frame",
          file=sys.stderr)
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "fps_1080p_stress",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
