"""Micro-bench: transparent-pass cost per layer at 1080p on real TPU.

Differential timing like bench.py: frame time = (T(n+fence) - T(1+fence))/(n-1).
Run:  python scripts/bench_transparency.py [K ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def build_scene(width, height, n_layers):
    from awsm_renderer_tpu import (
        AwsmRendererTpu, Light, PbrMaterial, RendererConfig, Transform,
    )
    from awsm_renderer_tpu.core.materials import AlphaMode
    from awsm_renderer_tpu.geometry import plane
    from awsm_renderer_tpu.utils import math3d as m3

    r = AwsmRendererTpu(RendererConfig(
        width=width, height=height, max_transparent_layers=n_layers))
    # a few stacked transparent quads in front of the camera
    res = r.meshes.insert_resource(plane(2.0))
    for i in range(4):
        mat = r.materials.insert(PbrMaterial(
            base_color_factor=np.array([0.4, 0.6, 0.9, 0.4], np.float32),
            alpha_mode=AlphaMode.BLEND,
            roughness_factor=0.3,
        ))
        tk = r.transforms.insert(Transform(
            translation=np.array([0.0, 0.0, -1.0 - 0.5 * i], np.float32)))
        r.transforms.update_world()
        r.meshes.insert(res, r.transforms.row_of(tk), r.materials.row_of(mat),
                        tk, mat)
    r.meshes.update_world(r.transforms)
    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, width / height, 0.1, 200.0)
    r.camera.update(view, proj)
    return r


def time_frames(r):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = r.render_device()
        _ = float(np.asarray(out[0, 0, 0]))
        return time.perf_counter() - t0

    r.render_device()  # compile
    t1 = min(run(1), run(1))
    frames = 8
    tn = run(frames)
    if tn <= t1:
        t1 = min(t1, run(1))
        tn = run(frames)
    return max((tn - t1) / (frames - 1), 1e-6)


def main():
    import jax
    ks = [int(a) for a in sys.argv[1:]] or [1, 4]
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    for k in ks:
        r = build_scene(1920, 1080, k)
        dt = time_frames(r)
        print(f"K={k}: {dt*1000:.1f} ms/frame")


if __name__ == "__main__":
    main()
