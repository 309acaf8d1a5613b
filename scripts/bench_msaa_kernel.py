"""MSAA-4x raster kernel: correctness vs dense fallback + stress timing."""
from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _rows(r, width, height):
    from awsm_renderer_tpu.ops.raster import TILE_H, TILE_W
    from awsm_renderer_tpu.ops.vertex import vertex_stage
    from awsm_renderer_tpu.passes.frame import _pad_to, prep_setup_rows

    rw, rh = _pad_to(width, TILE_W), _pad_to(height, TILE_H)
    ds = r._flush()
    masks = r._mesh_masks()

    @functools.partial(jax.jit, static_argnames=())
    def mk(ds, mask):
        rows, key = vertex_stage(
            ds["c_pos"], ds["c_norm"], ds["c_tang"], ds["c_uv0"], ds["c_uv1"],
            ds["c_color"], ds["c_joints"], ds["c_weights"], ds["c_morph_base"],
            ds["morph_deltas"], ds["tri_mesh"], ds["mesh_info"],
            ds["morph_weights"], ds["world"], ds["normal_mat"],
            ds["joint_matrices"], ds["camera"]["view_proj"], mask,
            width=rw, height=rh, has_morphs=False, skin_sets=0,
            needs_clip=False)
        return prep_setup_rows(rows, key)

    return jax.device_put(np.asarray(mk(ds, jnp.asarray(masks["opaque"])))), rw, rh


def check():
    from awsm_renderer_tpu import (
        AwsmRendererTpu, Light, PbrMaterial, RendererConfig, Transform,
    )
    from awsm_renderer_tpu.geometry import box, uv_sphere
    from awsm_renderer_tpu.ops.raster import _rasterize_dense, rasterize16_msaa
    from awsm_renderer_tpu.utils import math3d as m3

    W1, H1 = 256, 128
    r = AwsmRendererTpu(RendererConfig(width=W1, height=H1))
    mat = r.materials.insert(PbrMaterial())
    r.add_mesh(box(), mat, transform=Transform(
        translation=np.array([-0.7, 0, 0], np.float32)))
    r.add_mesh(uv_sphere(0.55, rings=12, sectors=24), mat,
               transform=Transform(
                   translation=np.array([0.6, 0.1, -0.4], np.float32)))
    r.add_mesh(box(0.5), mat, transform=Transform(
        translation=np.array([0.3, -0.2, 0.7], np.float32)))
    r.lights.insert(Light.directional([-1, -1, -0.5]))
    view = m3.look_at([0, 0.6, 3], [0, 0, 0], [0, 1, 0])
    r.camera.update(view, m3.perspective(np.pi / 3, W1 / H1, 0.1, 100.0))

    rows, rw2, rh2 = _rows(r, 2 * W1, 2 * H1)
    samp, depth1 = rasterize16_msaa(rows, width2=rw2, height2=rh2,
                                    interpret=False)
    out = _rasterize_dense(rows.T, width=rw2, height=rh2, interpret=True,
                           slim=True, analytic_derivs=False)
    tid2 = np.asarray(out["tri_id"])
    d2 = np.asarray(out["depth"])
    H1p, W1p = rh2 // 2, rw2 // 2
    ref_samp = [tid2[i::2, j::2] for i in (0, 1) for j in (0, 1)]
    ref_depth = d2.reshape(H1p, 2, W1p, 2).min(axis=(1, 3))
    for s in range(4):
        a = np.asarray(samp[s])
        assert (a == ref_samp[s]).all(), (
            s, int((a != ref_samp[s]).sum()), "sample plane mismatch")
    dk = np.asarray(depth1)
    assert np.allclose(dk, ref_depth, atol=0), "depth mismatch"
    cov = int((np.asarray(samp[0]) >= 0).sum())
    print(f"check OK: {cov} covered pixels, planes bit-exact vs dense")


def timing():
    from bench import build_stress_scene
    from awsm_renderer_tpu.ops.raster import rasterize16_msaa

    r, tris = build_stress_scene(1920, 1080)
    rows, rw2, rh2 = _rows(r, 3840, 2160)
    print(f"# stress {tris} tris, raster {rw2}x{rh2}", file=sys.stderr)

    fn = jax.jit(functools.partial(rasterize16_msaa, width2=rw2, height2=rh2,
                                   interpret=False))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(rows)
        _ = float(np.asarray(out[1][0, 0]))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1), run(1))
    n = 16
    tn = run(n)
    if tn <= t1:
        t1 = min(t1, run(1))
        tn = run(n)
    print(f"msaa kernel: {(tn - t1) / (n - 1) * 1000:.2f} ms")


if __name__ == "__main__":
    if "time" in sys.argv[1:]:
        timing()
    else:
        check()
