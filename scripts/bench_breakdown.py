"""Frame-stage breakdown at 1080p on the stress scene (differential timing).

Stages: vertex+sort, build_bins, raster kernel, shade, tonemap.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timed(fn, *args, fetch):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = float(np.asarray(fetch(out)))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1), run(1))
    n = 12
    tn = run(n)
    if tn <= t1:
        t1 = min(t1, run(1))
        tn = run(n)
    return max((tn - t1) / (n - 1), 1e-6)


def main():
    from bench import build_stress_scene
    from awsm_renderer_tpu.ops.raster import (
        TILE_H, TILE_W, build_bins, pad_setup, rasterize)
    from awsm_renderer_tpu.ops.shade import shade_deferred
    from awsm_renderer_tpu.ops.tonemap import display_pass
    from awsm_renderer_tpu.ops.vertex import vertex_stage
    from awsm_renderer_tpu.passes.frame import _pad_to, prep_setup
    from awsm_renderer_tpu.config import ToneMapping

    r, tris = build_stress_scene(1920, 1080)
    ds = r._flush()
    masks = r._mesh_masks()
    rw, rh = _pad_to(1920, TILE_W), _pad_to(1080, TILE_H)
    slot_mask = r._slot_mask()
    ext = r._ext_mask()

    @jax.jit
    def vtx(ds, mask):
        rows, key = vertex_stage(
            ds["c_pos"], ds["c_norm"], ds["c_tang"], ds["c_uv0"], ds["c_uv1"],
            ds["c_color"], ds["c_joints"], ds["c_weights"], ds["c_morph_base"],
            ds["morph_deltas"], ds["tri_mesh"], ds["mesh_info"],
            ds["morph_weights"], ds["world"], ds["normal_mat"],
            ds["joint_matrices"], ds["camera"]["view_proj"], mask,
            width=rw, height=rh, has_morphs=False, skin_sets=0, needs_clip=False,
        )
        return prep_setup(rows, key)

    mask = jnp.asarray(masks["opaque"])
    print(f"vertex+sort: {timed(vtx, ds, mask, fetch=lambda s: s[0,0])*1000:6.1f} ms")

    s = jax.device_put(np.asarray(vtx(ds, mask)))

    bins_fn = jax.jit(functools.partial(build_bins, width=rw, height=rh,
                                        max_bins=256))
    print(f"build_bins:  {timed(bins_fn, s, fetch=lambda o: o[0][0])*1000:6.1f} ms")

    rast = jax.jit(functools.partial(
        rasterize, width=rw, height=rh, has_uv1=False, has_color=False,
        analytic_derivs=False))
    print(f"raster:      {timed(rast, s, fetch=lambda o: o['depth'][0,0])*1000:6.1f} ms")

    vis = {k: jax.device_put(np.asarray(v)) for k, v in rast(s).items()}

    shade = functools.partial(
        shade_deferred, width=rw, height=rh, use_mips=True,
        slot_mask=slot_mask, solid_env=r.environment.is_solid,
        has_nearest=bool((r.textures.descriptors[:, 5] == 0).any()), ext=ext)
    print(f"shade:       {timed(shade, vis, ds, fetch=lambda o: o[0,0,0])*1000:6.1f} ms")

    hdr = jax.device_put(np.asarray(shade(vis, ds)))
    tm = jax.jit(functools.partial(display_pass, mode=ToneMapping.ACES))
    try:
        print(f"display:     {timed(tm, hdr, fetch=lambda o: o[0,0,0])*1000:6.1f} ms")
    except TypeError:
        tm = jax.jit(lambda h: display_pass(h, ToneMapping.ACES))
        print(f"display:     {timed(tm, hdr, fetch=lambda o: o[0,0,0])*1000:6.1f} ms")


if __name__ == "__main__":
    main()
