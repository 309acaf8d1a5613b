"""Image-environment taps routed through the texel pool.

renderer._flush appends the quad-packed [skybox | irradiance | prefiltered]
rows (bf16, texel-row width) to ds["texels"] for image environments, and
shade samples them from that ONE table via ds["env_pool_base"]
(ops/cubemap.py sample_env_batch_c texq route) — the single-promoted-table
rule from ARCHITECTURE.md's gather economics. Reference analog: the env
cubemaps are just more textures (crates/renderer/src/lights/ibl.rs binds
them alongside the pool in the opaque pass bind group 1/2).
"""

import numpy as np
import jax.numpy as jnp

from awsm_renderer_tpu import (
    AwsmRendererTpu, Light, PbrMaterial, RendererConfig, Transform,
)
from awsm_renderer_tpu.core.textures import TEXEL_COLS
from awsm_renderer_tpu.geometry import uv_sphere
from awsm_renderer_tpu.ops.cubemap import pack_cubemap, sample_env_batch_c
from awsm_renderer_tpu.utils import math3d as m3

F = np.float32


def _rand_cubemaps(rng):
    sky = rng.uniform(0, 2, (6, 8, 8, 4)).astype(F)
    irr = rng.uniform(0, 1, (6, 4, 4, 4)).astype(F)
    pref = rng.uniform(0, 3, (3, 6, 8, 8, 4)).astype(F)
    return sky, irr, pref


def test_pool_route_matches_direct_route():
    rng = np.random.default_rng(7)
    sky, irr, pref = _rand_cubemaps(rng)
    sky_p = jnp.asarray(pack_cubemap(sky))
    irr_p = jnp.asarray(pack_cubemap(irr))
    pref_p = jnp.asarray(pack_cubemap(pref))

    P = 257
    d = rng.normal(size=(3, P)).astype(F)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    dirs = tuple(jnp.asarray(c) for c in d)
    rough = jnp.asarray(rng.uniform(0, 1, P).astype(F))

    irr_a, prefs_a, sky_a = sample_env_batch_c(
        sky_p, irr_p, pref_p, dirs, [(dirs, rough)], sky_dirs=dirs)

    # build the texel-pool layout: junk texel rows, then the env block
    base_rows = 53
    junk = jnp.asarray(
        rng.uniform(0, 1, (base_rows, TEXEL_COLS)).astype(F)).astype(jnp.bfloat16)
    env16 = jnp.concatenate([sky_p, irr_p, pref_p.reshape(-1, 16)])
    blk = jnp.zeros((env16.shape[0], TEXEL_COLS), jnp.float32)
    blk = blk.at[:, :16].set(env16).astype(jnp.bfloat16)
    texq = jnp.concatenate([junk, blk])

    irr_b, prefs_b, sky_b = sample_env_batch_c(
        sky_p, irr_p, pref_p, dirs, [(dirs, rough)], sky_dirs=dirs,
        texq=texq, env_base=jnp.int32(base_rows))

    # bf16 storage: ~2^-8 relative
    for a, b in zip(irr_a + prefs_a[0] + sky_a, irr_b + prefs_b[0] + sky_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.02, rtol=0.01)


def _env_scene(pool_route: bool):
    r = AwsmRendererTpu(RendererConfig(width=96, height=48))
    sky, irr, pref = _rand_cubemaps(np.random.default_rng(11))
    r.environment.set_skybox_cubemap(sky)
    r.environment.prefiltered = pref
    r.environment.irradiance = irr
    r.environment.gpu_dirty = True
    mat = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.7, 0.7, 0.7, 1], F),
        metallic_factor=1.0, roughness_factor=0.3))
    r.add_mesh(uv_sphere(0.7), mat, transform=Transform())
    r.lights.insert(Light.directional([0, -1, -0.5], intensity=1.0))
    r.camera.update(m3.look_at([0, 0, 2.5], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, 2.0, 0.1, 100.0))
    if not pool_route:
        # force the legacy two-table route for comparison
        ds = r._flush()
        ds.pop("env_pool_base", None)
        ds["texels"] = ds["texels"][: r.textures.texels_packed.shape[0]]
    return r


def test_renderer_image_env_flush_appends_pool_rows():
    r = _env_scene(pool_route=True)
    ds = r._flush()
    assert "env_pool_base" in ds
    n_env = (ds["skybox"].shape[0] + ds["irradiance"].shape[0]
             + ds["prefiltered"].shape[0] * ds["prefiltered"].shape[1])
    assert ds["texels"].shape[0] == int(ds["env_pool_base"]) + n_env
    img = r.render()      # float LDR in [0,1]
    assert np.isfinite(img).all()
    # the random sky must land on miss pixels (not a solid clear color)
    assert img[:, :, :3].std() > 0.02, "image env did not render"


def test_opaque_compact_matches_band_image_env():
    """Covered-tile compaction with an IMAGE env: covered tiles take the
    per-pixel sky riding the batched env gather; skipped tiles take the
    skybox-only pool gather (shade_deferred_compact_c image-env path).
    Must equal the band-wide path exactly when the cap covers every
    live tile."""
    import jax.numpy as jnp

    from awsm_renderer_tpu import AntiAliasing, PostProcessing, ToneMapping
    from awsm_renderer_tpu.geometry import box
    from awsm_renderer_tpu.passes.frame import render_frame

    W, H = 256, 64
    r = AwsmRendererTpu(RendererConfig(
        width=W, height=H, anti_aliasing=AntiAliasing(msaa=True),
        post_processing=PostProcessing(tonemapping=ToneMapping.NONE)))
    sky, irr, pref = _rand_cubemaps(np.random.default_rng(5))
    r.environment.set_skybox_cubemap(sky)
    r.environment.prefiltered = pref
    r.environment.irradiance = irr
    r.environment.gpu_dirty = True
    pbr = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0.8, 0.6, 0.4, 1.0], F),
        metallic_factor=0.3, roughness_factor=0.4))
    # geometry in the lower-left: several tiles stay pure sky
    r.add_mesh(box(0.6), pbr, transform=Transform(
        translation=np.array([-0.8, -0.4, 0.0], F)))
    r.lights.insert(Light.directional([-0.5, -1, -0.3], intensity=2.0))
    r.camera.update(m3.look_at([0, 0.3, 3], [0, 0, 0], [0, 1, 0]),
                    m3.perspective(np.pi / 3, W / H, 0.1, 100.0))

    ds = r._flush()
    assert "env_pool_base" in ds
    masks = r._mesh_masks()
    op_rows = r._bucket_mat_rows(masks["opaque"])

    def frame(tile_cap):
        return render_frame(
            ds, jnp.asarray(masks["opaque"]), None, None,
            width=W, height=H, supersample=False, msaa=True,
            tonemap=ToneMapping.NONE, use_mips=True,
            has_morphs=False, skin_sets=0, solid_env=False,
            slot_mask=r._slot_mask(op_rows), ext=r._ext_mask(op_rows),
            needs_clip=bool(masks["needs_clip"]),
            opaque_tile_cap=tile_cap)

    ldr_a, tid_a, _ = frame(None)
    ldr_b, tid_b, _ = frame(15)   # < 16 tiles triggers compaction
    np.testing.assert_array_equal(np.asarray(tid_a), np.asarray(tid_b))
    np.testing.assert_allclose(np.asarray(ldr_a), np.asarray(ldr_b),
                               atol=1e-6)


def test_renderer_pool_route_matches_legacy_route():
    a = _env_scene(pool_route=True).render()
    b_r = _env_scene(pool_route=False)
    # render via the production frame with the legacy (separate-table) ds
    ds = b_r._flush()
    ds.pop("env_pool_base", None)
    ds["texels"] = ds["texels"][: b_r.textures.texels_packed.shape[0]]
    b_r._device = ds
    b = b_r.render()      # float LDR in [0,1]
    diff = np.abs(a - b)
    # bf16 env quantization only: small deltas on few channels
    assert (diff > 6 / 255).mean() < 0.005, (diff.max(), (diff > 6 / 255).mean())
